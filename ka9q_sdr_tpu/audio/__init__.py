"""Playback-side audio modules: Opus codec binding, transcoder sessions,
multi-stream playout mixer (reference: opus.c, monitor.c, opussend.c).
Host-side only — codecs and jitter buffers never touch the device.
"""

from .opus_codec import (
    OPUS_AVAILABLE,
    OpusEncoder,
    OpusDecoder,
)
from .transcode import OpusSession, OpusTranscoder
from .playout import PlayoutSession, Mixer
