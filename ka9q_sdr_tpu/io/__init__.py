"""Stream I/O: PCM packetisation, I/Q recording/replay, signal synthesis.

Host-side equivalents of audio.c (PCM RTP output with silence
suppression), iqrecord.c / iqplay.c (headerless s16 recordings with xattr
metadata and sparse-file gap preservation), and modulate.c (test signal
generator) — the reference's replay-based test/simulation infrastructure
(SURVEY.md §4).
"""

from .pcm import PCMOutput, PCM_BUFSIZE, scaleclip_int16, pcm_to_float
from .iqfile import IQRecorder, IQReader, write_metadata, read_metadata
from .modulate import Modulator, MODULATE_PRESETS
