"""Multi-stream playout mixer (monitor.c).

A shared float stereo ring buffer takes every session's audio *additively*
(monitor.c:479-522); the output drain reads consecutive frames and zeroes
behind itself (the portaudio callback, monitor.c:360-386 — here a pull
method so output can go to a sound card, a file, or a socket).

Jitter management follows monitor.c:452-474: each session maps RTP
timestamps to ring positions with an initial 100 ms playout delay; a late
packet bumps the session's delay by 1 ms and is dropped; an RTP marker
(talk-spurt start) re-anchors the mapping.  Pan applies per-channel gain
plus up to 1 ms of interaural delay (monitor.c:435-449).
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np

from ..net.rtp import RTPHeader, PCM_MONO_PT, PCM_STEREO_PT, OPUS_PT
from .opus_codec import OPUS_AVAILABLE

__all__ = ["PlayoutSession", "Mixer", "SAMPRATE", "RING_FRAMES"]

SAMPRATE = 48000                  # monitor.c:81-86 (fixed)
RING_FRAMES = 1 << 19             # ~10.9 s stereo ring (monitor.c)
START_DELAY = SAMPRATE // 10      # initial playout delay 100 ms
LATE_BUMP = SAMPRATE // 1000      # +1 ms per late packet
MAX_PAN_DELAY = SAMPRATE // 1000  # <=1 ms interaural delay


class PlayoutSession:
    """Per-SSRC decode + playout state (struct session, monitor.c)."""

    def __init__(self, ssrc: int, pt: int):
        self.ssrc = ssrc
        self.type = pt
        self.playout = START_DELAY
        self.anchor_ts: Optional[int] = None   # RTP ts at anchor
        self.anchor_pos = 0                    # ring position of anchor
        self.gain = 1.0
        self.pan = 0.0      # -1 (left) .. +1 (right)
        self.muted = False
        self.packets = 0
        self.lates = 0
        self.decoder = None
        if pt == OPUS_PT and OPUS_AVAILABLE:
            from .opus_codec import OpusDecoder

            self.decoder = OpusDecoder(SAMPRATE, 2)

    def pan_gains_delays(self) -> tuple[float, float, int, int]:
        """Constant-power pan plus interaural delay (monitor.c:435-449)."""
        theta = (self.pan + 1.0) * math.pi / 4.0   # 0..pi/2
        lg = math.cos(theta) * self.gain
        rg = math.sin(theta) * self.gain
        ld = int(max(0.0, self.pan) * MAX_PAN_DELAY)
        rd = int(max(0.0, -self.pan) * MAX_PAN_DELAY)
        return lg, rg, ld, rd


class Mixer:
    """The shared ring + session demux (monitor.c main structures)."""

    def __init__(self):
        self.ring = np.zeros((RING_FRAMES, 2), np.float32)
        self.rptr = 0          # next frame the output will read
        self.frames_out = 0
        self.sessions: dict[int, PlayoutSession] = {}

    def feed_packet(self, data: bytes) -> None:
        try:
            hdr, off = RTPHeader.from_bytes(data)
        except ValueError:
            return
        if hdr.type not in (PCM_MONO_PT, PCM_STEREO_PT, OPUS_PT):
            return
        sess = self.sessions.get(hdr.ssrc)
        if sess is None:
            sess = PlayoutSession(hdr.ssrc, hdr.type)
            self.sessions[hdr.ssrc] = sess
        sess.packets += 1
        payload = data[off:]

        if hdr.type == OPUS_PT:
            if sess.decoder is None:
                return
            audio = sess.decoder.decode(payload)
        else:
            pcm = np.frombuffer(payload, ">i2").astype(np.float32) / 32767.0
            audio = (
                np.repeat(pcm[:, None], 2, axis=1)
                if hdr.type == PCM_MONO_PT
                else pcm.reshape(-1, 2)
            )
        if sess.muted or len(audio) == 0:
            return

        # Playout positioning (monitor.c:452-474)
        if hdr.marker or sess.anchor_ts is None:
            sess.anchor_ts = hdr.timestamp
            sess.anchor_pos = (self.rptr + sess.playout) % RING_FRAMES
            rel = 0
        else:
            rel = (hdr.timestamp - sess.anchor_ts) & 0xFFFFFFFF
            if rel >= 1 << 31:       # negative (old) — drop
                return
        wpos = (sess.anchor_pos + rel) % RING_FRAMES
        # Late check: is wpos behind the read pointer?
        behind = (self.rptr - wpos) % RING_FRAMES
        if 0 < behind < RING_FRAMES // 2:
            sess.playout += LATE_BUMP    # bump delay 1 ms, drop (mon.c:469-473)
            sess.lates += 1
            sess.anchor_ts = None        # re-anchor on next packet
            return

        lg, rg, ld, rd = sess.pan_gains_delays()
        n = len(audio)
        li = (np.arange(n) + wpos + ld) % RING_FRAMES
        ri = (np.arange(n) + wpos + rd) % RING_FRAMES
        np.add.at(self.ring[:, 0], li, audio[:, 0] * lg)
        np.add.at(self.ring[:, 1], ri, audio[:, 1] * rg)

    def read(self, frames: int) -> np.ndarray:
        """Drain `frames` stereo frames; zero the ring behind the read
        pointer (pa_callback, monitor.c:360-386)."""
        out = np.empty((frames, 2), np.float32)
        idx = (self.rptr + np.arange(frames)) % RING_FRAMES
        out[:] = self.ring[idx]
        self.ring[idx] = 0.0
        self.rptr = (self.rptr + frames) % RING_FRAMES
        self.frames_out += frames
        return out
