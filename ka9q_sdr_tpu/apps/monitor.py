"""monitor — multi-stream RTP audio player/mixer (monitor.c).

Joins any number of PCM/Opus multicast groups, mixes all sessions
additively through the playout ring with per-session jitter buffering,
and writes 48 kHz stereo s16 host-order audio to stdout (pipe to aplay /
a file; the reference's portaudio output has no device in this target).

Usage:
  python -m ka9q_sdr_tpu.apps.monitor 239.2.1.1:5004 239.2.1.2:5004 \\
      > mix.s16
"""

from __future__ import annotations

import argparse
import select
import sys
import time

import numpy as np

from ..audio.playout import Mixer, SAMPRATE
from ..net.multicast import setup_mcast


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="monitor")
    p.add_argument("groups", nargs="+", help="PCM/Opus multicast name:port")
    p.add_argument("--seconds", type=float, default=0.0, help="stop after N s")
    p.add_argument("--chunk-ms", type=float, default=20.0)
    args = p.parse_args(argv)

    socks = [setup_mcast(g, output=False) for g in args.groups]
    mixer = Mixer()
    out = sys.stdout.buffer
    chunk = int(SAMPRATE * args.chunk_ms / 1000)
    t0 = time.monotonic()
    next_due = t0
    try:
        while True:
            now = time.monotonic()
            timeout = max(0.0, next_due - now)
            ready, _, _ = select.select(socks, [], [], timeout)
            for s in ready:
                mixer.feed_packet(s.recv(9000))
            now = time.monotonic()
            if now >= next_due:
                audio = mixer.read(chunk)
                pcm = np.clip(audio * 32767.0, -32768, 32767).astype(np.int16)
                out.write(pcm.tobytes())
                out.flush()
                next_due += args.chunk_ms / 1000.0
            if args.seconds and now - t0 >= args.seconds:
                return 0
    except (KeyboardInterrupt, BrokenPipeError):
        return 0


if __name__ == "__main__":
    sys.exit(main())
