"""opusd — PCM to Opus multicast transcoder daemon (opus.c).

Joins a PCM group, transcodes each (sender, SSRC) session to Opus at the
configured bitrate/frame size, and multicasts OPUS_PT RTP to the output
group.

Usage:
  python -m ka9q_sdr_tpu.apps.opusd -I 239.2.1.1:5004 -R 239.2.1.3:5004 \\
      -o 32000 --dtx
"""

from __future__ import annotations

import argparse
import sys

from ..audio.opus_codec import OPUS_AVAILABLE
from ..audio.transcode import OpusTranscoder
from ..net.multicast import setup_mcast


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="opusd")
    p.add_argument("-I", "--input", required=True)
    p.add_argument("-R", "--output", required=True)
    p.add_argument("-o", "--bitrate", type=int, default=32000)  # opus.c:59
    p.add_argument("-B", "--frame-ms", type=float, default=20.0)
    p.add_argument("-x", "--dtx", action="store_true")
    p.add_argument("-f", "--fec", type=int, default=0, metavar="LOSS_PC",
                   help="enable inband FEC for an expected packet-loss "
                        "percentage (opus.c:95-96,232-239)")
    p.add_argument("-T", "--ttl", type=int, default=1)
    p.add_argument("-v", "--verbose", action="store_true",
                   help="accepted for reference compatibility (opus.c -v)")
    p.add_argument("--packets", type=int, default=0)
    args = p.parse_args(argv)

    if not OPUS_AVAILABLE:
        print("libopus not available", file=sys.stderr)
        return 1
    in_sock = setup_mcast(args.input, output=False)
    out_sock = setup_mcast(args.output, output=True, ttl=args.ttl)
    tc = OpusTranscoder(
        send=lambda d: out_sock.send(d),
        bitrate=args.bitrate,
        frame_ms=args.frame_ms,
        dtx=args.dtx,
        fec=args.fec,
    )
    n = 0
    try:
        while True:
            data, sender = in_sock.recvfrom(9000)
            tc.feed_packet(data, sender)
            n += 1
            if args.packets and n >= args.packets:
                return 0
    except KeyboardInterrupt:
        return 0


if __name__ == "__main__":
    sys.exit(main())
