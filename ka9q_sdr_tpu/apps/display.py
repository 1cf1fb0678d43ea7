"""display — interactive tuning dashboard (display.c).

A curses UI driven entirely by the network protocol (the reference's
display.c runs in-process with `radio`; its control.c network twin was
stubbed — here the receiver is a daemon, so the interactive UI *is* the
network UI): TLV status in on the output group's port+2, TLV tune
commands out on the same socket.

Keys (display.c:745-986 key dispatch, simplified):
  Up/Down        tune +/- the current step
  Left/Right     move the tuning digit cursor (powers of 10)
  f              enter a frequency (parse_frequency syntax: 147m435)
  m              enter a mode name (FM, AM, USB, ...)
  q / Ctrl-C     quit

Usage:
  python -m ka9q_sdr_tpu.apps.display 239.2.1.1:5004
"""

from __future__ import annotations

import argparse
import math
import sys
import time

from ..net.multicast import setup_mcast
from ..net import status as st
from ..net.status import StatusType
from ..utils.misc import parse_frequency
from ..utils.bandplan import Bandplan
from .control import StatusMirror

__all__ = ["main", "TuningState"]


class TuningState:
    """Digit-cursor tuning model (adjust_item, display.c:128-180)."""

    def __init__(self, step_log10: int = 3):
        self.step_log10 = step_log10   # 10^n Hz per Up/Down

    @property
    def step(self) -> float:
        return 10.0 ** self.step_log10

    def cursor_left(self):
        self.step_log10 = min(self.step_log10 + 1, 9)

    def cursor_right(self):
        self.step_log10 = max(self.step_log10 - 1, 0)

    def adjust(self, freq: float, direction: int) -> float:
        return freq + direction * self.step


def send_tune(sock, freq: float) -> None:
    pkt = bytearray([1])
    st.encode_double(pkt, StatusType.RADIO_FREQUENCY, freq)
    st.encode_eol(pkt)
    sock.send(bytes(pkt))


def _render(stdscr, mirror: StatusMirror, tuning: TuningState, bp, msg: str):
    import curses

    stdscr.erase()
    maxy, maxx = stdscr.getmaxyx()
    freq = mirror.get(StatusType.RADIO_FREQUENCY, float("nan"))
    mode = mirror.get(StatusType.RADIO_MODE, "?")
    stdscr.addstr(0, 0, "KA9Q TPU radio", curses.A_BOLD)
    # Tuning window: frequency with the active digit highlighted
    fstr = f"{freq:>16,.0f} Hz" if not math.isnan(freq) else "      ---"
    stdscr.addstr(2, 2, "Freq: ")
    if not math.isnan(freq):
        # find which rendered character the cursor digit is
        digits = f"{int(abs(freq)):,d}"
        target = tuning.step_log10
        pos = len(digits)
        count = -1
        idx = len(digits)
        for i in range(len(digits) - 1, -1, -1):
            if digits[i].isdigit():
                count += 1
                if count == target:
                    idx = i
                    break
        pad = 16 - len(digits)
        for i, c in enumerate(digits):
            attr = curses.A_REVERSE if i == idx else curses.A_NORMAL
            stdscr.addstr(2, 8 + pad + i, c, attr)
        stdscr.addstr(2, 8 + 16, " Hz")
    stdscr.addstr(2, 32, f"Mode: {mode}", curses.A_BOLD)
    stdscr.addstr(3, 2, f"Step: {tuning.step:,.0f} Hz")
    if bp and not math.isnan(freq):
        e = bp.lookup(freq)
        if e:
            stdscr.addstr(3, 32, f"{e.name} [{' '.join(e.mode_names)}]")
    # spectrum pane: 128-bin sparkline from the status stream
    spec = mirror.get(StatusType.SPECTRUM_128)
    if spec and maxx > 70:
        import numpy as _np

        bins = _np.frombuffer(spec, _np.uint8).astype(float)
        lo, hi = bins.min(), max(bins.max(), bins.min() + 1)
        glyphs = " \u2581\u2582\u2583\u2584\u2585\u2586\u2587\u2588"
        w = min(len(bins), maxx - 6)
        line = "".join(
            glyphs[int((bins[i] - lo) / (hi - lo) * 8) if bins[i] > lo else 0]
            for i in range(w)
        )
        stdscr.addstr(4, 2, line)
    row = 6
    for line in mirror.render().split("\n")[1:]:
        if row >= maxy - 3:
            break
        stdscr.addstr(row, 2, line[: maxx - 3])
        row += 1
    stdscr.addstr(maxy - 2, 2,
                  "Up/Dn tune  Left/Right digit  f freq  m mode  q quit")
    if msg:
        stdscr.addstr(maxy - 1, 2, msg[: maxx - 3], curses.A_DIM)
    stdscr.refresh()


def _prompt(stdscr, label: str) -> str:
    import curses

    maxy, _ = stdscr.getmaxyx()
    curses.echo()
    stdscr.addstr(maxy - 1, 2, label + ": " + " " * 30)
    stdscr.move(maxy - 1, 2 + len(label) + 2)
    stdscr.timeout(-1)
    s = stdscr.getstr().decode()
    stdscr.timeout(100)
    curses.noecho()
    return s.strip()


def run_ui(stdscr, args):
    import curses

    curses.curs_set(0)
    stdscr.timeout(100)
    status_sock = setup_mcast(args.group, output=False, offset=2)
    status_sock.setblocking(False)
    cmd_sock = setup_mcast(args.group, output=True, offset=2)
    mirror = StatusMirror()
    tuning = TuningState()
    try:
        import importlib.resources as res

        bp = Bandplan.parse(
            (res.files("ka9q_sdr_tpu") / "data" / "bandplan.txt").read_text()
        )
    except Exception:
        bp = None
    msg = ""
    while True:
        try:
            while True:
                mirror.update(status_sock.recv(9000))
        except (BlockingIOError, OSError):
            pass
        _render(stdscr, mirror, tuning, bp, msg)
        ch = stdscr.getch()
        if ch == -1:
            continue
        freq = mirror.get(StatusType.RADIO_FREQUENCY)
        if ch in (ord("q"), 3):
            return
        elif ch == curses.KEY_UP and freq is not None:
            send_tune(cmd_sock, tuning.adjust(freq, +1))
        elif ch == curses.KEY_DOWN and freq is not None:
            send_tune(cmd_sock, tuning.adjust(freq, -1))
        elif ch == curses.KEY_LEFT:
            tuning.cursor_left()
        elif ch == curses.KEY_RIGHT:
            tuning.cursor_right()
        elif ch == ord("f"):
            s = _prompt(stdscr, "Frequency")
            f = parse_frequency(s)
            if f > 0:
                send_tune(cmd_sock, f)
                msg = f"tuned {f:,.0f} Hz"
        elif ch == ord("m"):
            s = _prompt(stdscr, "Mode").upper()
            if s:
                pkt = bytearray([1])
                st.encode_string(pkt, StatusType.RADIO_MODE, s)
                st.encode_eol(pkt)
                cmd_sock.send(bytes(pkt))
                msg = f"sent mode {s}"


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="display")
    p.add_argument("group", help="receiver PCM group (status on port+2)")
    args = p.parse_args(argv)
    import curses

    try:
        curses.wrapper(run_ui, args)
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
