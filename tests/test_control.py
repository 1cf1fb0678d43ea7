"""Doppler steering, bandplan lookup, control dashboard mirror tests."""

import math

import numpy as np
import pytest

from ka9q_sdr_tpu.models.doppler import (
    DopplerSteerer,
    parse_ephemeris_line,
    SPEED_OF_LIGHT,
)
from ka9q_sdr_tpu.utils.bandplan import Bandplan, CW, VOICE
from ka9q_sdr_tpu.apps.control import StatusMirror
from ka9q_sdr_tpu.net import status as st
from ka9q_sdr_tpu.net.status import StatusType


class FakeRx:
    def __init__(self, freq):
        self.tune_freq = freq
        self.calls = []

    def set_doppler(self, f, r):
        self.calls.append((f, r))


class TestDoppler:
    def test_parse(self):
        rec = parse_ephemeris_line("100.5 180 0.1 45 0.0 500e3 -7000 12")
        assert rec[0] == 100.5 and rec[6] == -7000.0

    def test_steering_math(self):
        """f = -f0*rangerate/c, rate = -f0*rrate/c (doppler.c:63-66)."""
        rx = FakeRx(435e6)
        clock = {"t": 100.0}
        steerer = DopplerSteerer(
            rx, "", clock=lambda: clock["t"], sleep=lambda s: None
        )
        n = steerer.steer_from_lines(
            ["100.0 0 0 0 0 500e3 -7000 12",    # stale (t < now handled below)
             "101.0 0 0 0 0 450e3 -7100 13"]
        )
        # first line t=100.0 == now -> not stale (t < rt skips strictly)
        assert n == 2
        f, r = rx.calls[-1]
        assert abs(f - 435e6 * 7100 / SPEED_OF_LIGHT) < 1e-3
        assert abs(r - (-435e6 * 13 / SPEED_OF_LIGHT)) < 1e-3

    def test_stale_lines_skipped(self):
        rx = FakeRx(146e6)
        steerer = DopplerSteerer(rx, "", clock=lambda: 1000.0,
                                 sleep=lambda s: None)
        assert steerer.steer_from_lines(["999.0 0 0 0 0 1 1 1"]) == 0

    def test_receiver_integration(self):
        """Doppler NCO actually shifts the receiver passband."""
        from ka9q_sdr_tpu.models.receiver import Receiver, make_receiver_config

        rx = Receiver(make_receiver_config("USB", samprate=192000))
        rx.set_freq(30000.0)
        # Doppler of +500 Hz: signal appears 500 Hz high at RF; doppler
        # correction shifts it back into the passband at the right pitch
        rx.set_doppler(500.0, 0.0)
        out = []
        for b in range(20):
            tt = (b * 3840 + np.arange(3840)) / 192000
            sig = (0.2 * np.exp(2j * np.pi * (31000 + 500) * tt)).astype(
                np.complex64
            )
            audio, _ = rx.process(sig)
            out.append(np.asarray(audio))
        a = np.concatenate(out)
        seg = a[len(a) // 2:]
        spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
        f = np.fft.rfftfreq(len(seg), 1 / 48000)
        assert abs(f[np.argmax(spec[5:]) + 5] - 1000.0) < 10.0


class TestBandplan:
    def test_parse_and_lookup(self):
        import importlib.resources as res

        bp = Bandplan.parse(
            (res.files("ka9q_sdr_tpu") / "data" / "bandplan.txt").read_text()
        )
        e = bp.lookup(14.070e6)
        assert e is not None and "20m" in e.name
        assert e.modes & CW
        e2 = bp.lookup(146.52e6)
        assert e2 is not None and "2m" in e2.name
        assert e2.modes & VOICE
        assert bp.lookup(99e6) is None

    def test_center_bandwidth_syntax(self):
        bp = Bandplan.parse("10.0 b.010 - - WWV 10 MHz\n")
        e = bp.lookup(10.000e6)
        assert e is not None and "WWV" in e.name
        assert bp.lookup(10.006e6) is None


class TestControlMirror:
    def test_decode_status(self):
        pkt = bytearray([0])
        st.encode_double(pkt, StatusType.RADIO_FREQUENCY, 147435000.0)
        st.encode_string(pkt, StatusType.RADIO_MODE, "FM")
        st.encode_float(pkt, StatusType.DEMOD_SNR, 25.0)
        st.encode_int(pkt, StatusType.OUTPUT_PACKETS, 1234)
        st.encode_eol(pkt)
        m = StatusMirror()
        m.update(bytes(pkt))
        assert m.get(StatusType.RADIO_FREQUENCY) == 147435000.0
        assert m.get(StatusType.RADIO_MODE) == "FM"
        assert m.get(StatusType.DEMOD_SNR) == 25.0
        text = m.render()
        assert "147,435,000" in text and "FM" in text

    def test_command_packets_ignored(self):
        m = StatusMirror()
        m.update(bytes([1, StatusType.EOL]))   # command, not status
        assert m.packets == 0


class TestDisplayTuning:
    def test_digit_cursor(self):
        from ka9q_sdr_tpu.apps.display import TuningState

        t = TuningState(step_log10=3)
        assert t.step == 1000.0
        t.cursor_left()
        assert t.step == 10000.0
        for _ in range(20):
            t.cursor_right()
        assert t.step == 1.0   # clamped
        assert t.adjust(146.52e6, +1) == 146.52e6 + 1.0

    def test_send_tune_wire_format(self):
        from ka9q_sdr_tpu.apps.display import send_tune

        sent = []

        class S:
            def send(self, d):
                sent.append(d)

        send_tune(S(), 147435000.0)
        assert sent[0][0] == 1  # command byte
        items = dict(st.decode_packet(sent[0][1:]))
        assert st.decode_double(items[StatusType.RADIO_FREQUENCY]) == 147435000.0


class TestSatellitePass:
    def test_doppler_tracked_cw_through_pass(self):
        """BASELINE config 4: Doppler-tracked SSB/CW — the sweep NCO holds
        a chirping carrier at constant audio pitch open-loop, updated at
        the ephemeris cadence (doppler.c:63-66; the reference held a 70 cm
        LEO CW signal in a 400 Hz filter AOS->LOS)."""
        from ka9q_sdr_tpu.models.receiver import Receiver, make_receiver_config
        from ka9q_sdr_tpu.models.doppler import SPEED_OF_LIGHT as C

        FS, Lb = 192000, 3840
        f_dial = 30000.0          # "RF" carrier in this IF-scale test
        rx = Receiver(make_receiver_config("CWU", samprate=FS))
        rx.set_freq(f_dial)

        # pass profile: range rate sweeps -3000 -> +3000 m/s at 435 MHz
        # scaled into our IF world: use the doppler *frequency* directly.
        # rr(t) = a*t + rr0; doppler f(t) = -f0*rr(t)/c with f0 chosen so
        # the sweep is +/-600 Hz over 2 s (3 Hz/block^2-ish rate).
        f0 = 435e6
        rr0, accel = -3000.0, 3000.0     # m/s, m/s^2
        dur_blocks = 100                  # 2 s
        phase = 0.0
        pitches = []
        buf = []
        for b in range(dur_blocks):
            t0 = b * Lb / FS
            # update steering every 5 blocks (0.1 s ephemeris cadence)
            if b % 5 == 0:
                rr = rr0 + accel * t0
                rx.set_doppler(f0 * -rr / C, f0 * -accel / C)
            tt = t0 + np.arange(Lb) / FS
            rrt = rr0 + accel * tt
            fd = f0 * -rrt / C            # instantaneous Doppler, Hz
            inst = f_dial + fd
            ph = phase + np.cumsum(2 * np.pi * inst / FS)
            phase = ph[-1]
            sig = (0.2 * np.exp(1j * ph)).astype(np.complex64)
            audio, _ = rx.process(sig)
            buf.append(np.asarray(audio))
            if b >= 20 and b % 10 == 0:
                seg = np.concatenate(buf[-10:])
                spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
                fr = np.fft.rfftfreq(len(seg), 1 / 48000)
                pitches.append(fr[np.argmax(spec[5:]) + 5])
        # CW offset is +700 Hz; the tone must stay pinned there throughout
        # the pass despite a +/-870 Hz Doppler swing
        pitches = np.array(pitches)
        assert np.all(np.abs(pitches - 700.0) < 30.0), pitches
