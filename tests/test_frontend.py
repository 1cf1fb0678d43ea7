"""Front-end correction chain tests (funcube.c / hackrf.c DSP parity)."""

import numpy as np
import pytest

from ka9q_sdr_tpu.models.frontend import (
    FrontEndCorrector,
    FuncubeAGC,
    HackRFAGC,
    HalfBandCascade,
    fs4_shift,
    fcd_actual_frequency,
)


class TestCorrector:
    def test_dc_removal_converges(self):
        rng = np.random.default_rng(0)
        c = FrontEndCorrector(240, 192000)
        c.dc_alpha = 1e-3   # speed up the 1e-6 estimator for the test
        dc = 0.05 + 0.03j
        out = None
        for _ in range(200):
            iq = dc + 0.1 * (
                rng.standard_normal(240) + 1j * rng.standard_normal(240)
            )
            out = c.process(iq.astype(np.complex64))
        assert abs(c.dc - dc) < 0.005
        assert abs(np.mean(out)) < 0.01

    def test_gain_imbalance_corrected(self):
        """I channel 2 dB hot -> corrector equalises the energies."""
        rng = np.random.default_rng(1)
        c = FrontEndCorrector(240, 192000)
        c.rate_factor = 0.05   # speed up
        g = 10 ** (2 / 20)
        for _ in range(400):
            z = rng.standard_normal(240) + 1j * rng.standard_normal(240)
            iq = (g * z.real + 1j * z.imag).astype(np.complex64)
            out = c.process(iq)
        ie = np.sum(out.real**2)
        qe = np.sum(out.imag**2)
        assert abs(10 * np.log10(ie / qe)) < 0.3

    def test_phase_error_corrected(self):
        """sin(phi) I/Q skew -> residual I.Q correlation ~ 0."""
        rng = np.random.default_rng(2)
        c = FrontEndCorrector(240, 192000)
        c.rate_factor = 0.05
        phi = 0.1
        tail = []
        for i in range(400):
            z = rng.standard_normal(240) + 1j * rng.standard_normal(240)
            # introduce quadrature skew: q' = q*cos(phi) + i*sin(phi)
            iq = (z.real + 1j * (z.imag * np.cos(phi) + z.real * np.sin(phi)))
            out = c.process(iq.astype(np.complex64))
            if i >= 300:
                tail.append(out)
        # estimator converged to sin(phi)
        assert abs(c.sinphi - np.sin(phi)) < 0.02
        # residual I.Q correlation over the settled tail (~24k samples;
        # single-block correlation has a 1/sqrt(240) statistical floor)
        y = np.concatenate(tail)
        corr = np.sum(y.real * y.imag) / np.sqrt(
            np.sum(y.real**2) * np.sum(y.imag**2)
        )
        assert abs(corr) < 0.02


class TestFs4Shift:
    def test_shifts_spectrum_quarter_rate(self):
        fs = 12.288e6
        n = 4096
        t = np.arange(n) / fs
        iq = np.exp(2j * np.pi * 1e6 * t).astype(np.complex64)
        out, ph = fs4_shift(iq)
        assert ph == n & 3
        spec = np.abs(np.fft.fft(out))
        f = np.fft.fftfreq(n, 1 / fs)
        peak = f[np.argmax(spec)]
        assert abs(peak - (1e6 + fs / 4)) < fs / n * 2

    def test_phase_continuity_across_blocks(self):
        iq = np.ones(64, np.complex64)
        a, ph = fs4_shift(iq[:32], 0)
        b, _ = fs4_shift(iq[32:], ph)
        whole, _ = fs4_shift(iq, 0)
        assert np.allclose(np.concatenate([a, b]), whole)


class TestCascade:
    def test_64_to_1_passband(self):
        """12.288 MHz -> 192 kHz: an in-band tone survives at unity-ish
        gain; out-of-band content is attenuated."""
        fs = 12.288e6
        casc = HalfBandCascade(6)   # 2^6 = 64
        n = 1 << 16
        t = np.arange(n) / fs
        tone = np.exp(2j * np.pi * 20e3 * t)        # in band at 192k out
        spur = np.exp(2j * np.pi * 1.9e6 * t)       # way out of band
        out = []
        x = (tone + spur).astype(np.complex64)
        for i in range(0, n, 4096):
            out.append(casc.process(x[i : i + 4096]))
        y = np.concatenate(out)[200:]
        spec = np.abs(np.fft.fft(y * np.hanning(len(y))))
        f = np.fft.fftfreq(len(y), 64 / fs)
        tone_amp = spec[np.argmin(np.abs(f - 20e3))]
        # the spur aliases somewhere; total out-of-tone energy must be low
        mask = np.abs(f - 20e3) > 5e3
        assert tone_amp > 10 * spec[mask].max()

    def test_dc_gain_unity(self):
        casc = HalfBandCascade(4)
        x = np.ones(4096, np.complex64)
        y = casc.process(x)
        assert abs(np.mean(y[200:]) - 1.0) < 0.01


class TestFracN:
    def test_quantization_step(self):
        """The MSi001 fractional-N step at 2 m (LO divider 16) is
        4*26 MHz/16 / (3250*4096) ~ 0.488 Hz (funcube.c:579 comment);
        requests quantise onto that grid."""
        step = 4 * 26e6 / 16 / (3250 * 4096)
        f = 146520001.0              # off-grid by design
        actual = fcd_actual_frequency(f)
        assert actual != f           # quantised
        assert abs(actual - f) <= step
        # on-grid round numbers tune exactly (26 MHz ref divides them)
        assert fcd_actual_frequency(146.52e6) == 146.52e6

    def test_band_table(self):
        """Band boundaries follow funcube.c:536-556: low bands upconvert
        through the 130 MHz IF; dividers change at 125/148/430 MHz."""
        # 7.1 MHz: offset 130 MHz, div 16 -> still ~0.49 Hz steps
        step_low = 4 * 26e6 / 16 / (3250 * 4096)
        f = 7100000.3
        assert abs(fcd_actual_frequency(f) - f) <= step_low
        # 435 MHz: divider 4 -> ~1.95 Hz steps
        step_70cm = 4 * 26e6 / 4 / (3250 * 4096)
        f = 435000001.0
        err = abs(fcd_actual_frequency(f) - f)
        assert err <= step_70cm

    def test_monotonic(self):
        fs = [100e6, 100.000001e6, 100.00001e6]
        actuals = [fcd_actual_frequency(f) for f in fs]
        assert actuals == sorted(actuals)


class TestHackRFSynth:
    """HackRF synthesizer quantisation (rffc5071_freq / max2837_freq,
    hackrf.c:766-814, composed as the firmware set_freq, hackrf.c:820-900)
    and the LO2-absorbs-quantized-LO1 loop for the hackrf front end —
    the twin of the funcube MSi001 coverage above."""

    def test_rffc5071_integer_mhz_grid(self):
        from ka9q_sdr_tpu.models.frontend import rffc5071_freq

        # VCO grid: 50 MHz ref * fbkdiv / (lodiv * 2^24) per (tmp_n>>5)
        # count — requests land within ~200 Hz of the integer-MHz ask
        for mhz in (2650 + 146, 2796, 3100, 2400):
            act = rffc5071_freq(mhz)
            assert abs(act - mhz * 1e6) < 200.0, (mhz, act)
        # exact when the ratio divides (5 GHz: tmp_n has no dropped bits)
        assert rffc5071_freq(5000) == 5.0e9

    def test_max2837_truncating_residual(self):
        from ka9q_sdr_tpu.models.frontend import max2837_freq

        # 30 MHz multiples synthesize exactly (ratio = F/30 MHz)
        assert max2837_freq(2_400_000_000) == 0
        assert max2837_freq(30_000_000) == 0
        # residual is the sub-LSB leftover: < 30e6/2^19 + rounding slop
        for f in (146_000_000, 146_520_001, 433_123_457, 1_299_999_999):
            r = max2837_freq(f)
            assert 0 <= r < 60, (f, r)

    def test_actual_frequency_all_three_paths(self):
        from ka9q_sdr_tpu.models.frontend import hackrf_actual_frequency

        # low path (< 2150 MHz): actual = f + max2837 residual (high side)
        for f in (146.52e6 + 1, 435e6 + 3, 1.2e9):
            a = hackrf_actual_frequency(f)
            assert 0 <= a - f < 60, (f, a)
        # bypass (2150-2750 MHz): MAX2837 direct, low side; 30 MHz
        # multiples exact
        assert hackrf_actual_frequency(2.4e9) == 2.4e9
        a = hackrf_actual_frequency(2.4e9 + 17)
        assert -60 < a - (2.4e9 + 17) <= 0
        # high path (2750-7250 MHz)
        a = hackrf_actual_frequency(5.8e9)
        assert abs(a - 5.8e9) < 300

    def test_frontend_daemon_reports_quantized_lo1(self, tmp_path):
        """hackrf-mode frontend simulator (decimate cascade + Fs/4 offset
        tune, hackrf.c:601): a TLV retune command quantises through the
        synthesizer pair and the status stream reports the ACTUAL LO1,
        not the request — exactly like the funcube daemon."""
        import argparse

        from ka9q_sdr_tpu.apps.frontend import FrontEndDaemon, build_args
        from ka9q_sdr_tpu.models.frontend import hackrf_actual_frequency
        from ka9q_sdr_tpu.net import status as st
        from ka9q_sdr_tpu.net.status import StatusType

        args = build_args(
            ["-R", "239.88.9.1:5404", "-f", "146m52", "-r", "192000",
             "--decimate-log2", "2"]
        )
        d = FrontEndDaemon(args)
        assert d.tuner == "hackrf"   # auto: wideband cascade => hackrf

        req = 146_520_001.0
        pkt = bytearray([1])
        st.encode_double(pkt, StatusType.RADIO_FREQUENCY, req)
        st.encode_eol(pkt)
        d.handle_command(bytes(pkt))
        # quantised, and exactly per the model incl. the +Fs/4 offset tune
        adc = 192000 * 4
        expect = hackrf_actual_frequency(req + adc / 4) - adc / 4
        assert d.actual == expect
        assert d.actual != req
        assert 0 < abs(d.actual - req) < 60

    def test_lo2_absorbs_hackrf_lo1_error(self):
        """Closed loop (radio_status.c:311-316) with the hackrf model: the
        receiver asks for an RF, the front end tunes the quantised LO1,
        the status round trip retunes LO2 — a USB tone demodulates to
        EXACTLY the right audio pitch (uncompensated it would sit
        |LO1 error| Hz off)."""
        from ka9q_sdr_tpu.models.frontend import hackrf_actual_frequency
        from ka9q_sdr_tpu.models.receiver import (
            Receiver, make_receiver_config,
        )

        fs = 192000
        rf = 146_520_001.0            # station carrier (off every grid)
        requested_lo1 = rf - 40e3     # park the station at +40 kHz IF
        actual_lo1 = hackrf_actual_frequency(requested_lo1)
        lo1_err = actual_lo1 - requested_lo1
        assert abs(lo1_err) > 3.0     # the error is worth absorbing

        rx = Receiver(make_receiver_config("USB", samprate=fs))
        rx.sdr.frequency = requested_lo1
        rx.set_freq(rf)
        rx.update_first_lo(actual_lo1)          # the status round trip
        assert rx.sdr.frequency == actual_lo1
        assert rx.tune_freq == rf               # RF stayed put

        # physical world: a tone 1 kHz above the station carrier reaches
        # the A/D at (rf+1000) - ACTUAL LO1
        tone_if = (rf + 1000.0) - actual_lo1
        L = rx.cfg.master.L
        audio = []
        for b in range(40):
            t = (b * L + np.arange(L)) / fs
            x = 0.05 * np.exp(2j * np.pi * tone_if * t).astype(np.complex64)
            out, _ = rx.process(x)
            audio.append(np.asarray(out))
        a = np.concatenate([x.ravel() for x in audio[10:]])
        spec = np.abs(np.fft.rfft(a * np.hanning(len(a))))
        f = np.fft.rfftfreq(len(a), 1.0 / 48000.0)
        peak = f[np.argmax(spec)]
        assert abs(peak - 1000.0) < 2.0, (peak, lo1_err)


class TestFuncubeAGC:
    def test_steps_up_in_reference_order(self):
        """Increase order: LNA on (24), mixer on (19), IF +10 to 20
        (funcube.c:605-618)."""
        a = FuncubeAGC(lna_gain=0, mixer_gain=0, if_gain=0)
        seen = []
        for _ in range(6):
            a.step(-70.0)
            seen.append((a.lna_gain, a.mixer_gain, a.if_gain))
        assert seen == [
            (24, 0, 0), (24, 19, 0), (24, 19, 10), (24, 19, 20),
            (24, 19, 20), (24, 19, 20),   # capped at IF 20
        ]

    def test_steps_down_in_reference_order(self):
        """Decrease order: IF -10 to 0, then mixer off, then LNA off
        (funcube.c:593-603)."""
        a = FuncubeAGC(lna_gain=24, mixer_gain=19, if_gain=20)
        seen = []
        for _ in range(5):
            a.step(-5.0)
            seen.append((a.lna_gain, a.mixer_gain, a.if_gain))
        assert seen == [
            (24, 19, 10), (24, 19, 0), (24, 0, 0), (0, 0, 0), (0, 0, 0),
        ]

    def test_dead_zone(self):
        a = FuncubeAGC()
        assert not a.step(-30.0)    # -50 < p < -15: hold
        assert a.total_db == 43


class TestHackRFAGC:
    def test_hysteresis_dead_zone(self):
        a = HackRFAGC()
        assert not a.step(-20.0)    # within [-25, -15]

    def test_increase_budget_split(self):
        """+20 dB deficit: mixer takes 8-dB steps first (LNA already on),
        IF takes the 2-dB remainder (hackrf.c:698-720)."""
        a = HackRFAGC(lna_gain=14, mixer_gain=24, if_gain=20)
        a.step(-45.0)               # change = -25 - (-45) = +20
        assert (a.lna_gain, a.mixer_gain, a.if_gain) == (14, 40, 24)

    def test_increase_turns_lna_on_first(self):
        a = HackRFAGC(lna_gain=0, mixer_gain=0, if_gain=0)
        a.step(-45.0)               # change = +20: LNA 14, mixer 0, IF +6
        assert a.lna_gain == 14
        assert (a.mixer_gain, a.if_gain) == (0, 6)

    def test_decrease_if_first(self):
        """-11 dB excess: IF sheds 2-dB steps first (hackrf.c:721-745),
        C truncation: change=-11 -> IF -10, mixer -8? no: remaining -1."""
        a = HackRFAGC(lna_gain=14, mixer_gain=40, if_gain=62)
        a.step(-4.0)                # change = -15 - (-4) = -11
        assert a.if_gain == 62 - 10
        assert a.mixer_gain == 40   # remaining change -1 < one 8-dB step
        assert a.lna_gain == 14

    def test_decrease_cascades_to_lna(self):
        a = HackRFAGC(lna_gain=14, mixer_gain=8, if_gain=4)
        a.step(25.0)                # change = -40: IF->0, mixer->0, LNA->0
        assert (a.lna_gain, a.mixer_gain, a.if_gain) == (0, 0, 0)


class TestGainCompensationLoop:
    def test_pcm_level_constant_through_gain_step(self, tmp_path):
        """End-to-end radio_status.c:309-316 semantics: the front-end AGC
        raises a gain (reported over TLV status); the receiver's
        gain_factor = 10^(-total/20) absorbs it, so the demod-input level
        (diag bb_power) is unchanged by the step."""
        from ka9q_sdr_tpu.apps.radio import RadioDaemon, build_parser
        from ka9q_sdr_tpu.net import status as st
        from ka9q_sdr_tpu.net.status import StatusType

        # cheap AM receiver in file mode (file unused; we drive rx directly)
        rec = tmp_path / "zero.iq"
        rec.write_bytes(b"\x00" * 4 * 3840)
        args = build_parser().parse_args(
            ["--iq-file", str(rec), "-f", "30k", "-m", "AM"]
        )
        d = RadioDaemon(args)

        agc = FuncubeAGC()          # lna 24, mixer 19, if 0
        gain0 = agc.total_db

        def send_gains():
            fe = bytearray([0])
            st.encode_int(fe, StatusType.LNA_GAIN, agc.lna_gain)
            st.encode_int(fe, StatusType.MIXER_GAIN, agc.mixer_gain)
            st.encode_int(fe, StatusType.IF_GAIN, agc.if_gain)
            st.encode_eol(fe)
            d.handle_fe_status(bytes(fe))

        def run_blocks(antenna_amp, nblocks=3):
            """antenna signal -> simulated analog gain -> A/D -> receiver."""
            rel = 10.0 ** ((agc.total_db - gain0) / 20.0)
            out = None
            for b in range(nblocks):
                tt = (b * 3840 + np.arange(3840)) / 192000.0
                sig = antenna_amp * rel * (
                    1 + 0.3 * np.sin(2 * np.pi * 400 * tt)
                ) * np.exp(2j * np.pi * 31000 * tt)
                _, out = d.rx.process(sig.astype(np.complex64))
            return float(np.asarray(out["bb_power"]))

        send_gains()
        amp = 10 ** (-55 / 20.0)    # quiet antenna signal
        p_before = run_blocks(amp)

        # A/D power is ~-55-ish dBFS < -50 -> the hardware AGC steps IF up
        adc_db = 10 * np.log10(p_before / float(np.asarray(
            d.rx.state.gain_factor)) ** 2 + 1e-30)
        assert agc.step(-55.0)      # one doagc invocation
        assert agc.if_gain == 10    # +10 dB
        send_gains()                # gain change rides the status stream

        p_after = run_blocks(amp)
        # demod-input power unchanged (within filter settling): the +10 dB
        # analog step was cancelled by gain_factor
        assert abs(10 * np.log10(p_after / p_before)) < 0.1
        # and gain_factor really moved by -10 dB
        gf = float(np.asarray(d.rx.state.gain_factor))
        assert abs(20 * np.log10(gf) + agc.total_db) < 1e-6


class TestFrontEndDaemonAGC:
    def test_moving_gains_ride_the_status_stream(self, tmp_path):
        """The frontend daemon's hardware AGC reacts to a hot A/D and the
        10 Hz TLV status stream reports the *moving* gains (funcube.c
        doagc from the status cycle + status thread 836-930)."""
        import select as _select

        from ka9q_sdr_tpu.apps.frontend import FrontEndDaemon, main as _fe
        from ka9q_sdr_tpu.net.multicast import setup_mcast
        from ka9q_sdr_tpu.net import status as st
        from ka9q_sdr_tpu.net.status import StatusType
        import argparse

        # loud recording: ~-1.4 dBFS, way above AGC_upper = -15
        n = 240 * 40
        loud = (0.85 * np.ones(n) + 0.0j).astype(np.complex64)
        pcm = np.empty(2 * n, np.int16)
        pcm[0::2] = np.round(loud.real * 32767)
        pcm[1::2] = 0
        rec = tmp_path / "loud.iq"
        rec.write_bytes(pcm.tobytes())

        grp = "239.88.31.1:5004"
        args = argparse.Namespace(
            output=grp, frequency="146m", samprate=192000.0,
            iq_file=str(rec), decimate_log2=0, ttl=0, agc="funcube",
            seconds=0.0,
        )
        d = FrontEndDaemon(args)
        rx_status = setup_mcast(grp, output=False, offset=2)

        # merge delta-coded status packets into a running mirror
        # (compact_packet suppresses unchanged keys, status.c:150-177)
        mirror = {}
        gains_seen = []

        def cycle(n):
            for _ in range(n):
                d.corrector.process(d.next_block())
                d.emit_status()
                ready, _, _ = _select.select([rx_status], [], [], 1.0)
                assert ready, "no status packet arrived"
                data = rx_status.recv(9000)
                items = dict(st.decode_packet(data[1:]))
                for k in (StatusType.LNA_GAIN, StatusType.MIXER_GAIN,
                          StatusType.IF_GAIN):
                    if k in items:
                        mirror[k] = int(st.decode_int(items[k]))
                if len(mirror) == 3:
                    gains_seen.append(dict(mirror))

        cycle(4)
        # the AGC shed gain until the A/D fell into the [-50,-15] dead
        # zone: IF was already 0, so the mixer (19 dB) went first, taking
        # ~-4 dBFS to ~-23 dBFS -- converged with the LNA still on
        last = gains_seen[-1]
        assert last[StatusType.MIXER_GAIN] == 0
        assert last[StatusType.LNA_GAIN] == 24
        p_db = 10 * np.log10(d.corrector.in_power)
        assert -50.0 < p_db < -15.0, p_db

        # signal fades below AGC_lower: the AGC walks the gains back up
        # (mixer on, then IF in 10 dB steps) and each move rides a packet
        quiet = (2e-4 * np.ones(n) + 0.0j).astype(np.complex64)
        qpcm = np.empty(2 * n, np.int16)
        qpcm[0::2] = np.round(quiet.real * 32767)
        qpcm[1::2] = 0
        qrec = tmp_path / "quiet.iq"
        qrec.write_bytes(qpcm.tobytes())
        d._file = open(qrec, "rb")
        cycle(6)
        assert gains_seen[-1][StatusType.MIXER_GAIN] == 19
        totals = [sum(g.values()) for g in gains_seen]
        assert len(set(totals)) >= 3, totals   # moving gains on the wire


class TestTCXOCalibration:
    """TCXO calibration model (funcube.c:51,131,238-252,751,795-808):
    ppm offset divides the commanded RF before the synthesizer and scales
    the quantised result back; settable over TLV CALIBRATE; persisted to
    a calibration file."""

    def _daemon(self, extra):
        from ka9q_sdr_tpu.apps.frontend import FrontEndDaemon, build_args

        args = build_args(
            ["-R", "239.88.9.2:5504", "-f", "146m52", "-r", "192000"]
            + extra)
        return FrontEndDaemon(args)

    def test_calibration_scales_actual(self):
        from ka9q_sdr_tpu.models.frontend import fcd_actual_frequency

        d = self._daemon(["--calibration", "10.0"])     # +10 ppm
        cal = 10.0 * 1e-6
        assert d.calibration == cal
        req = 146.52e6
        expect = fcd_actual_frequency(round(req / (1 + cal))) * (1 + cal)
        assert d.actual == expect
        # calibration COMPENSATES: the synthesizer register moves ~10 ppm
        # (funcube.c:799) so the true RF stays at the request
        assert abs(d.actual - req) < 2.0
        assert abs(round(req / (1 + cal)) - req) > 1000.0

    def test_calibrate_command_requantizes(self):
        from ka9q_sdr_tpu.net import status as st
        from ka9q_sdr_tpu.net.status import StatusType

        d = self._daemon([])
        a0 = d.actual
        pkt = bytearray([1])
        st.encode_double(pkt, StatusType.CALIBRATE, -5e-6)
        st.encode_eol(pkt)
        d.handle_command(bytes(pkt))
        assert d.calibration == -5e-6
        # requantised for the new TCXO estimate: the true RF stays pinned
        # to the commanded value (the register absorbs the 5 ppm)
        assert d.actual != a0
        assert abs(d.actual - d.requested) < 2.0
        # status stream reports the calibration (funcube.c:899)
        sent = []
        d.status_sock = type("S", (), {"send": lambda s, b: sent.append(b)})()
        d.emit_status()
        items = dict(st.decode_packet(sent[0][1:]))
        assert st.decode_double(items[StatusType.CALIBRATE]) == -5e-6

    def test_cal_file_save_and_load(self, tmp_path):
        cal = str(tmp_path / "cal-funcube-0")
        d1 = self._daemon(["--calibration", "7.5", "--cal-file", cal])
        assert open(cal).read().strip() == "7.5e-06"
        # a later start with no --calibration loads the saved estimate
        d2 = self._daemon(["--cal-file", cal])
        assert d2.calibration == 7.5e-6
        assert d2.actual == d1.actual
