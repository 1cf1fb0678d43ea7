"""End-to-end demodulator tests against synthetic signals with known
content — the formalisation of the reference's modulate->iqplay->radio
closed-loop method (SURVEY.md §4)."""

import numpy as np
import pytest

from ka9q_sdr_tpu.models.receiver import (
    Receiver,
    make_receiver_config,
)

FS = 192000
L = 3840


def run_rx(rx, gen, nblocks=25):
    out = []
    diag = None
    for b in range(nblocks):
        tt = (b * L + np.arange(L)) / FS
        audio, diag = rx.process(gen(tt).astype(np.complex64))
        out.append(np.asarray(audio))
    return np.concatenate(out, axis=0), diag


def tone_freq(audio, rate=48000):
    seg = audio[len(audio) // 2:]
    spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
    f = np.fft.rfftfreq(len(seg), 1.0 / rate)
    return f[np.argmax(spec[5:]) + 5]


class TestAM:
    def test_am_tone(self):
        rx = Receiver(make_receiver_config("AM", samprate=FS))
        rx.set_freq(10000.0)
        audio, diag = run_rx(
            rx,
            lambda tt: 0.3
            * (1 + 0.5 * np.sin(2 * np.pi * 400 * tt))
            * np.exp(2j * np.pi * 10000 * tt),
            nblocks=50,
        )
        assert abs(tone_freq(audio) - 400.0) < 5.0
        # DC (carrier) removed: mean near zero relative to rms once the
        # 1e-4/sample DC tracker has settled (tau = 10k samples at 48 kHz)
        seg = audio[-5000:]
        assert abs(seg.mean()) < 0.1 * np.sqrt((seg**2).mean())

    def test_agc_levels_output(self):
        """Same tone at -20 dB different input level -> similar output
        level once AGC settles (am.c:64-74)."""
        outs = []
        for amp in (0.3, 0.03):
            rx = Receiver(make_receiver_config("AM", samprate=FS))
            rx.set_freq(10000.0)
            audio, _ = run_rx(
                rx,
                lambda tt: amp
                * (1 + 0.5 * np.sin(2 * np.pi * 400 * tt))
                * np.exp(2j * np.pi * 10000 * tt),
                nblocks=30,
            )
            seg = audio[-20000:]
            outs.append(np.sqrt((seg**2).mean()))
        assert 0.25 < outs[1] / outs[0] < 4.0


class TestFM:
    def _fm_iq(self, tt, fdev=5000.0, fmod=1000.0, carrier=20000.0, amp=0.5):
        inst = fdev * np.cos(2 * np.pi * fmod * tt)
        ph = np.cumsum(2 * np.pi * inst / FS)
        return amp * np.exp(1j * (2 * np.pi * carrier * tt + ph))

    def test_fm_tone(self):
        rx = Receiver(make_receiver_config("FM", samprate=FS))
        rx.set_freq(20000.0)
        audio, diag = run_rx(rx, self._fm_iq)
        assert abs(tone_freq(audio) - 1000.0) < 10.0
        assert bool(diag["squelch_open"])
        assert float(diag["snr"]) > 100.0

    def test_squelch_closes_on_noise(self):
        rng = np.random.default_rng(1)
        rx = Receiver(make_receiver_config("FM", samprate=FS))
        rx.set_freq(20000.0)
        audio, diag = run_rx(
            rx,
            lambda tt: 1e-3
            * (rng.standard_normal(len(tt)) + 1j * rng.standard_normal(len(tt))),
            nblocks=6,
        )
        assert not bool(diag["squelch_open"])
        # zeros propagate through the audio filter's overlap memory within
        # ~2 blocks of the squelch closing; the tail must be exactly zero
        assert np.all(audio[-1920:] == 0.0)

    def test_deviation_estimate(self):
        rx = Receiver(make_receiver_config("FM", samprate=FS))
        rx.set_freq(20000.0)
        _, diag = run_rx(rx, self._fm_iq, nblocks=10)
        assert 4000.0 < float(diag["pdeviation"]) < 6500.0

    def test_flat_mode(self):
        rx = Receiver(make_receiver_config("FMF", samprate=FS))
        rx.set_freq(20000.0)
        audio, _ = run_rx(rx, self._fm_iq)
        assert abs(tone_freq(audio) - 1000.0) < 10.0

    def test_pl_tone_detected(self):
        """100 Hz PL tone at small deviation should be measured by the
        pltask equivalent (fm.c:251-277): needs > 10.9 s of signal."""
        rx = Receiver(make_receiver_config("FM", samprate=FS))
        rx.set_freq(20000.0)
        phase = {"p": 0.0}

        def gen(tt):
            inst = 3000 * np.cos(2 * np.pi * 1000 * tt) + 750 * np.cos(
                2 * np.pi * 100.3 * tt
            )
            ph = np.cumsum(2 * np.pi * inst / FS) + phase["p"]
            phase["p"] = ph[-1]
            return 0.5 * np.exp(1j * (2 * np.pi * 20000 * tt + ph))

        _, diag = run_rx(rx, gen, nblocks=30)  # 0.6 s: ring partly filled
        pl = float(diag["plfreq"])
        # With a short run the ring is mostly zeros but the tone dominates.
        assert not np.isnan(pl)
        assert abs(pl - 100.3) < 2.0


class TestLinear:
    def test_usb_tone(self):
        rx = Receiver(make_receiver_config("USB", samprate=FS))
        rx.set_freq(30000.0)
        audio, _ = run_rx(
            rx, lambda tt: 0.2 * np.exp(2j * np.pi * 31000 * tt)
        )
        assert audio.ndim == 1  # mono
        assert abs(tone_freq(audio) - 1000.0) < 10.0

    def test_lsb_rejects_usb(self):
        rx = Receiver(make_receiver_config("LSB", samprate=FS))
        rx.set_freq(30000.0)
        audio, _ = run_rx(
            rx, lambda tt: 0.2 * np.exp(2j * np.pi * 31000 * tt)
        )
        seg = audio[len(audio) // 2:]
        # +1 kHz is in the rejected sideband: output stays far below the
        # AGC-settled level a passband tone would reach
        assert np.sqrt((seg**2).mean()) < 0.02

    def test_noiseless_pll_drifts_toward_lock(self):
        """noise == 0 is NAN SNR in the C (linear.c:309) and `NAN <
        thresh` is false, so the lock detector INCREMENTS on ideal
        noiseless input (regression: the port's 0.0 decremented — the
        opposite direction)."""
        import jax.numpy as jnp

        from ka9q_sdr_tpu.models.demod_linear import (
            LinearConfig, linear_init, linear_demod)

        cfg = LinearConfig.make(48000.0, 960, pll=True)
        st = linear_init(cfg)
        bb = jnp.asarray(0.3 * np.ones(960, np.complex64))  # Q exactly 0
        st, _, _ = linear_demod(cfg, st, bb)
        assert np.isinf(float(np.asarray(st.snr)))
        lock_before = int(np.asarray(st.lock_count))
        st, _, _ = linear_demod(cfg, st, bb)
        assert int(np.asarray(st.lock_count)) > lock_before

    def test_cwu_offset(self):
        """CW mode shifts the passband so a carrier at the dial frequency
        comes out at +700 Hz (modes.txt CWU)."""
        rx = Receiver(make_receiver_config("CWU", samprate=FS))
        rx.set_freq(30000.0)
        audio, _ = run_rx(
            rx, lambda tt: 0.2 * np.exp(2j * np.pi * 30000 * tt)
        )
        assert abs(tone_freq(audio) - 700.0) < 10.0

    def test_iq_stereo(self):
        rx = Receiver(make_receiver_config("IQ", samprate=FS))
        rx.set_freq(30000.0)
        audio, _ = run_rx(
            rx, lambda tt: 0.2 * np.exp(2j * np.pi * 31000 * tt), nblocks=5
        )
        assert audio.shape[-1] == 2  # stereo (I,Q)

    def test_cam_pll_locks(self):
        """Coherent AM: PLL should lock to a full-carrier AM signal with a
        small frequency error and drive foffset toward it."""
        rx = Receiver(make_receiver_config("CAM", samprate=FS))
        rx.set_freq(30000.0)
        ferr = 20.0
        audio, diag = run_rx(
            rx,
            lambda tt: 0.3
            * (1 + 0.3 * np.sin(2 * np.pi * 400 * tt))
            * np.exp(2j * np.pi * (30000 + ferr) * tt),
            # acquisition FFT needs 0.7 s of samples; the +/-1 s lock
            # hysteresis (linear.c:50) then needs ~100 blocks to swing from
            # fully-unlocked to locked
            nblocks=160,
        )
        # foffset display smooths at 0.001/block (linear.c:245, tau ~20 s);
        # check the loop internals instead: locked, and the FFT acquisition
        # found the carrier offset within a bin or two
        assert bool(diag["pll_lock"])
        assert abs(float(np.asarray(rx.state.demod.delta_f)) - ferr) < 2.0


class TestBank:
    def test_bank_matches_singlechannel_structure(self):
        from ka9q_sdr_tpu.models.bank import make_bank_config, ChannelBank

        fs = 1.536e6
        cfg = make_bank_config(4, "AM", samprate=fs, L=30720, M=34817)
        freqs = [-300e3, -75e3, 150e3, 333e3]
        bank = ChannelBank(cfg, freqs)
        out = []
        for b in range(20):
            tt = (b * 30720 + np.arange(30720)) / fs
            sig = (
                0.3
                * (1 + 0.5 * np.sin(2 * np.pi * 400 * tt))
                * np.exp(2j * np.pi * freqs[2] * tt)
            ).astype(np.complex64)
            audio, _ = bank.process(sig)
            out.append(np.asarray(audio))
        a = np.concatenate(out, axis=-1)
        assert a.shape[0] == 4
        assert abs(tone_freq(a[2]) - 400.0) < 5.0

    def test_out_of_span_frequency_fails_loud(self):
        """bank_init/bank_tune must reject |f| > samprate/2 instead of
        letting k % N alias it onto an in-band bin (a -2e11 Hz channel —
        the old signed parse_frequency heuristic's output for '-200000' —
        used to build fine and demodulate garbage)."""
        import pytest

        from ka9q_sdr_tpu.models.bank import (
            make_bank_config, bank_init, bank_tune,
        )

        fs = 1.536e6
        cfg = make_bank_config(2, "USB", samprate=fs, L=30720, M=34817)
        with pytest.raises(ValueError, match="outside"):
            bank_init(cfg, [-200e9, 100e3])
        with pytest.raises(ValueError, match="outside"):
            bank_init(cfg, [float("nan"), 100e3])
        st = bank_init(cfg, [-200e3, 100e3])
        with pytest.raises(ValueError, match="outside"):
            bank_tune(cfg, st, 0, fs)          # beyond +-fs/2
        bank_tune(cfg, st, 0, -fs / 2)         # edge is legal

    def test_swap_filter_response_keeps_complex_state_form(self):
        """swap_filter_response on a RAW bank_init state (complex resp
        leaf) must keep it complex (regression: it always packed c2r into
        a real (N,2) leaf, shape-crashing the next bank_step)."""
        import jax.numpy as jnp

        from ka9q_sdr_tpu.models.bank import (
            make_bank_config,
            bank_init,
            bank_step,
            swap_filter_response,
        )

        fs = 1.536e6
        cfg = make_bank_config(2, "AM", samprate=fs, L=30720, M=34817)
        st = bank_init(cfg, [-300e3, 150e3])
        assert jnp.iscomplexobj(st.resp)
        cfg2, st2 = swap_filter_response(cfg, st, low=-4000.0, high=4000.0)
        assert jnp.iscomplexobj(st2.resp)
        x = np.zeros(30720, np.complex64)
        st3, audio, _ = bank_step(cfg2, st2, x)   # must not shape-crash
        assert np.all(np.isfinite(np.asarray(audio)))

    def test_fm_gain_follows_live_filter_edits(self):
        """fm.c recomputes the audio gain from the CURRENT edges every
        block (fm.c:85-86): halving the bandwidth doubles the constant."""
        from ka9q_sdr_tpu.models.receiver import Receiver, make_receiver_config
        from ka9q_sdr_tpu.models.bank import (
            make_bank_config, bank_init, swap_filter_response)

        rx = Receiver(make_receiver_config("FM", samprate=192000.0,
                                           enable_pl=False))
        g0 = rx.cfg.demod_cfg.gain
        low0, high0 = rx.cfg.mode.low, rx.cfg.mode.high
        rx.set_filter(low=low0 / 2, high=high0 / 2)
        assert abs(rx.cfg.demod_cfg.gain / g0 - 2.0) < 1e-6

        cfg = make_bank_config(2, "FM", samprate=1.536e6, L=30720, M=34817)
        st = bank_init(cfg, [-300e3, 150e3])
        g0 = cfg.demod_cfg.gain
        cfg2, _ = swap_filter_response(cfg, st, low=cfg.mode.low / 2,
                                       high=cfg.mode.high / 2)
        assert abs(cfg2.demod_cfg.gain / g0 - 2.0) < 1e-6

    def test_bank_offbin_phase_continuity(self):
        """Tone at an off-bin channel center must come out as clean DC:
        validates the r/dr block-phase correction and residual NCO."""
        from ka9q_sdr_tpu.models.bank import (
            make_bank_config,
            bank_init,
            bank_channelize,
        )
        from ka9q_sdr_tpu.ops.fftfilt import master_execute

        fs = 1.536e6
        cfg = make_bank_config(2, "IQ", samprate=fs, L=30720, M=34817)
        f0 = 123456.789
        st = bank_init(cfg, [f0, -100e3])
        outs = []
        for b in range(6):
            tt = (b * 30720 + np.arange(30720)) / fs
            sig = (0.5 * np.exp(2j * np.pi * (f0 + 1000.0) * tt)).astype(
                np.complex64
            )
            overlap, fd = master_execute(cfg.master, st.overlap, sig)
            new_r, new_nco, bb = bank_channelize(cfg, st, fd)
            st = st._replace(overlap=overlap, r=new_r, nco=new_nco)
            outs.append(np.asarray(bb[0]))
        a = np.concatenate(outs)[2000:]
        ph = np.unwrap(np.angle(a))
        freq = (ph[-1] - ph[0]) / (len(ph) - 1) / (2 * np.pi) * 48000
        assert abs(freq - 1000.0) < 0.01
        resid = ph - np.linspace(ph[0], ph[-1], len(ph))
        assert np.std(resid) < 1e-3

    def test_bank_retune(self):
        from ka9q_sdr_tpu.models.bank import make_bank_config, ChannelBank

        fs = 1.536e6
        cfg = make_bank_config(2, "AM", samprate=fs, L=30720, M=34817)
        bank = ChannelBank(cfg, [-100e3, 100e3])
        bank.tune(0, 222e3)
        out = []
        for b in range(20):
            tt = (b * 30720 + np.arange(30720)) / fs
            sig = (
                0.3
                * (1 + 0.5 * np.sin(2 * np.pi * 700 * tt))
                * np.exp(2j * np.pi * 222e3 * tt)
            ).astype(np.complex64)
            audio, _ = bank.process(sig)
            out.append(np.asarray(audio))
        a = np.concatenate(out, axis=-1)
        assert abs(tone_freq(a[0]) - 700.0) < 5.0


class TestMultiBank:
    def test_mixed_modes_share_fft(self):
        """FM + AM + USB groups demodulate concurrently off ONE wideband
        FFT (the master/slave fan-out at scale, filter.c:22-35)."""
        from ka9q_sdr_tpu.models.bank import MultiBank

        fs, Lw = 1.536e6, 30720
        groups = [("FM", [-300e3, -100e3]), ("AM", [150e3]), ("USB", [333e3])]
        mb = MultiBank(groups, samprate=fs, L=Lw, M=34817)
        phase = 0.0
        buf = {0: [], 1: [], 2: []}
        for b in range(40):
            tt = (b * Lw + np.arange(Lw)) / fs
            inst = 3000 * np.cos(2 * np.pi * 1000 * tt)
            ph = np.cumsum(2 * np.pi * inst / fs) + phase
            phase = ph[-1]
            sig = 0.3 * np.exp(1j * (2 * np.pi * (-100e3) * tt + ph))
            sig = sig + 0.3 * (1 + 0.5 * np.sin(2 * np.pi * 400 * tt)) * np.exp(
                2j * np.pi * 150e3 * tt
            )
            sig = sig + 0.2 * np.exp(2j * np.pi * (333e3 + 700) * tt)
            outs = mb.process(sig.astype(np.complex64))
            if b >= 15:
                buf[0].append(np.asarray(outs[0][0])[1])
                buf[1].append(np.asarray(outs[1][0])[0])
                buf[2].append(np.asarray(outs[2][0])[0])
        assert abs(tone_freq(np.concatenate(buf[0])) - 1000) < 5
        assert abs(tone_freq(np.concatenate(buf[1])) - 400) < 5
        assert abs(tone_freq(np.concatenate(buf[2])) - 700) < 5
        # quiet FM channel squelches
        assert bool(np.asarray(outs[0][1]["squelch_open"])[1])
        assert not bool(np.asarray(outs[0][1]["squelch_open"])[0])


class TestActiveCompaction:
    def test_top_k_active_selection(self):
        """Device-side silence suppression at bank scale: only non-silent
        channels cross the host boundary (bank_step_active)."""
        from ka9q_sdr_tpu.models.bank import make_bank_config, ChannelBank

        fs, Lw = 1.536e6, 30720
        cfg = make_bank_config(8, "FM", samprate=fs, L=Lw, M=34817)
        freqs = list(np.linspace(-0.45 * fs, 0.45 * fs, 8, endpoint=False))
        bank = ChannelBank(cfg, freqs)
        rng = np.random.default_rng(5)
        phase = 0.0
        for b in range(10):
            tt = (b * Lw + np.arange(Lw)) / fs
            inst = 3000 * np.cos(2 * np.pi * 1000 * tt)
            ph = np.cumsum(2 * np.pi * inst / fs) + phase
            phase = ph[-1]
            sig = 0.4 * np.exp(1j * (2 * np.pi * freqs[3] * tt + ph))
            sig = sig + 0.4 * np.exp(1j * (2 * np.pi * freqs[6] * tt + 0.7 * ph))
            sig = sig + 0.003 * (
                rng.standard_normal(Lw) + 1j * rng.standard_normal(Lw)
            )
            x = np.empty((Lw, 2), np.int16)
            x[:, 0] = np.clip(sig.real * 32767, -32768, 32767)
            x[:, 1] = np.clip(sig.imag * 32767, -32768, 32767)
            pcm, idx, diag = bank.process_active(x, max_active=4)
        act = sorted(int(i) for i in np.asarray(idx) if i >= 0)
        assert act == [3, 6]
        assert np.asarray(pcm).dtype == np.int16

    def test_pcm_advance_keeps_clock(self):
        """Suppressed channels still advance the RTP timestamp and flag
        the next talk spurt (audio.c silence suppression semantics)."""
        from ka9q_sdr_tpu.io.pcm import PCMOutput
        from ka9q_sdr_tpu.net.rtp import RTPHeader

        sent = []
        out = PCMOutput(send=sent.append, ssrc=1)
        out.send_mono_i16(np.full(480, 1000, np.int16))
        out.advance(960)   # two suppressed blocks
        out.send_mono_i16(np.full(480, 1000, np.int16))
        h0, _ = RTPHeader.from_bytes(sent[0])
        h1, _ = RTPHeader.from_bytes(sent[1])
        assert h1.timestamp - h0.timestamp == 480 + 960
        assert h1.marker   # talk-spurt restart after suppression


class TestISB:
    def test_independent_sidebands_split(self):
        """ISB (CROSS_CONJ, filter.c:239-249): the lower sideband lands on
        the I (left) channel and the upper on Q (right)."""
        rx = Receiver(make_receiver_config("ISB", samprate=FS))
        rx.set_freq(30000.0)
        out = []
        for b in range(25):
            tt = (b * L + np.arange(L)) / FS
            sig = 0.2 * np.exp(2j * np.pi * (30000 + 1000) * tt)   # USB tone
            sig = sig + 0.2 * np.exp(2j * np.pi * (30000 - 700) * tt)  # LSB
            audio, _ = rx.process(sig.astype(np.complex64))
            out.append(np.asarray(audio))
        a = np.concatenate(out, axis=0)   # (n, 2) stereo
        left, right = a[len(a) // 2:, 0], a[len(a) // 2:, 1]

        def peak(x):
            sp = np.abs(np.fft.rfft(x * np.hanning(len(x))))
            return np.fft.rfftfreq(len(x), 1 / 48000)[np.argmax(sp[5:]) + 5]

        lp, rp = peak(left), peak(right)
        # one channel carries the 700 Hz LSB tone, the other the 1 kHz USB
        assert {round(lp, -1), round(rp, -1)} == {700.0, 1000.0}, (lp, rp)


class TestDSB:
    def test_squaring_loop_recovers_carrier(self):
        """DSB: the squaring loop regenerates the suppressed carrier at 2f
        and the PLL locks at f (linear.c:135-144,190-199)."""
        rx = Receiver(make_receiver_config("DSB", samprate=FS))
        rx.set_freq(30000.0)
        ferr = 15.0
        out = []
        diag = None
        for b in range(170):
            tt = (b * L + np.arange(L)) / FS
            # suppressed-carrier DSB: audio tone x carrier
            sig = (
                0.4 * np.sin(2 * np.pi * 600 * tt)
                * np.exp(2j * np.pi * (30000 + ferr) * tt)
            ).astype(np.complex64)
            audio, diag = rx.process(sig)
            out.append(np.asarray(audio))
        assert bool(diag["pll_lock"])
        # acquisition found the carrier (delta_f is half the 2f component)
        assert abs(float(np.asarray(rx.state.demod.delta_f)) - ferr) < 2.0
        a = np.concatenate(out)[-30000:]
        sp = np.abs(np.fft.rfft(a * np.hanning(len(a))))
        f = np.fft.rfftfreq(len(a), 1 / 48000)
        assert abs(f[np.argmax(sp[5:]) + 5] - 600.0) < 10.0


class TestAME:
    def test_enhanced_am(self):
        """AME (CHU-style USB + full carrier, modes.txt:39): PLL tracks the
        carrier; the USB audio comes through."""
        rx = Receiver(make_receiver_config("AME", samprate=FS))
        rx.set_freq(30000.0)
        out = []
        for b in range(60):
            tt = (b * L + np.arange(L)) / FS
            sig = 0.3 * np.exp(2j * np.pi * 30000 * tt)          # carrier
            sig = sig + 0.15 * np.exp(2j * np.pi * 31000 * tt)   # USB tone
            audio, diag = rx.process(sig.astype(np.complex64))
            out.append(np.asarray(audio))
        a = np.concatenate(out)
        assert abs(tone_freq(a) - 1000.0) < 10.0


class TestBatchedPLL:
    def test_cam_bank_channels_lock_independently(self):
        """Coherent (PLL) modes batched across bank channels: each channel
        runs its own acquisition FFT, loop filter and lock hysteresis."""
        from ka9q_sdr_tpu.models.bank import make_bank_config, ChannelBank

        fs, Lw = 1.536e6, 30720
        cfg = make_bank_config(2, "CAM", samprate=fs, L=Lw, M=34817)
        freqs = [-200e3, 150e3]
        bank = ChannelBank(cfg, freqs)
        rng = np.random.default_rng(2)
        diag = None
        for b in range(170):
            tt = (b * Lw + np.arange(Lw)) / fs
            sig = 0.3 * (1 + 0.3 * np.sin(2 * np.pi * 400 * tt)) * np.exp(
                2j * np.pi * (freqs[0] + 12.0) * tt
            )
            sig = sig + 0.3 * (1 + 0.3 * np.sin(2 * np.pi * 900 * tt)) * np.exp(
                2j * np.pi * (freqs[1] - 20.0) * tt
            )
            sig = sig + 0.002 * (
                rng.standard_normal(Lw) + 1j * rng.standard_normal(Lw)
            )
            _, diag = bank.process(sig.astype(np.complex64))
        assert np.asarray(diag["pll_lock"]).all()
        df = np.asarray(bank.state.demod.delta_f)
        assert abs(df[0] - 12.0) < 2.0 and abs(df[1] + 20.0) < 2.0


class TestBankScan:
    def test_scan_matches_stepwise(self):
        """bank_scan_packed_i16 (k blocks per device program) carries the
        exact same state trajectory as k sequential bank_step calls."""
        import jax
        from ka9q_sdr_tpu.models.bank import (
            make_bank_config, ChannelBank, bank_step_packed,
        )

        fs, Lw, Mw = 1.536e6, 3840, 4353
        cfg = make_bank_config(4, "FM", samprate=fs, L=Lw, M=Mw)
        usable = 0.9 * fs
        freqs = list(np.linspace(-usable / 2, usable / 2, 4, endpoint=False))
        bank = ChannelBank(cfg, freqs)
        ref = ChannelBank(cfg, freqs)

        rng = np.random.default_rng(11)
        k = 5
        tt = np.arange(k * Lw) / fs
        x = (0.01 * (rng.standard_normal(k * Lw)
                     + 1j * rng.standard_normal(k * Lw))
             + 0.3 * np.exp(2j * np.pi * freqs[1] * tt)).astype(np.complex64)
        xi = np.empty((k, Lw, 2), np.int16)
        xi[..., 0] = np.clip(x.real * 32767, -32768, 32767).reshape(k, Lw)
        xi[..., 1] = np.clip(x.imag * 32767, -32768, 32767).reshape(k, Lw)

        scanned = np.asarray(bank.process_scan_i16(xi))
        stepped = []
        for b in range(k):
            audio, _ = ref.process_i16(xi[b])
            stepped.append(np.asarray(audio))
        np.testing.assert_allclose(
            scanned, np.stack(stepped), atol=1e-6, rtol=1e-5
        )
        for a, b in zip(jax.tree_util.tree_leaves(bank.state),
                        jax.tree_util.tree_leaves(ref.state)):
            np.testing.assert_allclose(
                np.asarray(a, np.float64), np.asarray(b, np.float64),
                atol=1e-6, rtol=1e-5,
            )


class TestBankISB:
    def test_bank_isb_matches_single_receiver(self):
        """CISB in the bank applies the CROSS_CONJ combine
        (filter.c:239-249) exactly like the single-channel receiver."""
        from ka9q_sdr_tpu.models.bank import make_bank_config, ChannelBank
        from ka9q_sdr_tpu.models.receiver import (
            Receiver, make_receiver_config,
        )

        fs, Lw, Mw = 1.536e6, 30720, 34817
        cfg = make_bank_config(2, "CISB", samprate=fs, L=Lw, M=Mw)
        # exact master bin: the frequency-domain path is then identical
        # to the time-domain LO2 (cf. TestBankVsReceiver)
        f0 = 8533 * fs / (Lw + Mw - 1)
        bank = ChannelBank(cfg, [f0, -150e3])
        rx = Receiver(make_receiver_config("CISB", samprate=int(fs),
                                           L=Lw, M=Mw))
        rx.set_freq(f0)

        rng = np.random.default_rng(8)
        outs_b, outs_r = [], []
        for b in range(4):
            tt = (b * Lw + np.arange(Lw)) / fs
            # LSB tone + USB tone around the channel center
            iq = (0.2 * np.exp(2j * np.pi * (f0 - 1000) * tt)
                  + 0.1 * np.exp(2j * np.pi * (f0 + 2000) * tt)
                  + 0.001 * (rng.standard_normal(Lw)
                             + 1j * rng.standard_normal(Lw))
                  ).astype(np.complex64)
            ab, _ = bank.process(iq)
            ar, _ = rx.process(iq)
            outs_b.append(np.asarray(ab)[0])
            outs_r.append(np.asarray(ar))
        b_ = np.concatenate(outs_b)[960:]
        r_ = np.concatenate(outs_r)[960:]
        err = np.sqrt(np.mean((b_ - r_) ** 2))
        sig = np.sqrt(np.mean(r_ ** 2))
        assert err < 1e-4 * max(sig, 1e-9) + 1e-6, (err, sig)

    def test_bank_isb_off_bin_channel(self):
        """ISB with a NONZERO residual NCO (channel tuned off the master
        bin grid): the bank splits sidebands at the pre-residual bin
        boundary while the reference splits after the full LO mix, so
        content within the sub-bin residual (< fs/2N ~ 12 Hz here) of
        channel center can classify into the opposite sideband — a
        documented divergence (PARITY.md).  For real passband content
        (tones ≥ 1 kHz out) the two must still agree closely: the
        group-delay phase of the delta-shifted response sampling is
        corrected exactly (_residual_phase_cycles — without it this
        test fails at ~full signal level).  Plain ISB, no PLL (the CISB
        PLL's settling would add its own variance)."""
        from ka9q_sdr_tpu.models.bank import make_bank_config, ChannelBank
        from ka9q_sdr_tpu.models.receiver import (
            Receiver, make_receiver_config,
        )

        fs, Lw, Mw = 1.536e6, 30720, 34817
        N = Lw + Mw - 1
        cfg = make_bank_config(2, "ISB", samprate=fs, L=Lw, M=Mw)
        # half a master bin off the grid: the residual NCO runs at its
        # maximum |delta| = fs/2N ~ 11.7 Hz
        f0 = (8533 + 0.5) * fs / N
        bank = ChannelBank(cfg, [f0, -150e3])
        assert float(np.asarray(bank._template.nco.freq)[0]) != 0.0
        rx = Receiver(make_receiver_config("ISB", samprate=int(fs),
                                           L=Lw, M=Mw))
        rx.set_freq(f0)

        rng = np.random.default_rng(9)
        outs_b, outs_r = [], []
        for b in range(4):
            tt = (b * Lw + np.arange(Lw)) / fs
            iq = (0.2 * np.exp(2j * np.pi * (f0 - 1000) * tt)
                  + 0.1 * np.exp(2j * np.pi * (f0 + 2000) * tt)
                  + 0.001 * (rng.standard_normal(Lw)
                             + 1j * rng.standard_normal(Lw))
                  ).astype(np.complex64)
            ab, _ = bank.process(iq)
            ar, _ = rx.process(iq)
            outs_b.append(np.asarray(ab)[0])
            outs_r.append(np.asarray(ar))
        b_ = np.concatenate(outs_b)[960:]
        r_ = np.concatenate(outs_r)[960:]
        err = np.sqrt(np.mean((b_ - r_) ** 2))
        sig = np.sqrt(np.mean(r_ ** 2))
        # what remains off-bin is the shared response's |R| sampled
        # delta off (amplitude interpolation, ~-50 dB here); the phase
        # term is corrected exactly
        assert err < 5e-3 * max(sig, 1e-9) + 1e-6, (err, sig)


class TestLongBlockCadence:
    def test_block_length_does_not_change_audio_content(self):
        """Overlap-save output is cadence-invariant: the same signal
        through a 20 ms-cadence bank and a long-block bank (same 1089-tap
        channel impulse, N_dec 2048 vs 4096) recovers the same tone at
        the same level (the throughput knob of derive_geometry must not
        alter demodulation)."""
        from ka9q_sdr_tpu.models.bank import make_bank_config, ChannelBank

        fs = 1.536e6
        dec = 32
        f0 = 200e3

        def run(l_dec):
            L = l_dec * dec
            M = 1088 * dec + 1
            cfg = make_bank_config(2, "AM", samprate=fs, L=L, M=M)
            bank = ChannelBank(cfg, [f0, -100e3])
            outs = []
            # 2 s of signal for both cadences so the hang AGC fully
            # settles; analyze the same trailing 0.5 s window
            nblocks = max(2, round(2.0 * fs / L))
            for b in range(nblocks):
                tt = (b * L + np.arange(L)) / fs
                iq = (0.3 * (1 + 0.5 * np.sin(2 * np.pi * 400 * tt))
                      * np.exp(2j * np.pi * f0 * tt)).astype(np.complex64)
                audio, _ = bank.process(iq)
                outs.append(np.asarray(audio)[0])
            a = np.concatenate(outs)
            a = a[-24000:]
            spec = np.abs(np.fft.rfft(a * np.hanning(len(a)))) / len(a)
            f = np.fft.rfftfreq(len(a), 1 / 48000)
            pk = np.argmax(spec[5:]) + 5
            return f[pk], spec[pk]

        f_short, amp_short = run(960)     # 20 ms blocks
        f_long, amp_long = run(3008)      # ~63 ms blocks
        assert abs(f_short - 400.0) < 5 and abs(f_long - 400.0) < 5
        # same audio level within 0.2 dB (response grids differ slightly)
        assert abs(20 * np.log10(amp_long / amp_short)) < 0.2


class TestBankTunePaths:
    def test_old_freq_path_matches_fetch_path(self):
        """bank_tune with old_freq_hz (the fetch-free ChannelBank path)
        produces the identical state to the fetch-reconstruction path —
        including the group-delay phase-correction differential."""
        import jax
        from ka9q_sdr_tpu.models.bank import (
            make_bank_config, bank_init, bank_tune,
        )
        from ka9q_sdr_tpu.ops.packing import tree_c2r_np

        fs, Lw, Mw = 1.536e6, 3840, 4353
        cfg = make_bank_config(4, "AM", samprate=fs, L=Lw, M=Mw)
        freqs = [-300e3 + 7.3, -75e3, 150e3 + 11.1, 333e3]
        st = tree_c2r_np(jax.tree_util.tree_map(
            np.asarray, bank_init(cfg, freqs)))
        f_new = 200e3 + 3.7            # off-grid: nonzero residual + corr
        a = bank_tune(cfg, st, 2, f_new, old_freq_hz=freqs[2])
        b = bank_tune(cfg, st, 2, f_new)              # fetch fallback
        for la, lb in zip(jax.tree_util.tree_leaves(a),
                          jax.tree_util.tree_leaves(b)):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


class TestNonAlignedGeometry:
    def test_non_chunk_multiple_ndec_falls_back(self):
        """A slave geometry whose N_dec is not a multiple of the 128-bin
        gather chunk (N=6144, N_dec=192) routes through the per-element
        fallback and still demodulates correctly."""
        from ka9q_sdr_tpu.models.bank import make_bank_config, ChannelBank

        fs = 1.536e6
        Lw, Mw = 3072, 3073        # N = 6144, decim 32 -> N_dec = 192
        cfg = make_bank_config(2, "AM", samprate=fs, L=Lw, M=Mw)
        assert cfg.N_dec % 128 != 0
        f0 = 200e3 + 7.0
        bank = ChannelBank(cfg, [f0, -100e3])
        out = []
        for b in range(30):
            tt = (b * Lw + np.arange(Lw)) / fs
            iq = (0.2 * (1 + 0.5 * np.sin(2 * np.pi * 400 * tt))
                  * np.exp(2j * np.pi * f0 * tt)).astype(np.complex64)
            audio, _ = bank.process(iq)
            out.append(np.asarray(audio)[0])
        a = np.concatenate(out)[len(out[0]) * 10:]
        spec = np.abs(np.fft.rfft(a * np.hanning(len(a))))
        f = np.fft.rfftfreq(len(a), 1.0 / 48000.0)
        assert abs(f[np.argmax(spec[3:]) + 3] - 400.0) < 10.0
