"""Differential tests: the rebuild's DEMODULATORS vs the COMPILED reference C.

Extends the r5 DSP oracle from the filter layer up to demodulated PCM:
tests/c_ref.py compiles am.c, fm.c and linear.c for real (they were stubs
before), and tests/c_shim/shim_demod.c drives each demod as the actual
pthread it is in the reference — through the master/slave condvar
handshake (filter.c:175-199), captured send_mono/stereo_output, and the
set_mode termination sequence (radio.c:322-374).

With this file the BASELINE.json acceptance metric — "PCM RMS error vs
the C reference" — is finally computed against the *compiled C demods*
end to end (master FFT -> slave IFFT -> demod loop -> AGC -> PCM), not
against golden_ref.py's Python transliteration.  The C side uses the
double-precision oracle FFT (tests/c_shim/fftw_impl.c), so residuals
measure the rebuild's float32 error, not the oracle's.

Geometry mirrors the reference defaults (main.c:113-120): 192 kHz in,
L=3840/M=4353 (20 ms blocks), decimate 4 -> 48 kHz out, Kaiser beta 3.0,
headroom -15 dB.  LO2 premixing replicates the Receiver's internal
second-LO trajectory so both sides see identical baseband input.

Skipped as a unit when gcc or /root/reference is unavailable.
"""

from __future__ import annotations

import numpy as np
import pytest

import c_ref
from ka9q_sdr_tpu.models.receiver import Receiver, make_receiver_config
from ka9q_sdr_tpu.utils.modes import DEFAULT_MODES

cref = c_ref.get_cref()
pytestmark = pytest.mark.skipif(
    cref is None, reason="gcc or /root/reference unavailable"
)

FS, L, M, DEC, OLEN = 192000, 3840, 4353, 4, 960
KIND = {"AM": 0, "FM": 1, "LINEAR": 2}


def rms_dbfs(err: np.ndarray) -> float:
    r = float(np.sqrt(np.mean(np.asarray(err, np.float64) ** 2)))
    return 20 * np.log10(max(r, 1e-12))


def run_pair(mode_name: str, freq: float, gen, nblocks: int = 20,
             enable_pl: bool = False):
    """Drive identical input through the rebuild Receiver (tuned to
    `freq`) and the compiled C demod (fed the same samples premixed with
    the identical LO2 trajectory, radio.c:131-136).  Returns
    (ours, c_pcm, our_last_diag, c_sig)."""
    md = DEFAULT_MODES[mode_name]
    rx = Receiver(make_receiver_config(mode_name, samprate=FS,
                                       enable_pl=enable_pl))
    rx.set_freq(freq)

    ours, mixed = [], []
    lo2_phase = 0.0
    k = np.arange(L)
    diag = None
    for b in range(nblocks):
        tt = (b * L + k) / FS
        iq = gen(tt).astype(np.complex64)
        a, diag = rx.process(iq)
        ours.append(np.asarray(a))
        lo = np.exp(2j * np.pi * (lo2_phase + k * (-freq / FS)))
        lo2_phase = (lo2_phase + L * (-freq / FS)) % 1.0
        mixed.append((iq * lo).astype(np.complex64))

    channels = 2 if (md.demod == "LINEAR" and md.channels == 2) else 1
    pcm, sig = cref.demod_run(
        KIND[md.demod], np.concatenate(mixed),
        samprate=FS, L=L, M=M, decimate=DEC,
        low=md.low, high=md.high, kaiser_beta=3.0, headroom_db=-15.0,
        hangtime=md.hangtime, recovery_rate=md.recovery_rate,
        flat=md.flat, pll=md.pll, square=md.square, isb=md.isb,
        channels=channels, shift_hz=md.shift)
    return np.concatenate(ours), pcm, diag, sig


def settle(x: np.ndarray, blocks: int = 4) -> np.ndarray:
    return x[blocks * OLEN:]


class TestDemodVsCompiledC:
    def test_am_vs_c(self):
        """Envelope detector + hang AGC (am.c:21-81)."""
        a, g, _, sig = run_pair(
            "AM", 10000.0,
            lambda tt: 0.3 * (1 + 0.5 * np.sin(2 * np.pi * 400 * tt))
            * np.exp(2j * np.pi * 10000 * tt),
        )
        err = rms_dbfs(settle(a) - settle(g))
        print(f"AM vs C: signal {rms_dbfs(settle(g)):.1f} dBFS, "
              f"error {err:.1f} dBFS")
        assert err < -80.0
        assert sig["bb_power"] > 0

    def test_usb_vs_c(self):
        """Linear mono, no PLL (linear.c:114-300)."""
        a, g, _, _ = run_pair(
            "USB", 30000.0,
            lambda tt: 0.2 * np.exp(2j * np.pi * 31000 * tt)
            + 0.05 * np.exp(2j * np.pi * 32500 * tt),
        )
        err = rms_dbfs(settle(a) - settle(g))
        print(f"USB vs C: error {err:.1f} dBFS")
        assert err < -80.0

    def test_cwu_shift_vs_c(self):
        """CW offset oscillator after AGC (linear.c:283-289)."""
        a, g, _, _ = run_pair(
            "CWU", 30000.0,
            lambda tt: 0.2 * np.exp(2j * np.pi * 30050 * tt),
            nblocks=16,
        )
        err = rms_dbfs(settle(a) - settle(g))
        print(f"CWU vs C: error {err:.1f} dBFS")
        assert err < -80.0

    def test_iq_stereo_vs_c(self):
        """IQ stereo passthrough: I left, Q right (linear.c:297-300)."""
        a, g, _, _ = run_pair(
            "IQ", 15000.0,
            lambda tt: 0.2 * np.exp(2j * np.pi * 15800 * tt)
            + 0.1 * np.exp(2j * np.pi * 13500 * tt),
            nblocks=16,
        )
        assert a.shape[-1] == 2 and g.shape[-1] == 2
        err = rms_dbfs(settle(a) - settle(g))
        print(f"IQ vs C: error {err:.1f} dBFS")
        assert err < -80.0

    def test_isb_crossconj_vs_c(self):
        """ISB cross-conjugate sidebands as stereo (filter.c:239-249 +
        linear.c:117)."""
        a, g, _, _ = run_pair(
            "ISB", 30000.0,
            lambda tt: 0.2 * np.exp(2j * np.pi * 31000 * tt)
            + 0.15 * np.exp(2j * np.pi * 29300 * tt),
            nblocks=16,
        )
        err = rms_dbfs(settle(a) - settle(g))
        print(f"ISB vs C: error {err:.1f} dBFS")
        assert err < -80.0

    def test_fm_vs_c(self):
        """Discriminator + post-detection audio filter (fm.c:72-176)."""
        phase = {"p": 0.0}

        def gen(tt):
            inst = 4000 * np.cos(2 * np.pi * 1000 * tt)
            ph = np.cumsum(2 * np.pi * inst / FS) + phase["p"]
            phase["p"] = ph[-1]
            return 0.5 * np.exp(1j * (2 * np.pi * 20000 * tt + ph))

        a, g, diag, sig = run_pair("FM", 20000.0, gen)
        err = rms_dbfs(settle(a) - settle(g))
        print(f"FM vs C: error {err:.1f} dBFS")
        assert err < -80.0
        # status parity on the final block: foffset ~ 0, pdeviation ~ 4 kHz
        assert abs(sig["pdeviation"] - 4000.0) < 250.0
        assert abs(float(diag["pdeviation"]) - sig["pdeviation"]) < 100.0

    def test_fm_noisy_vs_c(self):
        """Threshold-extension blanking active (fm.c:119-146): the
        0.55*avg_amp blanking decisions are data-dependent branches; a
        flipped decision on float noise moves single samples, so demand
        deep-but-not-bitwise parity."""
        rng = np.random.default_rng(3)
        phase = {"p": 0.0}

        def gen(tt):
            inst = 3000 * np.cos(2 * np.pi * 800 * tt)
            ph = np.cumsum(2 * np.pi * inst / FS) + phase["p"]
            phase["p"] = ph[-1]
            sig = 0.3 * np.exp(1j * (2 * np.pi * 20000 * tt + ph))
            return sig + 0.02 * (rng.standard_normal(len(tt))
                                 + 1j * rng.standard_normal(len(tt)))

        a, g, _, _ = run_pair("FM", 20000.0, gen)
        err = rms_dbfs(settle(a) - settle(g))
        print(f"FM noisy vs C: error {err:.1f} dBFS")
        assert err < -60.0

    def test_fm_squelch_closed_vs_c(self):
        """Squelch closed on noise-only input: both sides emit zeros
        after the open->closed transition flush (fm.c:107-117,158-163)."""
        rng = np.random.default_rng(11)

        def gen(tt):
            return 0.01 * (rng.standard_normal(len(tt))
                           + 1j * rng.standard_normal(len(tt)))

        a, g, _, _ = run_pair("FM", 20000.0, gen, nblocks=12)
        # after the open->closed flush and the audio filter tail decays,
        # both sides must be silent
        assert rms_dbfs(settle(g, 6)) < -120.0, "C squelch should close"
        assert rms_dbfs(settle(a, 6)) < -120.0, "rebuild squelch should close"

    def test_cam_pll_vs_c(self):
        """Coherent AM: PLL acquisition (64K FFT search at the 0.73 Hz
        bin, linear.c:135-202), lag-lead loop, lock hysteresis
        (linear.c:157-170).  The C needs ~35 blocks of ring fill before
        the first acquisition FFT and ~120 blocks for the +-1 s lock
        hysteresis to flip — same trajectory the golden CAM test walks."""
        ferr = 20.0
        a, g, diag, sig = run_pair(
            "CAM", 30000.0,
            lambda tt: 0.3 * (1 + 0.3 * np.sin(2 * np.pi * 400 * tt))
            * np.exp(2j * np.pi * (30000 + ferr) * tt),
            nblocks=160,
        )
        # both PLLs must acquire and report lock on the final block
        assert sig["pll_lock"], "C PLL failed to lock"
        assert bool(np.asarray(diag["pll_lock"])), "rebuild PLL failed to lock"
        # the block-smoothed foffset estimates (linear.c:242-245) walk
        # different fine-loop trajectories — PARITY.md #15: the C's
        # integral gain is decimate x ours at this geometry — so demand
        # agreement only at the Hz scale, not the trajectory scale
        print(f"CAM foffset: C {sig['foffset']:.3f}, "
              f"ours {float(diag['foffset']):.3f} (ferr {ferr})")
        assert abs(float(diag["foffset"]) - sig["foffset"]) < 3.0, (
            float(diag["foffset"]), sig["foffset"])
        # locked-loop PCM parity (skip the acquisition transient).
        # Measured -151 dBFS: at the shipped 192k/4 geometry the loop
        # dynamics coincide and the trajectories track at float noise.
        err = rms_dbfs(settle(a, 130) - settle(g, 130))
        sig_rms = rms_dbfs(settle(g, 130))
        print(f"CAM vs C: signal {sig_rms:.1f}, error {err:.1f} dBFS")
        assert err < -80.0

    def test_fm_pl_tone_vs_c(self):
        """PL/CTCSS detection (fm.c pltask:190-280): both sides must
        report the injected 123 Hz subaudible tone."""
        phase = {"p": 0.0}

        def gen(tt):
            inst = (3500 * np.cos(2 * np.pi * 1000 * tt)
                    + 500 * np.cos(2 * np.pi * 123.0 * tt))
            ph = np.cumsum(2 * np.pi * inst / FS) + phase["p"]
            phase["p"] = ph[-1]
            return 0.5 * np.exp(1j * (2 * np.pi * 20000 * tt + ph))

        # pltask integrates ~ PL_N decimated samples before its first FFT;
        # feed enough blocks for at least one PL measurement on both sides
        a, g, diag, sig = run_pair("FM", 20000.0, gen, nblocks=90,
                                   enable_pl=True)
        err = rms_dbfs(settle(a) - settle(g))
        print(f"FM+PL vs C: pcm error {err:.1f} dBFS, "
              f"C plfreq {sig['plfreq']:.2f}, ours "
              f"{float(np.asarray(diag['plfreq'])):.2f}")
        assert err < -80.0
        assert abs(sig["plfreq"] - 123.0) < 3.0, sig["plfreq"]
        assert abs(float(np.asarray(diag["plfreq"])) - 123.0) < 3.0
