"""Front-end correction chain tests (funcube.c / hackrf.c DSP parity)."""

import numpy as np
import pytest

from ka9q_sdr_tpu.models.frontend import (
    FrontEndCorrector,
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
    def test_quantization_small_but_nonzero(self):
        f = 146.52e6
        actual = fcd_actual_frequency(f)
        assert actual != f           # quantised
        assert abs(actual - f) < 10  # but sub-10 Hz at VHF

    def test_monotonic(self):
        fs = [100e6, 100.000001e6, 100.00001e6]
        actuals = [fcd_actual_frequency(f) for f in fs]
        assert actuals == sorted(actuals)
