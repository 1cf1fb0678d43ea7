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
