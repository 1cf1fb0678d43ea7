"""AGC / IIR / forward-fill / decimator parity vs naive per-sample loops."""

import numpy as np
import jax.numpy as jnp

from ka9q_sdr_tpu.ops import agc as A
from ka9q_sdr_tpu.ops import iir as I
from ka9q_sdr_tpu.ops import ffill as FF
from ka9q_sdr_tpu.ops import decimate as D


def _agc_ref(levels, gain, hang, headroom, recovery, hangmax):
    """Literal transcription of the reference recurrence (am.c:64-74)."""
    gains = np.empty_like(levels)
    for n, lev in enumerate(levels):
        if np.isnan(gain):
            gain = headroom / lev
        elif gain * lev > headroom:
            gain = headroom / lev
            hang = hangmax
        elif hang != 0:
            hang -= 1
        else:
            gain *= recovery
        gains[n] = gain
    return gains, gain, hang


def test_agc_matches_reference_loop(rng):
    params = A.AGCParams(headroom=0.3, recovery_factor=1.0005, hangmax=50)
    levels = np.abs(rng.standard_normal(1000)).astype(np.float32) * 0.05
    levels[300] = 5.0  # spike: clamp + hang
    levels[700] = 3.0
    st = A.agc_init(80.0)
    st2, gains = A.agc_block(st, jnp.asarray(levels), params)
    ref_gains, ref_gain, ref_hang = _agc_ref(
        levels.astype(np.float64), A.db2voltage(80.0), 0,
        params.headroom, params.recovery_factor, params.hangmax,
    )
    np.testing.assert_allclose(np.asarray(gains), ref_gains, rtol=1e-4)
    assert abs(float(st2.gain) - ref_gain) / ref_gain < 1e-4
    assert int(st2.hangcount) == ref_hang


def test_agc_batched(rng):
    params = A.AGCParams(headroom=0.3, recovery_factor=1.001, hangmax=10)
    levels = np.abs(rng.standard_normal((4, 500))).astype(np.float32) * 0.1
    st = A.agc_init(80.0, batch_shape=(4,))
    _, gains = A.agc_block(st, jnp.asarray(levels), params)
    for c in range(4):
        ref, _, _ = _agc_ref(
            levels[c].astype(np.float64), A.db2voltage(80.0), 0,
            params.headroom, params.recovery_factor, params.hangmax,
        )
        np.testing.assert_allclose(np.asarray(gains[c]), ref, rtol=1e-4)


def test_one_pole_matches_loop(rng):
    x = rng.standard_normal(777).astype(np.float32)
    alpha = 1e-2
    y0 = 0.5
    last, trace = I.one_pole_lowpass(jnp.float32(y0), jnp.asarray(x), alpha)
    y = y0
    ref = np.empty_like(x)
    for n, v in enumerate(x):
        y += alpha * (v - y)
        ref[n] = y
    np.testing.assert_allclose(np.asarray(trace), ref, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(last), y, rtol=1e-4)


def test_notch_removes_tone(rng):
    f = 0.1
    n = np.arange(20000)
    tone = np.exp(2j * np.pi * f * n)
    noise = 0.1 * (rng.standard_normal(len(n)) + 1j * rng.standard_normal(len(n)))
    x = (tone + noise).astype(np.complex64)
    st = I.notch_init(f, 0.005)
    st, y = I.notch_block(st, jnp.asarray(x))
    y = np.asarray(y)[5000:]
    # tone suppressed, noise passes
    spec = np.abs(np.fft.fft(y))
    tone_bin = int(round(f * len(y)))
    assert spec[tone_bin] < 0.05 * len(y) ** 0.5 * 10


def test_forward_fill():
    vals = jnp.asarray(np.arange(10, dtype=np.float32))
    mask = jnp.asarray([0, 1, 0, 0, 1, 0, 0, 0, 1, 0], bool)
    out = FF.forward_fill(vals, mask, jnp.float32(-1))
    np.testing.assert_array_equal(
        np.asarray(out), [-1, 1, 1, 1, 4, 4, 4, 4, 8, 8]
    )


def test_hb15_is_halfband_decimator(rng):
    taps = D.hb15_coeffs()
    assert taps[7] == 1.0
    assert np.allclose(np.sum(taps), 2.0)  # +6 dB DC gain (decimate.c:3)
    x = rng.standard_normal(4096).astype(np.float32)
    st = jnp.zeros(14, jnp.float32)
    st, y = D.hb15_block(st, jnp.asarray(x))
    got = np.asarray(y)
    direct = np.convolve(np.concatenate([np.zeros(14), x]), taps)[14 : 14 + len(x) : 2]
    np.testing.assert_allclose(got, direct, rtol=1e-4, atol=1e-5)


def test_cascade_dc_gain():
    # With the hackrf defaults (stage_threshold=8 > log_decimate) every
    # stage is hb15 with +6 dB DC gain; Filter_atten = 0.5^stages
    # compensates (hackrf.c:469).
    log_d = 6
    states = D.cascade_init(log_d, stage_threshold=8)
    x = jnp.ones(64 * 128, jnp.float32)
    _, y = D.hb_cascade(states, x, log_d, stage_threshold=8)
    np.testing.assert_allclose(np.asarray(y)[-16:], 2.0**log_d, rtol=1e-4)
    # hb3 stages (taps 1,2,1) have DC gain 4
    states = D.cascade_init(log_d, stage_threshold=4)
    _, y = D.hb_cascade(states, x, log_d, stage_threshold=4)
    np.testing.assert_allclose(np.asarray(y)[-16:], 4.0**2 * 2.0**4, rtol=1e-4)


class TestDistributedFFT:
    """Sequence-scaling primitive: the wideband FFT split across the mesh
    (reduce_scatter + local FFTs; parallel/dfft.py)."""

    def test_matches_numpy(self):
        import jax
        import numpy as np
        from ka9q_sdr_tpu.parallel.mesh import make_channel_mesh
        from ka9q_sdr_tpu.parallel.dfft import dfft

        if len(jax.devices()) < 8:
            import pytest

            pytest.skip("needs the 8-virtual-device mesh")
        mesh = make_channel_mesh(8)
        rng = np.random.default_rng(0)
        for N in (1 << 12, 1 << 14):
            x = (rng.standard_normal(N) + 1j * rng.standard_normal(N)).astype(
                np.complex64
            )
            X = dfft(mesh, x)
            ref = np.fft.fft(x)
            err = np.abs(X - ref).max() / np.abs(ref).max()
            assert err < 1e-4, (N, err)

    def test_comb_addressing(self):
        import numpy as np
        from ka9q_sdr_tpu.parallel.dfft import comb_index

        perm = comb_index(16, 4)
        # device j owns bins j, j+4, j+8, j+12 at local offsets 0..3
        assert perm[0] == 0 and perm[4] == 1      # bin 4 = device 0, m=1
        assert perm[1] == 4 and perm[5] == 5      # bin 1 = device 1, m=0
