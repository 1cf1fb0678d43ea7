"""NCO: phase continuity, spectral purity, retune and sweep semantics
(osc.c equivalents)."""

import numpy as np
import jax.numpy as jnp

from ka9q_sdr_tpu.ops import nco as N


def test_blockwise_matches_single_block():
    st = N.set_osc(N.osc_init(), 0.1234567, 0.0)
    st1, big = N.osc_block(st, 4096)
    st2 = st
    chunks = []
    for _ in range(8):
        st2, c = N.osc_block(st2, 512)
        chunks.append(np.asarray(c))
    np.testing.assert_allclose(np.concatenate(chunks), np.asarray(big), atol=1e-5)
    assert int(st1.phase) == int(st2.phase)


def test_tone_purity():
    """Spurs from the fixed-point phase representation must sit far below
    the -80 dBFS PCM parity budget."""
    import scipy.signal

    f = 0.05718290398
    st = N.set_osc(N.osc_init(), f)
    _, x = N.osc_block(st, 1 << 16)
    win = scipy.signal.windows.blackmanharris(1 << 16)  # -92 dB sidelobes
    spec = np.fft.fft(np.asarray(x) * win)
    p = np.abs(spec) ** 2
    peak = np.argmax(p)
    mask = np.ones_like(p, bool)
    mask[max(0, peak - 16) : peak + 16] = False
    spur_db = 10 * np.log10(np.max(p[mask]) / p[peak])
    assert spur_db < -85


def test_frequency_accuracy():
    f = -0.2101001
    st = N.set_osc(N.osc_init(), f)
    _, x = N.osc_block(st, 1 << 14)
    x = np.asarray(x)
    # measured frequency via phase slope
    dphi = np.angle(x[1:] * np.conj(x[:-1])) / (2 * np.pi)
    assert abs(np.mean(dphi) - (f % 1.0 + (-1 if f % 1.0 > 0.5 else 0))) < 1e-7


def test_retune_keeps_phase():
    st = N.set_osc(N.osc_init(), 0.01)
    st, a = N.osc_block(st, 100)
    st = N.set_osc(st, 0.02)  # retune: no phase jump (osc.c:24-27)
    _, b = N.osc_block(st, 1)
    # first sample after retune continues from the accumulated phase
    expected_phase = (0.01 * 100) % 1.0
    got = np.angle(np.asarray(b)[0]) / (2 * np.pi) % 1.0
    assert abs(got - expected_phase) < 1e-6


def test_sweep_quadratic_phase():
    f, r = 0.01, 1e-9
    st = N.set_osc(N.osc_init(), f, r)
    _, x = N.osc_block(st, 8192)
    n = np.arange(8192, dtype=np.float64)
    expect = np.exp(2j * np.pi * (f * n + r * n * (n - 1) / 2))
    np.testing.assert_allclose(np.asarray(x), expect, atol=1e-4)


def test_advance_matches_generate():
    st = N.set_osc(N.osc_init(), 0.037, 1e-10)
    st_a = N.osc_advance(st, 3000)
    st_b, _ = N.osc_block(st, 3000)
    assert int(st_a.phase) == int(st_b.phase)
    assert int(st_a.freq) == int(st_b.freq)


def test_nco_mix_shape_and_energy():
    st = N.set_osc(N.osc_init(), 0.1)
    x = jnp.ones(256, jnp.complex64)
    _, y = N.nco_mix(st, x)
    np.testing.assert_allclose(np.abs(np.asarray(y)), 1.0, atol=1e-6)


def test_split_double_near_integer_residual():
    """f within 2^-33 below an integer (tiny negative f, e.g. Doppler
    crossing zero) must yield a TINY residual, not ~1.0 (regression:
    the residual was computed from the already-wrapped word)."""
    hi, resid = N.split_double(-1e-12)
    assert hi == 0
    assert abs(resid) < 2**-33


def test_traced_retune_multicycle_fold_exact():
    """set_osc_traced keeps the whole PLL frequency in the float residual,
    so osc_advance folds MANY cycles per block; whole cycles must drop
    out exactly (regression: round(extra*2^32) saturated int32 at
    |extra| >= 0.5, jumping the LO phase ~0.5 cycles per block — the
    PLL could not pull in offsets beyond ~25 Hz)."""
    # 100 Hz at 12 kHz, 240-sample blocks: 2.0 cycles per block
    st = N.set_osc_traced(N.osc_init(), jnp.float32(100.0 / 12000.0))
    for _ in range(5):
        st = N.osc_advance(st, 240)
    ph = (float(np.asarray(st.phase)) / 2**32
          + float(np.asarray(st.phase_resid))) % 1.0
    assert min(ph, 1.0 - ph) < 1e-4


def test_traced_block_phase_continuity():
    """Two osc_block calls must be phase-continuous with one long ramp
    even when each block spans several cycles of a traced frequency."""
    f = jnp.float32(0.0123)
    st = N.set_osc_traced(N.osc_init(), f)
    _, a = N.osc_block(st, 512)
    st2 = N.osc_advance(st, 512)
    _, b = N.osc_block(st2, 512)
    got = np.concatenate([np.asarray(a), np.asarray(b)])
    n = np.arange(1024, dtype=np.float64)
    expect = np.exp(2j * np.pi * float(f) * n)
    np.testing.assert_allclose(got, expect, atol=1e-3)
