"""Is fft_mxu a win at N=2^24 (the 20 ms serving-path master)?

Slope-timed (CLAUDE.md rules): each run ends with a tiny fetch; the
per-iteration cost is (t_hi - t_lo)/(n_hi - n_lo).  Device-resident input.
Self-bounded: exits on its own, no external kill needed.
"""
import sys, time
import numpy as np

sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from ka9q_sdr_tpu.utils.runtime import configure_jax
from ka9q_sdr_tpu.ops.fftfilt import fft_mxu, fft_fourstep, _mxu_radices

configure_jax()
N = 1 << 24
print("radices for 2^24:", _mxu_radices(N), flush=True)

rng = np.random.default_rng(0)
zr = rng.standard_normal(N).astype(np.float32)
zi = rng.standard_normal(N).astype(np.float32)
# jit boundaries must be REAL-dtype on axon (CLAUDE.md): complex formed
# inside the program, (N, 2) float32 crosses the boundary
z = jax.device_put(np.stack([zr, zi], axis=-1))


def _c(x_r):
    return jax.lax.complex(x_r[..., 0], x_r[..., 1])


mono = jax.jit(lambda a: jnp.abs(jnp.fft.fft(_c(a))))
mxu = jax.jit(lambda a: jnp.abs(fft_mxu(_c(a))))
four = jax.jit(lambda a: jnp.abs(fft_fourstep(_c(a))))


def fetch(a):
    return np.asarray(a.ravel()[:2])


def slope(fn, lo=3, hi=12):
    fetch(fn(z))                      # warm
    t0 = time.perf_counter()
    for _ in range(lo):
        o = fn(z)
    fetch(o)
    t_lo = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(hi):
        o = fn(z)
    fetch(o)
    t_hi = time.perf_counter() - t0
    return (t_hi - t_lo) / (hi - lo)


# accuracy vs f64 reference on a decimated spot-check grid
ref = np.fft.fft((zr + 1j * zi).astype(np.complex128))
sc = np.abs(ref).max()
idx = np.arange(0, N, N // 4096)
# spot-check grid as a strided slice via reshape — 1-D gathers are
# UNIMPLEMENTED on the axon backend (measured r4), strided slices work
spot = jax.jit(lambda a: a.reshape(4096, -1)[:, 0])
for name, fn in [("mono", mono), ("mxu", mxu), ("four", four)]:
    out = fn(z)
    got = np.asarray(spot(out))
    err = np.abs(got - np.abs(ref[idx])).max() / sc
    t = slope(fn)
    print(f"{name}: {t*1e3:7.2f} ms   rel-err {err:.2e}", flush=True)
print("done", flush=True)
