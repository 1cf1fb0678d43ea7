"""EXPERIMENTAL: Pallas column-Stockham FFT — the measured r4 route to a
~2x master FFT (not yet wired into fftfilt; see ARCHITECTURE.md §6b).

Why this shape wins where every other Pallas FFT formulation lost (all
measured on the chip, r3):

- The ONLY cheap data movements in a Mosaic kernel are row-granular:
  leading-axis reshapes/slices/stacks of a (rows, lanes) block.  Lane
  shuffles, transposes and sub-128 lane slices all measured 4-20x off
  bandwidth (ARCHITECTURE §6b "Pallas kernels").
- A Stockham radix-2 FFT *along the row axis* uses nothing else: each
  stage is two leading-axis slices, a complex butterfly, a broadcast
  twiddle (function of the row index only), and a stack — all
  row-granular, auto-sorting, no bit-reversal anywhere.
- Column-slab streaming of a (4096, 4096) f32 matrix measured
  **436.6 GB/s** through a pallas kernel, and 12 in-VMEM butterfly
  rounds on the slab were FULLY HIDDEN under that streaming (the +12
  rounds variant measured the same as the bare copy).
- Twiddle angles p/n are exact dyadic rationals for power-of-two n, so
  in-kernel sincos is full f32 accuracy (verified: rel err 2.5e-7 at
  Q=256 in interpret mode) — no tables, no extra HBM traffic.

The big-FFT composition this enables (the r4 task): a 2^24-2^26 master
FFT as four-step with BOTH passes as this kernel — pass 2 reads
column-slabs of the transposed view directly through its BlockSpec
index_map (strided 2 KB row segments, measured at the 436 GB/s above),
so there are NO separate transpose passes; the inter-pass twiddle
W^(n1*k2) fuses into pass 1's output (outer-product phase, integer-mod
reduced like fft_fourstep's).  Expected: ~2 passes x ~2.3 ms = ~10-12 ms
at 2^26 vs the current 22.6 ms fourstep — the master FFT is 54% of the
flagship block.

Known constraints (hit in r3):
- v5e VMEM is 128 MB and the naively-unrolled 12-stage kernel at
  CW=512 (8 MB/plane blocks) overflowed it (136 MB "internal scratch");
  CW=256 is the starting point, or wrap stages in a fori_loop to force
  buffer reuse.
- `broadcasted_iota` must be integer dtype on TPU (cast to f32 after).
- Through the remote tunnel, kill -9 of a mid-compile client wedges the
  tunnel for ~40 min — iterate on this kernel with patience and
  `--blocks`-style self-termination, never external kills.

The interpret-mode test in tests/test_fftfilt.py keeps the recurrence
correct until the TPU wiring lands.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["make_fft_cols", "stockham_rows_np"]


def stockham_rows_np(x: np.ndarray) -> np.ndarray:
    """Reference recurrence (numpy): FFT over axis 0 of (Q, W), radix-2
    autosorting Stockham.  Exact vs np.fft.fft(axis=0)."""
    Q, W = x.shape
    y = x
    n, s = Q, 1
    while n > 1:
        m = n // 2
        v = y.reshape(n, s * W)
        a, b = v[:m], v[m:]
        w = np.exp(-2j * np.pi * np.arange(m) / n)[:, None]
        y = np.stack([a + b, (a - b) * w], axis=1).reshape(Q, W)
        n, s = m, s * 2
    return y


def make_fft_cols(Q: int, P: int, CW: int = 256, interpret: bool = True):
    """Build the pallas column-Stockham kernel: FFT along axis 0 of
    (Q, P) float32 re/im planes, gridded over P//CW column slabs.

    interpret=True (the default) runs it as plain JAX — correct on any
    backend; the compiled TPU path is the r4 integration task."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    q = Q.bit_length() - 1
    if (1 << q) != Q:
        raise ValueError(f"Q={Q} not a power of two")
    if P % CW:
        raise ValueError(f"P={P} not a multiple of CW={CW}")

    def kernel(xr_ref, xi_ref, or_ref, oi_ref):
        yr = xr_ref[:]
        yi = xi_ref[:]
        n, s = Q, 1
        for _ in range(q):
            m = n // 2
            vr = yr.reshape(n, s * CW)
            vi = yi.reshape(n, s * CW)
            ar, br = vr[:m], vr[m:]
            ai, bi = vi[:m], vi[m:]
            p = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
            ang = jnp.float32(-2.0 * np.pi / n) * p.astype(jnp.float32)
            wr, wi = jnp.cos(ang), jnp.sin(ang)
            tr, ti = ar - br, ai - bi
            yr = jnp.stack([ar + br, tr * wr - ti * wi], axis=1).reshape(Q, CW)
            yi = jnp.stack([ai + bi, tr * wi + ti * wr], axis=1).reshape(Q, CW)
            n, s = m, s * 2
        or_ref[:] = yr
        oi_ref[:] = yi

    spec = pl.BlockSpec((Q, CW), lambda i: (0, i), memory_space=pltpu.VMEM)

    @jax.jit
    def fft_cols(xr, xi):
        return pl.pallas_call(
            kernel,
            out_shape=(jax.ShapeDtypeStruct((Q, P), jnp.float32),) * 2,
            grid=(P // CW,),
            in_specs=[spec, spec],
            out_specs=(spec, spec),
            interpret=interpret,
            compiler_params=None if interpret else
                pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        )(xr, xi)

    return fft_cols
