"""EXPERIMENTAL (closed, r4): Pallas column-FFT kernels — built,
measured on the chip, and rejected.  The shipping big-FFT path is
`fftfilt.fft_mxu` (3-level MXU decomposition, 1.25-1.30x); this module
keeps the pallas kernels and the measurements so no future round
re-derives them.  Full story: ARCHITECTURE.md §6b.

What was measured (compiled on v5e, slope method, (4096,4096) f32
planes = 128 MB working set):

- true Stockham (this file's make_fft_cols): 4.16 ms (65 GB/s).  The
  s<8 sublane-granular stack-interleaves alone cost ~3 ms — the r3
  "butterflies fully hidden under 437 GB/s slab streaming" microbench
  did register-resident elementwise rounds, which do NOT model the
  cross-row movement an FFT needs.
- DIF formulation (contiguous-half butterflies, 3-stage pltpu.roll
  tail, bit-reversed output): 1.67 ms (161 GB/s).
- leveled DIF (3-4 radix-2 stages fused per materialisation via the
  radix-8 register-renaming identity): 1.47 ms (183 GB/s) — 1.7x over
  XLA's own column FFT (2.46 ms), but the full four-step composition
  (c2p + 2 passes + inter-pass twiddle + 2 perm/transpose fixups,
  each measured) budgets to 22-24 ms at 2^26 = parity with XLA's
  fourstep.  Not worth the Mosaic surface.
- inter-pass twiddle costs +1.0 ms/2^24 in-kernel whether by full
  sincos or by phase recurrence from persistent VMEM scratch (the
  apply is bandwidth-bound, not transcendental-bound); an in-kernel
  einsum radix-8 tail blows the register allocator (163 MB of spills).

Operational traps for anyone reopening this:
- v5e VMEM is 128 MB; CW=256 blocks fit at Q=4096, CW=128 at Q=8192.
- `broadcasted_iota` must be integer dtype on TPU (cast to f32 after).
- `pltpu.roll` requires non-negative shifts (use (shift % Q)).
- pallas kernels cannot capture jnp array constants — build small
  matrices from iota math inside the kernel.
- Through the remote tunnel, kill -9 of a mid-compile client wedges
  the tunnel for ~40 min — iterate with self-terminating scripts.

The interpret-mode test in tests/test_fftfilt.py keeps the recurrence
correct.
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
