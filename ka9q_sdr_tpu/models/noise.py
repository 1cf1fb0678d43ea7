"""Noise spectral density estimation from the master filter spectrum.

Equivalent of compute_n0 (radio.c:383-425): average the power of all master
FFT bins outside the demodulator's passband, then re-average excluding bins
more than 3 dB above the first average (to reject signals).  Runs entirely
on the VPU — two masked reductions over the N-bin spectrum.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["passband_mask", "compute_n0"]


def passband_mask(N: int, samprate: float, low: float, high: float) -> np.ndarray:
    """Boolean mask of master FFT bins inside [low, high] Hz
    (radio.c:404-412).  Bin n maps to f = n*fs/N for n <= N/2 and
    (n-N)*fs/N above.  Host-side; depends only on tuning config."""
    n = np.arange(N)
    f = np.where(n <= N // 2, n, n - N) * (samprate / N)
    return (f >= low) & (f <= high)


def compute_n0(
    fdomain: jax.Array, in_passband: jax.Array, samprate: float
) -> jax.Array:
    """Noise power per Hz normalised to 0 dBFS (radio.c:383-425).

    `fdomain` is the master filter's N-bin spectrum; `in_passband` the mask
    from passband_mask.  Two fixed iterations: the first averages all
    out-of-passband bins (avg = inf admits everything), the second drops
    bins > 3 dB (2x power) above the first average.
    """
    ps = jnp.real(fdomain) ** 2 + jnp.imag(fdomain) ** 2
    N = ps.shape[-1]
    keep_base = ~in_passband
    avg = jnp.float32(jnp.inf)
    for _ in range(2):
        keep = keep_base & (ps < avg * 2.0)
        cnt = jnp.maximum(jnp.sum(keep, axis=-1), 1)
        avg = jnp.sum(jnp.where(keep, ps, 0.0), axis=-1) / cnt
    return avg / jnp.float32(2.0 * N * samprate)
