"""Forward-fill: parallel replacement for "keep the last good sample" loops.

The FM demodulator's threshold extension (fm.c:128-144) is a per-sample
data-dependent recurrence in C: weak samples are blanked and replaced by
the last strong sample's output.  The recurrence is a *gated lag* — the
state at n is simply the value at the most recent index k <= n where the
gate was true.  That is computable in parallel: a cumulative max over
masked indices followed by a gather, which runs entirely on the VPU with
no sequential scan.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["forward_fill", "last_true_index"]


def last_true_index(mask: jax.Array) -> jax.Array:
    """For each position n (along the last axis), the largest k <= n with
    mask[k] true, or -1 if none."""
    n = mask.shape[-1]
    iota = jnp.arange(n, dtype=jnp.int32)
    masked = jnp.where(mask, iota, jnp.int32(-1))
    return jax.lax.cummax(masked, axis=mask.ndim - 1)


def forward_fill(values: jax.Array, mask: jax.Array, init: jax.Array) -> jax.Array:
    """out[n] = values[k] for the last k <= n with mask[k], else init.

    `values`/`mask` have shape (..., n); `init` broadcasts to (...,).
    """
    idx = last_true_index(mask)
    filled = jnp.take_along_axis(values, jnp.maximum(idx, 0), axis=-1)
    init_b = jnp.broadcast_to(jnp.asarray(init, values.dtype)[..., None], values.shape)
    return jnp.where(idx >= 0, filled, init_b)
