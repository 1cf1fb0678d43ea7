"""Forward-fill: parallel replacement for "keep the last good sample" loops.

The FM demodulator's threshold extension (fm.c:128-144) is a per-sample
data-dependent recurrence in C: weak samples are blanked and replaced by
the last strong sample's output.  The recurrence is a *gated lag* — the
state at n is simply the value at the most recent index k <= n where the
gate was true.  That is an associative "last valid wins" combine, so it
runs as a log-depth associative_scan of elementwise selects — pure VPU
work.  (An earlier cummax-index + take_along_axis formulation was 10x
slower on TPU: per-element gathers serialise; measured 10 ms -> <1 ms at
(1024, 960).)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["forward_fill", "forward_fill_multi", "last_true_index"]


def last_true_index(mask: jax.Array) -> jax.Array:
    """For each position n (along the last axis), the largest k <= n with
    mask[k] true, or -1 if none."""
    n = mask.shape[-1]
    iota = jnp.arange(n, dtype=jnp.int32)
    masked = jnp.where(mask, iota, jnp.int32(-1))
    return jax.lax.cummax(masked, axis=mask.ndim - 1)


def forward_fill_multi(values: tuple, mask: jax.Array, inits: tuple) -> tuple:
    """Forward-fill SEVERAL value arrays gated by one shared mask in a
    single associative scan: out_i[n] = values_i[k] for the last k <= n
    with mask[k], else inits_i.  Avoids repeating the log-depth scan when
    a demodulator fills multiple quantities off the same gate."""

    def combine(a, b):
        bm = b[-1]
        return tuple(
            jnp.where(bm, bv, av) for av, bv in zip(a[:-1], b[:-1])
        ) + (a[-1] | bm,)

    scanned = jax.lax.associative_scan(
        combine, tuple(values) + (mask,), axis=values[0].ndim - 1
    )
    filled, m = scanned[:-1], scanned[-1]
    outs = []
    for f, v, init in zip(filled, values, inits):
        init_b = jnp.broadcast_to(
            jnp.asarray(init, v.dtype)[..., None], v.shape
        )
        outs.append(jnp.where(m, f, init_b))
    return tuple(outs)


def forward_fill(values: jax.Array, mask: jax.Array, init: jax.Array) -> jax.Array:
    """out[n] = values[k] for the last k <= n with mask[k], else init.

    `values`/`mask` have shape (..., n); `init` broadcasts to (...,).
    """
    return forward_fill_multi((values,), mask, (init,))[0]
