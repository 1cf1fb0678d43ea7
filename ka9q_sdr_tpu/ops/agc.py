"""Hang AGC — the reference's per-sample gain recurrence.

Semantics follow am.c:26-30,64-74 and linear.c:33-39,269-280 exactly:

- If the current level would exceed headroom, clamp gain to headroom/level
  and start the hang timer (attack = instant clamp).
- While the hang timer runs, hold gain.
- Otherwise ramp gain up by `recovery_factor` per sample.

This is a genuinely sequential per-sample recurrence (the gain at sample n
depends on the clamp history); we run it as a `lax.scan` over the block,
with the carry batched over channels so a vmapped channel bank shares one
scan.  `agc_block` — the faithful per-sample version — is the default
everywhere, including the multichannel bank and the bench (measured: the
scan costs ~nothing at 1024 channels, see CLAUDE.md).  A block-rate
approximation `agc_block_coarse` (gain updated once per block from the
block peak) is kept for experiments but is not wired into any model.

The AGC rates are specified in dB/s in the mode table (modes.c:89-91) and
converted with dB2voltage(rate * samptime) (am.c:27, linear.c:34).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["AGCParams", "AGCState", "agc_init", "agc_block", "agc_block_coarse"]


def db2voltage(db: float) -> float:
    """dB to voltage ratio (misc.h's dB2voltage)."""
    return float(np.power(10.0, db / 20.0))


class AGCParams(NamedTuple):
    """Static AGC configuration derived from the mode table."""

    headroom: float          # target peak level (voltage ratio)
    recovery_factor: float   # per-sample gain ramp (voltage ratio > 1)
    hangmax: int             # samples to hold after a clamp

    @classmethod
    def from_mode(
        cls, headroom_db: float, recovery_rate_db_s: float, hangtime_s: float,
        samptime: float,
    ) -> "AGCParams":
        """Mirror the derivations of am.c:27-29 / linear.c:34-38."""
        return cls(
            headroom=db2voltage(headroom_db),
            recovery_factor=db2voltage(recovery_rate_db_s * samptime),
            hangmax=int(hangtime_s / samptime),
        )


class AGCState(NamedTuple):
    gain: jax.Array       # float32, current voltage gain
    hangcount: jax.Array  # int32, remaining hang samples


def agc_init(initial_gain_db: float = 80.0, batch_shape=()) -> AGCState:
    """Initial gain is 80 dB for AM (am.c:30), 100 dB for linear
    (linear.c:39)."""
    return AGCState(
        gain=jnp.full(batch_shape, db2voltage(initial_gain_db), jnp.float32),
        hangcount=jnp.zeros(batch_shape, jnp.int32),
    )


def agc_block(
    state: AGCState, level: jax.Array, params: AGCParams
) -> tuple[AGCState, jax.Array]:
    """Per-sample hang AGC over a block.

    `level` is the control signal per sample (the envelope DC estimate for
    AM, the instantaneous amplitude for linear), shape (..., n).  Returns
    (new_state, gain_per_sample) where gain[n] is the post-update gain
    applied to sample n (matching the C ordering).
    """
    headroom = jnp.float32(params.headroom)
    recovery = jnp.float32(params.recovery_factor)
    hangmax = jnp.int32(params.hangmax)

    def step(carry, lev):
        gain, hang = carry
        clamp_gain = headroom / lev
        over = lev * gain > headroom
        bad = jnp.isnan(gain)
        new_gain = jnp.where(
            bad | over,
            clamp_gain,
            jnp.where(hang > 0, gain, gain * recovery),
        )
        new_hang = jnp.where(
            over & ~bad,
            hangmax,
            jnp.maximum(hang - 1, 0),
        )
        return (new_gain, new_hang), new_gain

    # scan over the sample axis; batch axes ride along in the carry
    lev_t = jnp.moveaxis(level, -1, 0)
    (gain, hang), gains_t = jax.lax.scan(step, (state.gain, state.hangcount), lev_t)
    return AGCState(gain, hang), jnp.moveaxis(gains_t, 0, -1)


def agc_block_coarse(
    state: AGCState, level: jax.Array, params: AGCParams
) -> tuple[AGCState, jax.Array]:
    """Block-rate AGC approximation for the wideband channel bank: one gain
    update per block driven by the block peak level.  Attack is still
    instant (clamp on the peak); recovery/hang advance by a whole block.
    Faithful to the envelope dynamics at 20 ms granularity; the parity
    tolerance for this path is defined per-signal, not bit-exact
    (SURVEY.md §7 "Hard parts")."""
    n = level.shape[-1]
    peak = jnp.max(level, axis=-1)
    headroom = jnp.float32(params.headroom)
    recovery_blk = jnp.float32(params.recovery_factor) ** n
    over = peak * state.gain > headroom
    bad = jnp.isnan(state.gain)
    new_gain = jnp.where(
        bad | over,
        headroom / peak,
        jnp.where(state.hangcount > 0, state.gain, state.gain * recovery_blk),
    )
    new_hang = jnp.where(
        over & ~bad,
        jnp.int32(params.hangmax),
        jnp.maximum(state.hangcount - n, 0),
    )
    gains = jnp.broadcast_to(new_gain[..., None], level.shape)
    return AGCState(new_gain, new_hang), gains
