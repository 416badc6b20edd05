"""Masked / NaN-aware array primitives.

The reference handles missing data with per-scalar-path Python recursions
(/root/reference/modules/torchcde/torchcde/interpolation_linear.py:13-84,
misc.py:103-126).  Here every fill is a vectorised ``cummax``/gather or
``associative_scan`` formulation: one fused XLA program over the whole
(batch, length, channels) block, no Python loops, fully differentiable
w.r.t. the observed values.

Convention: series are time-major blocks ``(..., length, channels)`` and
missing entries are NaN, exactly like the reference.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _last_observed_index(mask: jax.Array) -> jax.Array:
    """For each position i, the largest j <= i with mask[..., j] True, else -1.

    mask: (..., L) boolean, time on the last axis.
    """
    length = mask.shape[-1]
    idx = jnp.arange(length, dtype=jnp.int32)
    idx = jnp.broadcast_to(idx, mask.shape)
    observed_idx = jnp.where(mask, idx, jnp.int32(-1))
    return jax.lax.cummax(observed_idx, axis=mask.ndim - 1)


def _next_observed_index(mask: jax.Array) -> jax.Array:
    """For each position i, the smallest j >= i with mask True, else L."""
    length = mask.shape[-1]
    rev_last = _last_observed_index(jnp.flip(mask, axis=-1))
    # (L-1) - (-1) == L, so the no-observation case falls out naturally.
    return (length - 1) - jnp.flip(rev_last, axis=-1)


@partial(jax.jit, static_argnames=("axis",))
def forward_fill(x: jax.Array, axis: int = -2) -> jax.Array:
    """Carry the last observed (non-NaN) value forward along ``axis``.

    Positions before the first observation stay NaN (matching
    ``torchcde.misc.forward_fill``, reference misc.py:103-126).
    """
    x = jnp.moveaxis(x, axis, -1)
    mask = ~jnp.isnan(x)
    last = _last_observed_index(mask)
    gathered = jnp.take_along_axis(x, jnp.maximum(last, 0), axis=-1)
    out = jnp.where(last >= 0, gathered, x)
    return jnp.moveaxis(out, -1, axis)


@partial(jax.jit, static_argnames=("axis",))
def backward_fill(x: jax.Array, axis: int = -2) -> jax.Array:
    """Mirror of :func:`forward_fill`: carry the next observation backward."""
    x = jnp.moveaxis(x, axis, -1)
    out = jnp.flip(forward_fill(jnp.flip(x, axis=-1), axis=-1), axis=-1)
    return jnp.moveaxis(out, -1, axis)


@partial(jax.jit, static_argnames=("axis",))
def linear_fill(x: jax.Array, t: jax.Array | None = None, axis: int = -2) -> jax.Array:
    """NaN infill used by linear interpolation coefficients.

    Interior NaNs are linearly interpolated between the neighbouring
    observations; NaNs before the first / after the last observation copy
    the nearest observation; an all-NaN series becomes zeros.  Semantics of
    reference interpolation_linear.py:13-84, vectorised.
    """
    x = jnp.moveaxis(x, axis, -1)
    length = x.shape[-1]
    if t is None:
        t = jnp.arange(length, dtype=x.dtype)
    t = jnp.broadcast_to(t, x.shape)

    mask = ~jnp.isnan(x)
    prev_i = _last_observed_index(mask)           # -1 where nothing before
    next_i = _next_observed_index(mask)           # L  where nothing after

    prev_ic = jnp.clip(prev_i, 0, length - 1)
    next_ic = jnp.clip(next_i, 0, length - 1)
    x_prev = jnp.take_along_axis(x, prev_ic, axis=-1)
    x_next = jnp.take_along_axis(x, next_ic, axis=-1)
    t_prev = jnp.take_along_axis(t, prev_ic, axis=-1)
    t_next = jnp.take_along_axis(t, next_ic, axis=-1)

    denom = t_next - t_prev
    ratio = (t - t_prev) / jnp.where(denom == 0, jnp.ones_like(denom), denom)
    interp = x_prev + ratio * (x_next - x_prev)

    has_prev = prev_i >= 0
    has_next = next_i < length
    filled = jnp.where(
        mask,
        x,
        jnp.where(
            has_prev & has_next,
            interp,
            jnp.where(has_prev, x_prev, x_next),
        ),
    )
    all_nan = ~jnp.any(mask, axis=-1, keepdims=True)
    filled = jnp.where(all_nan, jnp.zeros_like(filled), filled)
    return jnp.moveaxis(filled, -1, axis)


@jax.jit
def tridiagonal_solve(b: jax.Array, a_upper: jax.Array, a_diagonal: jax.Array,
                      a_lower: jax.Array) -> jax.Array:
    """Thomas-algorithm solve of a tridiagonal system, batched over leading dims.

    Replaces the reference's sequential per-channel Python loop
    (torchcde/misc.py:13-67, self-described as "isn't super fast") with a
    single ``lax.scan`` over the band shared by the whole batch: the scan
    carries (length,)-indexed rows while every batch/channel solves in
    lockstep on the VPU.

    Shapes: ``b``, ``a_diagonal``: (..., N); ``a_upper``, ``a_lower``: (..., N-1).
    """
    n = b.shape[-1]
    if n == 1:
        return b / a_diagonal

    # Move time to the front so scan slices are contiguous batches.
    bT = jnp.moveaxis(b, -1, 0)
    dT = jnp.moveaxis(a_diagonal, -1, 0)
    uT = jnp.moveaxis(a_upper, -1, 0)
    lT = jnp.moveaxis(a_lower, -1, 0)

    def fwd(carry, inp):
        c_prev, d_prev = carry
        lower, diag, upper, rhs = inp
        denom = diag - lower * c_prev
        c = upper / denom
        d = (rhs - lower * d_prev) / denom
        return (c, d), (c, d)

    c0 = uT[0] / dT[0]
    d0 = bT[0] / dT[0]
    upper_padded = jnp.concatenate([uT[1:], jnp.zeros_like(uT[:1])], axis=0)
    (_, _), (cs, ds) = jax.lax.scan(
        fwd, (c0, d0), (lT, dT[1:], upper_padded, bT[1:])
    )
    cs = jnp.concatenate([c0[None], cs], axis=0)
    ds = jnp.concatenate([d0[None], ds], axis=0)

    def bwd(x_next, inp):
        c, d = inp
        x = d - c * x_next
        return x, x

    _, xs = jax.lax.scan(bwd, ds[-1], (cs[:-1], ds[:-1]), reverse=True)
    xs = jnp.concatenate([xs, ds[-1][None]], axis=0)
    return jnp.moveaxis(xs, 0, -1)
