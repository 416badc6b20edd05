"""Brownian-motion sign-prediction toy problem.

Semantics of the reference's standalone benchmark
(/root/reference/experiments/sim_bm_toy_example.py:66-137): standard
Brownian paths on [0, 1] with N knots, channels (time, value), binary label
"is the terminal value positive", repeated across time steps.  Generated
with JAX PRNG on device (the reference loops per path in numpy)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def brownian_motion_data(
    key: jax.Array,
    num_paths: int,
    n_points: int = 3,
    start: float = 0.0,
    end: float = 1.0,
    dtype=jnp.float32,
):
    """Returns (x, y): x (num_paths, n_points, 2) with channels (t, W_t);
    y (num_paths, n_points) repeated binary labels."""
    times = jnp.linspace(start, end, n_points, dtype=dtype)
    dt = (end - start) / (n_points - 1)
    increments = jax.random.normal(key, (num_paths, n_points - 1), dtype) * jnp.sqrt(
        jnp.asarray(dt, dtype)
    )
    bm = jnp.concatenate(
        [jnp.zeros((num_paths, 1), dtype), jnp.cumsum(increments, axis=1)], axis=1
    )
    x = jnp.stack([jnp.broadcast_to(times, bm.shape), bm], axis=-1)
    labels = (bm[:, -1] > 0).astype(dtype)
    y = jnp.broadcast_to(labels[:, None], bm.shape)
    return x, y
