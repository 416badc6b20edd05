"""Minimal functional parameter utilities.

Models in this framework are *pure functions over parameter pytrees*:
hyperparameter dataclasses expose ``init(key) -> params`` and
``apply(params, inputs) -> outputs``.  This keeps vector fields trivially
usable inside ``lax.scan`` / ``lax.while_loop`` solver bodies and under
``jax.grad`` / ``custom_vjp`` / ``shard_map`` without any framework
entanglement.

Initialisation matches the reference's ``torch.nn.Linear`` default
(Kaiming-uniform weights, uniform bias in ±1/sqrt(fan_in) — the reference
relies on torch defaults throughout, e.g. /root/reference/src/ncde/
vector_fields/base.py:64-69), so trained-statistics parity is achievable.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp


def linear_init(key: jax.Array, in_dim: int, out_dim: int, dtype=jnp.float32) -> dict:
    """Parameters for a dense layer y = x @ W + b with torch-style init."""
    wkey, bkey = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_dim) if in_dim > 0 else 0.0
    # Kaiming-uniform with a=sqrt(5) reduces to U(-1/sqrt(fan_in), 1/sqrt(fan_in)).
    w = jax.random.uniform(wkey, (in_dim, out_dim), dtype, -bound, bound)
    b = jax.random.uniform(bkey, (out_dim,), dtype, -bound, bound)
    return {"w": w, "b": b}


def linear_apply(p: dict, x: jax.Array) -> jax.Array:
    return x @ p["w"] + p["b"]


def mlp_init(
    key: jax.Array,
    dims: Sequence[int],
    dtype=jnp.float32,
) -> list:
    """A stack of dense layers; activations are the caller's business."""
    keys = jax.random.split(key, max(len(dims) - 1, 1))
    return [
        linear_init(k, d_in, d_out, dtype)
        for k, d_in, d_out in zip(keys, dims[:-1], dims[1:])
    ]


def mlp_apply(layers: list, x: jax.Array, activation=jax.nn.relu, final_activation=None) -> jax.Array:
    for i, p in enumerate(layers):
        x = linear_apply(p, x)
        if i < len(layers) - 1:
            x = activation(x)
        elif final_activation is not None:
            x = final_activation(x)
    return x


def count_params(tree) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(tree))
