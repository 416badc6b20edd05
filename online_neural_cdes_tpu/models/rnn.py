"""Recurrent cells and the plain GRU baseline.

The reference takes its plain GRU baseline from the external ``autots``
package (reference experiments/ingredients/setup_model.py:98-106) and uses
``torch.nn.GRUCell``/``RNNCell`` inside ODE-RNN (src/benchmarks/odernn.py:51).
Here both are first-class: torch-compatible cell math (gate layout r, z, n
with separate input/hidden biases) as pure functions, and a ``lax.scan``
sequence model.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from online_neural_cdes_tpu.utils.params import linear_apply, linear_init

__all__ = ["gru_cell_init", "gru_cell_apply", "rnn_cell_init", "rnn_cell_apply", "RNN"]


def gru_cell_init(key, input_dim, hidden_dim, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "ih": linear_init(k1, input_dim, 3 * hidden_dim, dtype),
        "hh": linear_init(k2, hidden_dim, 3 * hidden_dim, dtype),
    }


def gru_cell_apply(p, x, h):
    """torch.nn.GRUCell semantics: r, z gates then candidate n with the
    reset applied to the *hidden* projection."""
    hid = h.shape[-1]
    gi = linear_apply(p["ih"], x)
    gh = linear_apply(p["hh"], h)
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    del hid
    return (1.0 - z) * n + z * h


def rnn_cell_init(key, input_dim, hidden_dim, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "ih": linear_init(k1, input_dim, hidden_dim, dtype),
        "hh": linear_init(k2, hidden_dim, hidden_dim, dtype),
    }


def rnn_cell_apply(p, x, h):
    return jnp.tanh(linear_apply(p["ih"], x) + linear_apply(p["hh"], h))


@dataclasses.dataclass(frozen=True)
class RNN:
    """Plain GRU/RNN sequence baseline (the reference's autots RNN):
    scan a cell over (B, L, C), optional final linear, return last state or
    the full sequence."""

    input_dim: int
    hidden_dim: int
    output_dim: int
    gru: bool = True
    return_sequences: bool = False
    apply_final_linear: bool = True

    def init(self, key, dtype=jnp.float32):
        k_cell, k_final = jax.random.split(key)
        cell_init = gru_cell_init if self.gru else rnn_cell_init
        params = {"cell": cell_init(k_cell, self.input_dim, self.hidden_dim, dtype)}
        if self.apply_final_linear:
            params["final"] = linear_init(k_final, self.hidden_dim, self.output_dim, dtype)
        return params

    def apply(self, params, x):
        cell = gru_cell_apply if self.gru else rnn_cell_apply
        h0 = jnp.zeros(x.shape[:-2] + (self.hidden_dim,), x.dtype)
        xs = jnp.moveaxis(x, -2, 0)

        def step(h, xi):
            h = cell(params["cell"], xi, h)
            return h, h

        h_last, hs = jax.lax.scan(step, h0, xs)
        final = (
            (lambda v: linear_apply(params["final"], v))
            if self.apply_final_linear
            else (lambda v: v)
        )
        if self.return_sequences:
            return final(jnp.moveaxis(hs, 0, -2))
        return final(h_last)
