"""ODE-RNN baseline (Latent-ODE style).

Capability parity with reference /root/reference/src/benchmarks/odernn.py:
per time step, evolve the hidden state with an ODE over the preceding gap,
then apply a GRU/RNN cell update with the observation.  The reference's
Python loop over length (odernn.py:77-83) is one ``lax.scan``; the inner
ODE solve reuses ``ops.solvers`` (fixed-grid solvers nest as a unit scan,
adaptive ones as a while_loop).

Reference indexing quirk replicated for numeric parity: its loop uses
``dts[i-1]`` at i=0, i.e. the *last* gap is applied before the first
observation (odernn.py:76-81).  With uniform times (the harness default,
odernn.py:65-66) this is invisible; set ``replicate_dt_quirk=False`` for
the mathematically intended zero-width first gap."""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from online_neural_cdes_tpu.models.rnn import (
    gru_cell_apply,
    gru_cell_init,
    rnn_cell_apply,
    rnn_cell_init,
)
from online_neural_cdes_tpu.ops.solvers import odeint
from online_neural_cdes_tpu.utils.params import (
    linear_apply,
    linear_init,
    mlp_apply,
    mlp_init,
)

__all__ = ["ODERNN"]


@dataclasses.dataclass(frozen=True)
class ODERNN:
    input_dim: int
    hidden_dim: int
    output_dim: int
    hidden_hidden_dim: int = 30
    num_layers: int = 1
    solver: str = "rk4"
    adjoint: bool = False
    gru: bool = True
    return_sequences: bool = False
    apply_final_linear: bool = True
    replicate_dt_quirk: bool = True

    def _ode_dims(self):
        # _ODERNNFunc (odernn.py:98-111): Linear(H->HH) [+ (ReLU, Linear)*]
        # then Tanh, Linear(HH->H).
        dims = [self.hidden_dim] + [self.hidden_hidden_dim] * max(self.num_layers, 1)
        return dims

    def init(self, key, dtype=jnp.float32):
        k_ode, k_out, k_cell, k_final = jax.random.split(key, 4)
        cell_init = gru_cell_init if self.gru else rnn_cell_init
        params = {
            "ode_net": mlp_init(k_ode, self._ode_dims(), dtype),
            "ode_out": linear_init(k_out, self.hidden_hidden_dim, self.hidden_dim, dtype),
            "cell": cell_init(k_cell, self.input_dim, self.hidden_dim, dtype),
        }
        if self.apply_final_linear:
            params["final"] = linear_init(k_final, self.hidden_dim, self.output_dim, dtype)
        return params

    def _ode_func(self, params):
        def f(t, h, _):
            inner = mlp_apply(params["ode_net"], h, final_activation=jnp.tanh)
            return linear_apply(params["ode_out"], inner)

        return f

    def apply(self, params, x, times: Optional[jax.Array] = None):
        """x: (B, L, C); times: (L,) defaulting to 0..L-1."""
        length = x.shape[-2]
        if times is None:
            times = jnp.arange(length, dtype=x.dtype)
        dts = times[1:] - times[:-1]
        if self.replicate_dt_quirk:
            # [dts[-1], dts[0], ..., dts[L-2]] — dts[i-1] with Python's -1
            # wraparound at i=0 (reference odernn.py:76-81).
            step_dts = jnp.concatenate([dts[-1:], dts])
        else:
            step_dts = jnp.concatenate([jnp.zeros_like(dts[:1]), dts])

        cell = gru_cell_apply if self.gru else rnn_cell_apply
        ode_f = self._ode_func(params)
        h0 = jnp.zeros(x.shape[:-2] + (self.hidden_dim,), x.dtype)
        xs = (jnp.moveaxis(x, -2, 0), step_dts)

        def step(h, inp):
            xi, dt = inp
            span = jnp.stack([jnp.zeros_like(dt), dt])
            h = odeint(ode_f, h, span, None, method=self.solver)[-1]
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
