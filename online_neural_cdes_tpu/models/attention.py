"""Attention Neural CDE and the sparsemax activation.

Capability parity with reference /root/reference/src/ncde/attention.py and
sparsemax.py (Martins & Astudillo):

1. encoder NCDE: dZ = f(Z) dX (sequence of hidden states)
2. attention NCDE run backwards over Z producing one weight per time step
3. sparsemax/softmax over time; keep states with weight > 1/length
4. a final NCDE over the kept states, then a linear output map

TPU-native difference: the reference's keep-step is *ragged* — it gathers
per-sample variable-length subsets on host, pads and forward-fills
(attention.py:100-118).  Here the kept states are compacted to the front
of the fixed-length axis with a stable argsort and the tail is filled with
the last kept state.  A constant path tail has dX = 0, so the final NCDE's
terminal state is identical to the reference's variable-length version —
with static shapes and no host round-trip.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from online_neural_cdes_tpu.models.ncde import NeuralCDE
from online_neural_cdes_tpu.utils.params import linear_apply, linear_init

__all__ = ["AttentionNeuralCDE", "sparsemax"]


def sparsemax(z: jax.Array, axis: int = -1) -> jax.Array:
    """Euclidean projection of z onto the probability simplex (sparse
    alternative to softmax; reference sparsemax.py:16-73).  Autodiff through
    the closed form reproduces the paper's Jacobian."""
    z = jnp.moveaxis(z, axis, -1)
    n = z.shape[-1]
    z = z - jax.lax.stop_gradient(jnp.max(z, axis=-1, keepdims=True))
    z_sorted = jnp.flip(jnp.sort(z, axis=-1), axis=-1)
    k_range = jnp.arange(1, n + 1, dtype=z.dtype)
    cumsum = jnp.cumsum(z_sorted, axis=-1)
    support = 1.0 + k_range * z_sorted > cumsum
    k = jnp.sum(support, axis=-1, keepdims=True).astype(z.dtype)
    tau_sum = jnp.sum(jnp.where(support, z_sorted, 0.0), axis=-1, keepdims=True)
    tau = (tau_sum - 1.0) / k
    out = jnp.maximum(z - tau, 0.0)
    return jnp.moveaxis(out, -1, axis)


def _compact_kept_states(hidden: jax.Array, keep: jax.Array) -> jax.Array:
    """Move kept time steps to the front (stable, order-preserving), fill
    the tail with the last kept state.  hidden: (B, L, H); keep: (B, L)."""
    length = hidden.shape[-2]
    order = jnp.argsort(~keep, axis=-1, stable=True)          # kept first
    compacted = jnp.take_along_axis(hidden, order[..., None], axis=-2)
    counts = jnp.sum(keep, axis=-1)                            # (B,)
    # Guard all-dropped: keep at least position 0.
    counts = jnp.maximum(counts, 1)
    idx = jnp.arange(length)
    pos = jnp.minimum(idx[None, :], counts[:, None] - 1)
    return jnp.take_along_axis(compacted, pos[..., None], axis=-2)


@dataclasses.dataclass(frozen=True)
class AttentionNeuralCDE:
    input_dim: int
    hidden_dim: int
    output_dim: int
    static_dim: Optional[int] = None
    adjoint: bool = True
    run_backwards: bool = True
    sparsemax: bool = False

    def _ncde(self, input_dim, output_dim, return_sequences=True) -> NeuralCDE:
        return NeuralCDE(
            input_dim=input_dim,
            hidden_dim=self.hidden_dim,
            output_dim=output_dim,
            static_dim=self.static_dim,
            use_initial=True,
            interpolation="linear",
            adjoint=self.adjoint,
            num_layers=3,
            apply_final_linear=True,
            return_sequences=return_sequences,
            return_filtered_rectilinear=False,
        )

    @property
    def encoder(self):
        return self._ncde(self.input_dim, self.hidden_dim)

    @property
    def attention(self):
        return self._ncde(self.hidden_dim, 1)

    @property
    def final(self):
        return self._ncde(self.hidden_dim, self.hidden_dim, return_sequences=False)

    def init(self, key: jax.Array, dtype=jnp.float32):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        return {
            "encoder": self.encoder.init(k1, dtype),
            "attention": self.attention.init(k2, dtype),
            "final": self.final.init(k3, dtype),
            "fc_output": linear_init(k4, self.hidden_dim, self.output_dim, dtype),
        }

    def _with_static(self, inputs, hidden):
        if self.static_dim is None:
            return hidden
        return (inputs[0], hidden)

    def apply(self, params, inputs):
        hidden = self.encoder.apply(params["encoder"], inputs)  # (B, L, H)

        att_in = hidden
        if self.run_backwards:
            att_in = jnp.flip(att_in, axis=-2)
        weights = self.attention.apply(
            params["attention"], self._with_static(inputs, att_in)
        )  # (B, L, 1)
        if self.run_backwards:
            weights = jnp.flip(weights, axis=-2)
        act = sparsemax if self.sparsemax else jax.nn.softmax
        weights = act(weights[..., 0], axis=-1)                 # (B, L)

        length = hidden.shape[-2]
        keep = weights > 1.0 / length
        reduced = _compact_kept_states(hidden, keep)

        out = self.final.apply(params["final"], self._with_static(inputs, reduced))
        return linear_apply(params["fc_output"], out)
