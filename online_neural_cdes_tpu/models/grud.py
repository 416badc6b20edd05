"""GRU-D baseline and the gru-variant data preparation.

Capability parity with reference /root/reference/src/benchmarks/grud.py
("Recurrent Neural Networks for Multivariate Time Series with Missing
Values"): exponential input/hidden decays gamma_x (diagonal — the
``FilterLinear`` identity mask, grud.py:143-183) and gamma_h, decay-based
imputation toward training-set feature means, and a GRU update whose gates
also see the observation mask.

``prepare_gru_variant_data`` builds the [N, 4, L, C] tensor (data,
last-observation, mask, delta) and slices the gru / gru-dt /
gru-intensity / gru-dt-intensity channel subsets (grud.py:213-281).  The
delta recursion (grud.py:186-210) is a ``lax.scan``; fills are the
vectorised masked ops from ``ops.fill``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from online_neural_cdes_tpu.ops.fill import forward_fill
from online_neural_cdes_tpu.utils.params import linear_apply, linear_init

__all__ = ["GRUD", "prepare_gru_variant_data", "time_since_last_observation",
           "GRU_VARIANTS"]

GRU_VARIANTS = ("gru", "gru-intensity", "gru-dt", "gru-dt-intensity", "gru-d")


def time_since_last_observation(controls: jax.Array):
    """delta[:, i, c] = time since channel c was last observed, and the
    observation mask (reference grud.py:186-210).  Channel 0 is time."""
    mask = (~jnp.isnan(controls)).astype(controls.dtype)
    times = jnp.broadcast_to(controls[..., :1], controls.shape)
    dts = times[:, 1:] - times[:, :-1]

    def step(prev_delta, inp):
        dt, prev_mask = inp
        delta = dt + prev_delta * (1.0 - prev_mask)
        return delta, delta

    zeros0 = jnp.zeros_like(mask[:, 0])
    _, deltas = jax.lax.scan(
        step, zeros0, (jnp.moveaxis(dts, 1, 0), jnp.moveaxis(mask[:, :-1], 1, 0))
    )
    deltas = jnp.concatenate([zeros0[:, None], jnp.moveaxis(deltas, 0, 1)], axis=1)
    return deltas, mask


def prepare_gru_variant_data(controls: jax.Array, variant: str,
                             feature_means: jax.Array | None = None) -> jax.Array:
    """Returns [N, 4, L, C] for gru-d, else the variant's channel-concat
    [N, L, C*k] (reference grud.py:213-281)."""
    if variant not in GRU_VARIANTS:
        raise ValueError(
            f"variant={variant!r} not implemented; one of {GRU_VARIANTS}"
        )
    controls = jnp.asarray(controls)

    # Steps past the final time (NaN time channel) are zeroed after filling.
    end_mask = jnp.broadcast_to(jnp.isnan(controls[..., :1]), controls.shape)

    delta, mask = time_since_last_observation(controls)
    filled = forward_fill(controls, axis=-2)
    prev_value = filled

    if feature_means is not None:
        fm = jnp.broadcast_to(feature_means.reshape(1, 1, -1), controls.shape)
        fix = lambda a: jnp.where(end_mask, 0.0, jnp.where(jnp.isnan(a), fm, a))
        filled, prev_value, delta = fix(filled), fix(prev_value), fix(delta)

    stacked = jnp.stack([filled, prev_value, mask, delta], axis=1)  # (N,4,L,C)

    if variant == "gru-d":
        return stacked
    pick = {
        "gru": [0],
        "gru-intensity": [0, 2],
        "gru-dt": [0, 3],
        "gru-dt-intensity": [0, 2, 3],
    }[variant]
    out = jnp.concatenate([stacked[:, i] for i in pick], axis=-1)
    return jnp.where(jnp.isnan(out), 0.0, out)


def grud_cell_init(key, input_dim, hidden_dim, dtype=jnp.float32):
    ks = jax.random.split(key, 5)
    gate_in = 2 * input_dim + hidden_dim  # (x, h, mask)
    return {
        "z": linear_init(ks[0], gate_in, hidden_dim, dtype),
        "r": linear_init(ks[1], gate_in, hidden_dim, dtype),
        "h": linear_init(ks[2], gate_in, hidden_dim, dtype),
        # gamma_x is diagonal (FilterLinear with the identity mask).
        "gamma_x": {
            "w": jax.random.uniform(
                ks[3], (input_dim,), dtype, -1.0, 1.0
            ) / jnp.sqrt(jnp.asarray(input_dim, dtype)),
            "b": jnp.zeros((input_dim,), dtype),
        },
        "gamma_h": linear_init(ks[4], input_dim, hidden_dim, dtype),
    }


def grud_cell_apply(p, x, x_last, x_mean, h, mask, delta):
    """One GRU-D update (reference grud.py:116-140)."""
    decay_x = jnp.exp(-jnp.maximum(0.0, delta * p["gamma_x"]["w"] + p["gamma_x"]["b"]))
    decay_h = jnp.exp(-jnp.maximum(0.0, linear_apply(p["gamma_h"], delta)))
    x = mask * x + (1.0 - mask) * (decay_x * x_last + (1.0 - decay_x) * x_mean)
    h = decay_h * h
    combined = jnp.concatenate([x, h, mask], axis=-1)
    z = jax.nn.sigmoid(linear_apply(p["z"], combined))
    r = jax.nn.sigmoid(linear_apply(p["r"], combined))
    combined_r = jnp.concatenate([x, r * h, mask], axis=-1)
    h_tilde = jnp.tanh(linear_apply(p["h"], combined_r))
    return (1.0 - z) * h + z * h_tilde


@dataclasses.dataclass(frozen=True)
class GRUD:
    input_dim: int
    hidden_dim: int
    output_dim: int
    return_sequences: bool = False

    def init(self, key, dtype=jnp.float32):
        k_cell, k_final = jax.random.split(key)
        return {
            "cell": grud_cell_init(k_cell, self.input_dim, self.hidden_dim, dtype),
            "final": linear_init(k_final, self.hidden_dim, self.output_dim, dtype),
        }

    def apply(self, params, inputs, feature_means):
        """inputs: [N, 4, L, C] from prepare_gru_variant_data('gru-d');
        feature_means: (C,) training-set means (NaN -> 0)."""
        feature_means = jnp.where(jnp.isnan(feature_means), 0.0, feature_means)
        data, last_obs, mask, delta = (inputs[:, i] for i in range(4))
        h0 = jnp.zeros(data.shape[:1] + (self.hidden_dim,), data.dtype)
        xs = tuple(jnp.moveaxis(a, 1, 0) for a in (data, last_obs, mask, delta))

        def step(h, inp):
            xi, li, mi, di = inp
            h = grud_cell_apply(params["cell"], xi, li, feature_means, h, mi, di)
            return h, h

        h_last, hs = jax.lax.scan(step, h0, xs)
        if self.return_sequences:
            return linear_apply(params["final"], jnp.moveaxis(hs, 0, 1))
        return linear_apply(params["final"], h_last)
