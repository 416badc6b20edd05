"""Stacked Neural CDEs: dZ_1 = f_1(Z_1) dX, dZ_k = f_k(Z_k) dZ_{k-1}.

Capability parity with reference /root/reference/src/ncde/stacked.py:7-131:
a chain of NCDEs where each inner model linearly interpolates the previous
hidden path (a dense path *is* its own linear-interpolation coefficients),
statics optionally fed to every layer, final linear only on the last."""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from online_neural_cdes_tpu.models.ncde import NeuralCDE

__all__ = ["StackedNeuralCDE"]


@dataclasses.dataclass(frozen=True)
class StackedNeuralCDE:
    input_dim: int
    hidden_dims: tuple  # one entry per stacked NCDE
    output_dim: int
    hidden_hidden_dim: int = 15
    static_dim: Optional[int] = None
    adjoint: bool = True
    return_sequences: bool = False
    static_in_all_layers: bool = False

    def __post_init__(self):
        assert isinstance(self.hidden_dims, (tuple, list)) and len(self.hidden_dims) > 0

    def _layer(self, i: int) -> NeuralCDE:
        last = i == len(self.hidden_dims) - 1
        in_dim = self.input_dim if i == 0 else self.hidden_dims[i - 1]
        static = self.static_dim if (i == 0 or self.static_in_all_layers) else None
        return NeuralCDE(
            input_dim=in_dim,
            hidden_dim=self.hidden_dims[i],
            output_dim=self.output_dim if last else self.hidden_dims[i],
            static_dim=static,
            hidden_hidden_dim=self.hidden_hidden_dim,
            num_layers=3,
            use_initial=True,
            interpolation="linear",
            adjoint=self.adjoint,
            apply_final_linear=last,
            return_sequences=(True if not last else self.return_sequences),
        )

    @property
    def layers(self) -> Sequence[NeuralCDE]:
        return [self._layer(i) for i in range(len(self.hidden_dims))]

    def init(self, key: jax.Array, dtype=jnp.float32):
        keys = jax.random.split(key, len(self.hidden_dims))
        return {f"ncde_{i}": l.init(k, dtype) for i, (l, k) in enumerate(zip(self.layers, keys))}

    def apply(self, params, inputs):
        layers = self.layers
        static = None
        if self.static_dim is not None:
            static, _ = inputs
        hidden = layers[0].apply(params["ncde_0"], inputs)
        for i, layer in enumerate(layers[1:], start=1):
            nxt = hidden
            if layer.static_dim is not None:
                nxt = (static, hidden)
            hidden = layer.apply(params[f"ncde_{i}"], nxt)
        return hidden
