"""Neural CDE vector fields.

Capability parity with the reference zoo (/root/reference/src/ncde/
vector_fields/): the shared H->HH MLP trunk with per-kind output heads —
original (base.py:95-104), minimal/GRU gating (gating.py:7-61), and the
sparse/low-rank variants (sparsity.py:8-55; present-but-unregistered in the
reference, first-class here).

Functional design: a frozen config dataclass with ``init(key) -> params``
and ``apply(params, t, h)``.  ``apply`` returns the (..., H, I) field
matrix for ``vector_field_type='matmul'`` and (..., H) otherwise, i.e. the
reshape of the reference's ``BaseVectorField.forward`` (base.py:83-92) is
built in.  NFE accounting lives in the solver (``return_stats``), not in
mutable module state.

TPU notes: the trunk and heads are dense matmuls sized (B, H)x(H, HH) and
(B, HH)x(HH, H*I) — MXU-friendly; the sparse variant is a *masked dense*
matmul (a dense MXU matmul with a static 0/1 mask folded into the weight)
rather than the reference's sparse-CUDA ``sparselinear`` kernels, which at
these sizes would waste the systolic array.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp

from online_neural_cdes_tpu.utils.params import (
    linear_apply,
    linear_init,
    mlp_apply,
    mlp_init,
)

__all__ = ["VectorField", "VECTOR_FIELDS"]

VECTOR_FIELDS = ("original", "gru", "minimal", "sparse", "low-rank")


@dataclasses.dataclass(frozen=True)
class VectorField:
    """Config for f_theta: hidden state -> vector field value."""

    input_dim: int
    hidden_dim: int
    hidden_hidden_dim: int = 15
    num_layers: int = 1
    sparsity: Optional[float] = None
    vector_field_type: str = "matmul"
    kind: str = "original"

    def __post_init__(self):
        if self.kind not in VECTOR_FIELDS:
            raise ValueError(
                f"unknown vector field {self.kind!r}; one of "
                f"{sorted(VECTOR_FIELDS)}"
            )
        if self.vector_field_type not in ("matmul", "evaluate", "derivative"):
            raise ValueError(
                f"unknown vector_field_type {self.vector_field_type!r}; "
                "one of (matmul, evaluate, derivative)"
            )
        if self.kind in ("sparse", "low-rank"):
            if self.sparsity is None:
                raise ValueError(
                    f"vector field {self.kind!r} requires sparsity= "
                    "(reference: 'sparse methods must have a sparsity!')"
                )
            assert self.vector_field_type == "matmul"
        if self.kind in ("gru", "minimal"):
            assert self.sparsity is None, "sparsity not implemented for gated methods"

    @property
    def matmul(self) -> bool:
        return self.vector_field_type == "matmul"

    @property
    def initial_dim(self) -> int:
        return self.hidden_dim if self.matmul else self.hidden_dim + self.input_dim

    @property
    def output_dim(self) -> int:
        return self.hidden_dim * self.input_dim if self.matmul else self.hidden_dim

    @property
    def rank(self) -> int:
        return int(math.ceil(self.input_dim * (1.0 - self.sparsity)))

    def trunk_dims(self):
        return [self.initial_dim] + [self.hidden_hidden_dim] * max(self.num_layers, 1)

    def init(self, key: jax.Array, dtype=jnp.float32) -> dict:
        k_trunk, k1, k2, k3 = jax.random.split(key, 4)
        params = {"trunk": mlp_init(k_trunk, self.trunk_dims(), dtype)}
        hh, out = self.hidden_hidden_dim, self.output_dim
        if self.kind == "original":
            params["out"] = linear_init(k1, hh, out, dtype)
        elif self.kind == "minimal":
            params["sig"] = linear_init(k1, hh, out, dtype)
            params["tanh"] = linear_init(k2, hh, out, dtype)
        elif self.kind == "gru":
            params["reset"] = linear_init(k1, self.initial_dim, self.initial_dim, dtype)
            params["sig"] = linear_init(k2, hh, out, dtype)
            params["tanh"] = linear_init(k3, hh, out, dtype)
        elif self.kind == "sparse":
            params["out"] = linear_init(k1, hh, out, dtype)
            # Static connectivity mask with the requested density, the
            # masked-dense analogue of sparselinear (sparsity.py:20-27).
            mask = (
                jax.random.uniform(k2, (hh, out)) >= self.sparsity
            ).astype(dtype)
            params["mask"] = mask
        elif self.kind == "low-rank":
            params["m_h"] = linear_init(k1, hh, self.hidden_dim * self.rank, dtype)
            params["m_o"] = linear_init(k2, hh, self.rank * self.input_dim, dtype)
        return params

    def _trunk(self, params, h):
        # ReLU after *every* trunk layer, including the last (base.py:63-69).
        return mlp_apply(params["trunk"], h, final_activation=jax.nn.relu)

    def _head(self, params, h):
        if self.kind == "original":
            return jnp.tanh(linear_apply(params["out"], self._trunk(params, h)))
        if self.kind == "minimal":
            hh = self._trunk(params, h)
            return jax.nn.sigmoid(linear_apply(params["sig"], hh)) * jnp.tanh(
                linear_apply(params["tanh"], hh)
            )
        if self.kind == "gru":
            inner = self._trunk(params, h)
            reset = self._trunk(
                params, jax.nn.sigmoid(linear_apply(params["reset"], h)) * h
            )
            return jax.nn.sigmoid(linear_apply(params["sig"], inner)) * jnp.tanh(
                linear_apply(params["tanh"], reset)
            )
        if self.kind == "sparse":
            hh = self._trunk(params, h)
            p = params["out"]
            mask = jax.lax.stop_gradient(params["mask"])
            return jnp.tanh(hh @ (p["w"] * mask) + p["b"])
        if self.kind == "low-rank":
            hh = self._trunk(params, h)
            m_h = linear_apply(params["m_h"], hh).reshape(
                hh.shape[:-1] + (self.hidden_dim, self.rank)
            )
            m_o = linear_apply(params["m_o"], hh).reshape(
                hh.shape[:-1] + (self.rank, self.input_dim)
            )
            return jnp.tanh(m_h @ m_o)
        raise ValueError(self.kind)

    def apply(self, params: dict, t, h: jax.Array) -> jax.Array:
        out = self._head(params, h)
        if self.matmul and self.kind != "low-rank":
            out = out.reshape(h.shape[:-1] + (self.hidden_dim, self.input_dim))
        return out
