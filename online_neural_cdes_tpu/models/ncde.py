"""The Neural CDE model.

Capability parity with reference /root/reference/src/ncde/ncde.py:34-243:
spline registry, vector-field registry, h0 from initial observation and/or
static features, solver presets (rk4: one step per knot; dopri5: bounded
min_step=0.5, atol=1e-5/rtol=1e-3 — ncde.py:129-134), return-sequences
with every-other filtering for rectilinear schemes (ncde.py:200-212).

Functional design: ``NeuralCDE`` is a frozen hyperparameter dataclass;
``init(key)`` makes the parameter pytree and ``apply(params, inputs)`` is a
pure jittable forward.  ``inputs`` is the precomputed interpolation
coefficient array — or a ``(static, coeffs)`` tuple when ``static_dim`` is
set — exactly the reference's calling convention.  Statistics (NFE — the
paper's efficiency metric) are surfaced with ``apply(..., return_stats=True)``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from online_neural_cdes_tpu.models.vector_fields import VectorField
from online_neural_cdes_tpu.ops import interpolation as interp
from online_neural_cdes_tpu.ops.cdeint import cdeint
from online_neural_cdes_tpu.utils.params import linear_apply, linear_init

__all__ = ["NeuralCDE", "SPLINES"]

SPLINES = (
    "cubic",
    "hermite",
    "linear",
    "rectilinear",
    "linear_cubic_smoothing",
    "linear_quintic_smoothing",
)


def make_spline(interpolation: str, coeffs: jax.Array, eps: Optional[float] = None):
    """Spline registry (reference ncde.py:12-23).  ``coeffs`` must come from
    the matching builder in ``ops.interpolation``."""
    if interpolation in ("linear", "rectilinear"):
        return interp.LinearInterpolation.create(coeffs)
    if interpolation in ("cubic", "hermite"):
        return interp.CubicSpline.create(coeffs)
    if interpolation == "linear_cubic_smoothing":
        return interp.SmoothLinearInterpolation.create(
            coeffs, gradient_matching_eps=eps, match_second_derivatives=False
        )
    if interpolation == "linear_quintic_smoothing":
        return interp.SmoothLinearInterpolation.create(
            coeffs, gradient_matching_eps=eps, match_second_derivatives=True
        )
    raise ValueError(f"Unrecognised interpolation scheme {interpolation}")


@dataclasses.dataclass(frozen=True)
class NeuralCDE:
    input_dim: int
    hidden_dim: int
    output_dim: int
    static_dim: Optional[int] = None
    hidden_hidden_dim: int = 15
    num_layers: int = 3
    use_initial: bool = True
    interpolation: str = "linear"
    interpolation_eps: Optional[float] = None
    sparsity: Optional[float] = None
    vector_field: str = "original"
    vector_field_type: str = "matmul"
    adjoint: bool = True
    # Backward-solve override for the fixed-grid adjoint (reference
    # adjoint_options["method"] semantics): e.g. "midpoint" halves the
    # backward's stage count at O(h^2) gradient order — a documented
    # speed-vs-gradient-accuracy knob for long production solves.
    adjoint_method: "str | None" = None
    solver: str = "rk4"
    return_sequences: bool = False
    apply_final_linear: bool = True
    return_filtered_rectilinear: bool = True
    # Control channel that carries time in rectilinear coefficients (the
    # ``rectilinear=<idx>`` argument of linear_interpolation_coeffs).  The
    # fused paired scan contracts only this channel on time-advance
    # intervals; it MUST match the builder or those intervals are silently
    # integrated against a zero-derivative channel.
    rectilinear_time_channel: int = 0
    # Use the fused Pallas trunk->head->contraction kernel on TPU for the
    # original/matmul field (ops/kernels.py); identical math elsewhere.
    fused: bool = True
    # Unroll factor for the interval scans (compile time vs step time).
    solver_unroll: int = 1

    def __post_init__(self):
        if self.interpolation not in SPLINES:
            raise ValueError(
                f"unknown interpolation {self.interpolation!r}; one of "
                f"{sorted(SPLINES)}"
            )
        from online_neural_cdes_tpu.ops import solvers as _solvers

        valid = (
            tuple(_solvers.FIXED_METHODS)
            + tuple(_solvers.ADAPTIVE_METHODS)
            + ("explicit_adams", "implicit_adams", "scipy_solver")
        )
        if self.solver not in valid:
            raise ValueError(
                f"unknown solver {self.solver!r}; one of {sorted(valid)}"
            )
        # scipy runs on host (not traceable): forward-only, eager.
        assert not (self.solver == "scipy_solver" and self.adjoint), (
            "scipy_solver is a host fallback: gradients cannot trace through "
            "it — construct with adjoint=False and do not differentiate."
        )

    @property
    def field(self) -> VectorField:
        return VectorField(
            input_dim=self.input_dim,
            hidden_dim=self.hidden_dim,
            hidden_hidden_dim=self.hidden_hidden_dim,
            num_layers=self.num_layers,
            sparsity=self.sparsity,
            vector_field_type=self.vector_field_type,
            kind=self.vector_field,
        )

    @property
    def initial_dim(self) -> int:
        dim = 0
        if self.use_initial:
            dim += self.input_dim
        if self.static_dim is not None:
            dim += self.static_dim
        return dim

    @property
    def solver_settings(self):
        """Reference presets, ncde.py:129-134 (rk4: one step per knot;
        adaptive: bounded min_step=0.5), generalised across the registry."""
        from online_neural_cdes_tpu.ops import solvers as _solvers

        if self.solver == "dopri5":
            # The paper's bounded-step online preset applies to dopri5 only
            # (reference ncde.py:132-134); other adaptive methods run with
            # plain tolerances.
            return dict(atol=1e-5, rtol=1e-3, options={"min_step": 0.5})
        if self.solver in _solvers.ADAPTIVE_METHODS:
            return dict(atol=1e-5, rtol=1e-3, options={})
        if self.solver in ("explicit_adams", "implicit_adams"):
            # One multistep step per knot interval, like rk4's step_size=1
            # on the unit knot grid.  Expressed as substeps (resolution-free)
            # because inside jit the knot grid is traced and a step_size
            # could not be resolved against it — critical for 2-point
            # interval solves, where the generic path's per-output-interval
            # resolution applies (cdeint pre-resolves there).
            return dict(atol=1e-5, rtol=1e-3, options={"step_size": 1})
        if self.solver == "scipy_solver":
            # Host fallback: eager forward only (not jittable / not
            # differentiable) — gated to adjoint=False in __post_init__.
            return dict(atol=1e-5, rtol=1e-3, options={})
        # rk4 preset 'step_size=1' (reference ncde.py:132-134) == one RK
        # step per unit-spaced knot interval == substeps=1 on the piece
        # scan; substeps is used directly because the knot grid is a tracer
        # under jit (step_size would be unresolvable there).
        return dict(
            atol=1e-5, rtol=1e-3,
            options={"substeps": 1, "unroll": self.solver_unroll},
        )

    def init(self, key: jax.Array, dtype=jnp.float32) -> dict:
        k_field, k_init, k_final = jax.random.split(key, 3)
        params = {"field": self.field.init(k_field, dtype)}
        if self.initial_dim > 0:
            params["initial"] = linear_init(
                k_init, self.initial_dim, self.hidden_dim, dtype
            )
        if self.apply_final_linear:
            params["final"] = linear_init(
                k_final, self.hidden_dim, self.output_dim, dtype
            )
        return params

    # -- forward pieces ---------------------------------------------------

    def _setup_h0(self, params, inputs):
        """h0 from initial observation and/or static features
        (reference ncde.py:170-198)."""
        if self.static_dim is None:
            coeffs = inputs
            static = None
        else:
            assert isinstance(inputs, (tuple, list)) and len(inputs) == 2, (
                "Inputs must be a 2-tuple of (static_data, temporal_data)"
            )
            static, coeffs = inputs
        spline = make_spline(self.interpolation, coeffs, self.interpolation_eps)
        x0 = spline.evaluate(spline.interval[0])
        if static is None:
            if self.use_initial:
                h0 = linear_apply(params["initial"], x0)
            else:
                h0 = jnp.zeros(coeffs.shape[:-2] + (self.hidden_dim,), coeffs.dtype)
        else:
            if self.use_initial:
                h0 = linear_apply(params["initial"], jnp.concatenate([static, x0], -1))
            else:
                h0 = linear_apply(params["initial"], static)
        return spline, h0

    def _make_outputs(self, params, hidden):
        """final linear + every-other filtering for rectilinear sequences
        (reference ncde.py:200-212)."""
        final = (
            (lambda h: linear_apply(params["final"], h))
            if self.apply_final_linear
            else (lambda h: h)
        )
        if self.return_sequences:
            outputs = final(hidden)
            if self.interpolation == "rectilinear" and self.return_filtered_rectilinear:
                outputs = outputs[..., ::2, :]
        else:
            outputs = final(hidden[..., -1, :])
        return outputs

    def make_solve_func(self, params: dict, h0: jax.Array):
        """The field function handed to the solver: ``(func, even_func,
        field_args, vf_type)``.  Routes through the fused
        trunk->head->contraction ``custom_vjp`` (+ Pallas where lane-aligned)
        when eligible, else the plain vector-field apply.  Shared by
        :meth:`apply` and the sequence-pipelined forward
        (``parallel.sequence.ncde_apply_pipelined``)."""
        field = self.field

        use_fused = (
            self.fused
            and self.vector_field == "original"
            and self.vector_field_type == "matmul"
            and h0.ndim == 2
        )
        if use_fused:
            from online_neural_cdes_tpu.ops.kernels import (
                fused_field_available,
                fused_matmul_field,
                pack_fused_params,
            )

            # Measured policy (TPU v5e, B=512, I=21, 1024-eval scan chains):
            # the fused XLA path with UNPADDED packing is fastest for
            # H % 128 != 0 (6.2 us/eval at H=64 vs 12.8 for a lane-padded
            # Pallas kernel and 9.8 for a slice-loop kernel — padding wastes
            # MXU+VPU work, unpadded reshapes relayout); at H % 128 == 0 the
            # Pallas kernel ties XLA (12.4 vs 12.7 us/eval at H=128).  The
            # fused *custom_vjp* — the actual win over the unfused field,
            # ~3x on backward — fires for EVERY shape; Pallas engages only
            # where lane alignment is native.
            use_pallas = (
                fused_field_available()
                and h0.shape[0] % 8 == 0
                and self.hidden_dim % 128 == 0
            )
            packed = pack_fused_params(
                params["field"], self.hidden_dim, self.input_dim,
                pad=use_pallas,
            )
            hp = packed["head_w"].shape[1] // self.input_dim

            def func(t, z, dx, fp):
                return fused_matmul_field(
                    fp["trunk"], fp["head_w"], fp["head_b"], z, dx,
                    self.hidden_dim, self.input_dim, use_pallas,
                )

            even_func = None
            if self.interpolation == "rectilinear":
                # Rectilinear time-advance intervals move only the time
                # channel of the control: contract against that channel's
                # head columns only (~1/input_dim of the head work; see
                # cdeint paired scan).  The packed head is contraction-major
                # (HH, I*Hp): channel k occupies columns [k*hp, (k+1)*hp).
                k = self.rectilinear_time_channel

                def even_func(t, z, dx, fp):
                    return fused_matmul_field(
                        fp["trunk"],
                        fp["head_w"][:, k * hp:(k + 1) * hp],
                        fp["head_b"][k * hp:(k + 1) * hp],
                        z, dx[..., k:k + 1], self.hidden_dim, 1, False,
                    )

            field_args = packed
            vf_type = "matmul_fused"
        else:
            even_func = None

            def func(t, z, field_params):
                return field.apply(field_params, t, z)

            field_args = params["field"]
            vf_type = self.vector_field_type
        return func, even_func, field_args, vf_type

    def apply(self, params: dict, inputs, return_stats: bool = False):
        spline, h0 = self._setup_h0(params, inputs)
        times = spline.grid_points if self.return_sequences else spline.interval
        settings = self.solver_settings
        if "step_size" in settings.get("options", {}):
            # Resolve grid-from-step_size against the STATIC shapes (knot
            # grids are unit-spaced by the builders' convention, and are
            # traced arrays under jit, so a value-based resolution is
            # impossible).  Per output interval: spacing = (L-1)/(n_out-1).
            n_knots = spline.grid_points.shape[0]
            spacing = (n_knots - 1) / max(times.shape[0] - 1, 1)
            step = settings["options"].pop("step_size")
            settings["options"]["substeps"] = max(
                1, int(-(-spacing // float(step)))
            )
        func, even_func, field_args, vf_type = self.make_solve_func(params, h0)

        adjoint_options = (
            {"method": self.adjoint_method}
            if self.adjoint_method is not None else None
        )
        result = cdeint(
            spline,
            func,
            h0,
            times,
            field_args,
            adjoint=self.adjoint,
            vector_field_type=vf_type,
            method=self.solver,
            return_stats=return_stats,
            even_func=even_func,
            adjoint_options=adjoint_options,
            **settings,
        )
        if return_stats:
            hidden, stats = result
            return self._make_outputs(params, hidden), stats
        return self._make_outputs(params, result)
