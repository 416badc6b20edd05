"""Neural CDE front-end: ``cdeint`` and the adjoint method.

Capability parity with the reference's modified torchcde solver
(/root/reference/modules/torchcde/torchcde/solver.py:102-238), including the
repo's ``vector_field_type`` modification:

- ``matmul``      — dz = f(t, z) @ dX/dt   (f returns a (..., H, I) matrix)
- ``evaluate``    — dz = f(t, [z, X(t)])   (RNN-style, f returns (..., H))
- ``derivative``  — dz = f(t, [z, dX/dt])

Differentiation:

- ``adjoint=False`` — plain reverse-mode through the solver scan, with
  optional per-interval rematerialisation (fixed-grid methods only).
- ``adjoint=True``  — O(1)-in-length memory: a ``custom_vjp`` whose backward
  pass re-integrates the augmented state (y, a_y, a_theta) interval-by-
  interval in a *reverse ``lax.scan``* reusing the same solver kernels —
  the semantics of the reference's Python loop (torchdiffeq adjoint.py:
  65-133) as one compiled program.  Gradients flow to z0, the vector-field
  parameters, *and* the interpolation coefficients (the reference warns
  about coeff gradients under adjoint, solver.py:201-221; here they are
  carried in the augmented state by construction).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from online_neural_cdes_tpu.ops import solvers

__all__ = ["cdeint", "odeint_adjoint"]


# ---------------------------------------------------------------------------
# Adjoint odeint
# ---------------------------------------------------------------------------

def _freeze(obj):
    if isinstance(obj, dict):
        return tuple(sorted((k, _freeze(v)) for k, v in obj.items()))
    if isinstance(obj, (list, tuple)):
        return tuple(_freeze(v) for v in obj)
    return obj


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _odeint_adjoint(func, cfg, y0, t, args):
    rtol, atol, method, opt_items, _ = cfg
    return solvers.odeint(
        func, y0, t, args, rtol=rtol, atol=atol, method=method, options=dict(opt_items)
    )


def _odeint_adjoint_fwd(func, cfg, y0, t, args):
    ys = _odeint_adjoint(func, cfg, y0, t, args)
    return ys, (ys, t, args)


def _odeint_adjoint_bwd(func, cfg, residuals, grad_ys):
    rtol, atol, method, opt_items, adj_items = cfg
    adj = dict(adj_items)
    adj_method = adj.pop("method", method)
    adj_rtol = adj.pop("rtol", rtol)
    adj_atol = adj.pop("atol", atol)
    adj_options = adj or dict(opt_items)

    ys, t, args = residuals
    n_out = ys.shape[0] if hasattr(ys, "shape") else jax.tree_util.tree_leaves(ys)[0].shape[0]

    def aug_dynamics(s, aug, _):
        """Augmented dynamics in the substituted time s = -tau, so the
        backward-in-tau integration runs forward in s (valid for both the
        fixed-grid and the adaptive solver)."""
        y, a, _ = aug
        tau = -s
        f, vjp = jax.vjp(lambda y_, th_: func(tau, y_, th_), y, args)
        va_y, va_th = vjp(a)
        return (jax.tree.map(jnp.negative, f), va_y, va_th)

    zero_args_bar = jax.tree.map(jnp.zeros_like, args)

    def interval(carry, inp):
        a, args_bar = carry
        y_i, g_i, t_prev, t_i = inp
        a = jax.tree.map(jnp.add, a, g_i)
        aug0 = (y_i, a, args_bar)
        s_span = jnp.stack([-t_i, -t_prev])
        aug_path = solvers.odeint(
            aug_dynamics, aug0, s_span, None,
            rtol=adj_rtol, atol=adj_atol, method=adj_method, options=dict(adj_options),
        )
        aug1 = jax.tree.map(lambda x: x[-1], aug_path)
        _, a_new, args_bar_new = aug1
        # Reset y to the stored forward estimate at t_{i-1} in the next
        # iteration (reference adjoint.py:132) — done by feeding ys[i-1].
        return (a_new, args_bar_new), None

    ys_tail = jax.tree.map(lambda x: x[1:], ys)       # y at t[1:]
    grads_tail = jax.tree.map(lambda x: x[1:], grad_ys)
    a0 = jax.tree.map(lambda x: jnp.zeros_like(x[0]), ys)
    (a_final, args_bar), _ = jax.lax.scan(
        interval,
        (a0, zero_args_bar),
        (ys_tail, grads_tail, t[:-1], t[1:]),
        reverse=True,
    )
    a_final = jax.tree.map(lambda a, g: a + g[0], a_final, grad_ys)
    # No gradient through the requested output times.
    t_bar = jnp.zeros_like(t)
    return a_final, t_bar, args_bar


_odeint_adjoint.defvjp(_odeint_adjoint_fwd, _odeint_adjoint_bwd)


def odeint_adjoint(
    func: Callable[[Any, Any, Any], Any],
    y0,
    t,
    args=None,
    *,
    rtol: float = 1e-7,
    atol: float = 1e-9,
    method: str = "dopri5",
    options: Optional[dict] = None,
    adjoint_options: Optional[dict] = None,
):
    """O(1)-memory odeint; gradients computed by integrating the adjoint
    system backwards (reference torchdiffeq adjoint.py:148-215).

    ``adjoint_options`` may override ``method``/``rtol``/``atol``/solver
    options for the backward solve; by default it mirrors the forward one.
    """
    cfg = (
        float(rtol),
        float(atol),
        str(method),
        _freeze(options or {}),
        _freeze(adjoint_options or {}),
    )
    t = jnp.asarray(t)
    return _odeint_adjoint(func, cfg, y0, t, args)


# ---------------------------------------------------------------------------
# cdeint
# ---------------------------------------------------------------------------

def _make_cde_field(X, func, vector_field_type: str):
    """Wrap the learned field and the control into dz/dt (reference
    solver.py:102-137 ``_VectorField``).  The control spline ``X`` rides in
    the params pytree so adjoint gradients reach its coefficients."""

    if vector_field_type == "matmul":

        def vf(t, z, theta):
            X_, args = theta
            mat = func(t, z, args)                      # (..., H, I)
            dx = X_.derivative(t)                       # (..., I)
            return jnp.einsum("...hi,...i->...h", mat, dx)

    elif vector_field_type == "evaluate":

        def vf(t, z, theta):
            X_, args = theta
            inp = jnp.concatenate([z, X_.evaluate(t)], axis=-1)
            return func(t, inp, args)

    elif vector_field_type == "derivative":

        def vf(t, z, theta):
            X_, args = theta
            inp = jnp.concatenate([z, X_.derivative(t)], axis=-1)
            return func(t, inp, args)

    else:
        raise ValueError(f"Unknown vector_field_type {vector_field_type!r}")

    return vf


def cdeint(
    X,
    func: Callable[[Any, jax.Array, Any], jax.Array],
    z0: jax.Array,
    t: jax.Array,
    args: Any = None,
    *,
    adjoint: bool = True,
    vector_field_type: str = "matmul",
    method: str = "rk4",
    atol: float = 1e-6,
    rtol: float = 1e-4,
    options: Optional[dict] = None,
    adjoint_options: Optional[dict] = None,
    return_stats: bool = False,
):
    """Solve dz = f(t, z) dX(t) and return z at the requested times with the
    time axis at position -2: ``(..., len(t), hidden)``.

    API parity with reference solver.py:140-238 (default tolerances
    atol=1e-6 / rtol=1e-4 per solver.py:193-196); functional differences:
    the learned field is an explicit function ``func(t, z, args)`` over a
    parameter pytree, and ``t`` must be increasing.
    """
    vf = _make_cde_field(X, func, vector_field_type)
    theta = (X, args)
    t = jnp.asarray(t)

    stats = None
    if adjoint:
        if return_stats:
            if method in solvers.FIXED_METHODS:
                # Fixed-grid NFE is static — a zero-field dummy solve makes
                # odeint report it without touching the real vector field.
                stats = solvers.odeint(
                    lambda *_: jnp.zeros_like(z0), z0, t, None,
                    method=method, options=dict(options or {}), return_stats=True,
                )[1]
            else:
                # Adaptive NFE is data-dependent: costs one extra (no-grad)
                # forward solve outside the custom_vjp.
                _, stats = solvers.odeint(
                    vf, jax.lax.stop_gradient(z0), t,
                    jax.lax.stop_gradient(theta), rtol=rtol, atol=atol,
                    method=method, options=dict(options or {}), return_stats=True,
                )
        zs = odeint_adjoint(
            vf, z0, t, theta, rtol=rtol, atol=atol, method=method,
            options=options, adjoint_options=adjoint_options,
        )
    else:
        zs, stats = solvers.odeint(
            vf, z0, t, theta, rtol=rtol, atol=atol, method=method,
            options=dict(options or {}), return_stats=True,
        )

    # Solver output is time-major (T, ..., H); models want (..., T, H).
    zs = jnp.moveaxis(zs, 0, -2)
    if return_stats:
        return zs, stats
    return zs
