"""cdeint + gradient-path tests — the analogue of the reference's
test_cdeint.py shape fuzzing and test_tricks.py / gradient_tests.py
adjoint-vs-backprop agreement (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg

from online_neural_cdes_tpu.ops.cdeint import cdeint
from online_neural_cdes_tpu.ops.interpolation import (
    LinearInterpolation,
    CubicSpline,
    linear_interpolation_coeffs,
    natural_cubic_coeffs,
)


def _linear_time_control(batch, length):
    """X(t) = (t,) as a 1-channel linear interpolation."""
    ts = np.arange(length, dtype=np.float64)
    x = np.tile(ts[None, :, None], (batch, 1, 1))
    return LinearInterpolation.create(linear_interpolation_coeffs(jnp.asarray(x)))


def test_cdeint_linear_field_matches_expm():
    """dz = A z dX with X(t)=t  =>  z(T) = expm(A T) z0."""
    rng = np.random.default_rng(0)
    H = 3
    A = rng.normal(size=(H, H)) * 0.3
    z0 = rng.normal(size=(2, H))
    length = 5
    X = _linear_time_control(2, length)

    def func(t, z, args):
        # (..., H) -> (..., H, I=1): the matrix-vector product A z.
        return (z @ args["A"].T)[..., None]

    zs = cdeint(
        X, func, jnp.asarray(z0), X.grid_points, {"A": jnp.asarray(A)},
        adjoint=False, method="dopri5", rtol=1e-8, atol=1e-10,
    )
    expected = z0 @ scipy.linalg.expm(A * (length - 1)).T
    np.testing.assert_allclose(np.asarray(zs)[:, -1], expected, rtol=1e-5)


@pytest.mark.parametrize("vf_type", ["matmul", "evaluate", "derivative"])
@pytest.mark.parametrize("spline_kind", ["linear", "cubic"])
def test_cdeint_shapes(vf_type, spline_kind):
    rng = np.random.default_rng(1)
    B, L, C, H = 4, 7, 3, 5
    x = rng.normal(size=(B, L, C))
    if spline_kind == "linear":
        X = LinearInterpolation.create(linear_interpolation_coeffs(jnp.asarray(x)))
    else:
        X = CubicSpline.create(natural_cubic_coeffs(jnp.asarray(x)))
    z0 = jnp.asarray(rng.normal(size=(B, H)))
    W = jnp.asarray(rng.normal(size=(H + (C if vf_type != "matmul" else 0),
                                     H * C if vf_type == "matmul" else H)) * 0.1)

    def func(t, inp, args):
        out = jnp.tanh(inp @ args)
        if vf_type == "matmul":
            out = out.reshape(inp.shape[:-1] + (H, C))
        return out

    zs = cdeint(X, func, z0, X.grid_points, W, adjoint=False,
                vector_field_type=vf_type, method="rk4")
    assert zs.shape == (B, L, H)
    assert np.isfinite(np.asarray(zs)).all()


def _loss_fn(adjoint, method, options=None):
    rng = np.random.default_rng(2)
    B, L, C, H = 2, 6, 2, 3
    x_np = rng.normal(size=(B, L, C))
    W0 = jnp.asarray(rng.normal(size=(H, H * C)) * 0.2)
    z0_0 = jnp.asarray(rng.normal(size=(B, H)))
    coeffs0 = linear_interpolation_coeffs(jnp.asarray(x_np))

    def loss(z0, W, coeffs):
        X = LinearInterpolation.create(coeffs)

        def func(t, z, args):
            return jnp.tanh(z @ args).reshape(z.shape[:-1] + (H, C))

        zs = cdeint(X, func, z0, X.grid_points, W, adjoint=adjoint,
                    method=method, rtol=1e-8, atol=1e-10, options=options)
        return jnp.sum(zs**2) + jnp.sum(zs[:, -1])

    return loss, (z0_0, W0, coeffs0)


def test_adjoint_matches_direct_backprop_rk4():
    """Gradient agreement between adjoint and straight-through autodiff
    (reference gradient_tests.py:34-104 / test_tricks.py:21-49).  The
    reference compares at tight adaptive tolerances; the fixed-grid analogue
    is fine sub-stepping — the adjoint's extra discretisation error is
    O(h^4) and vanishes as h shrinks."""
    opts = {"substeps": 16}
    loss_d, args = _loss_fn(adjoint=False, method="rk4", options=opts)
    loss_a, _ = _loss_fn(adjoint=True, method="rk4", options=opts)
    gd = jax.grad(loss_d, argnums=(0, 1, 2))(*args)
    ga = jax.grad(loss_a, argnums=(0, 1, 2))(*args)
    for d, a, name in zip(gd, ga, ["z0", "W", "coeffs"]):
        assert np.isfinite(np.asarray(a)).all(), name
        np.testing.assert_allclose(np.asarray(a), np.asarray(d), rtol=2e-4,
                                   atol=1e-6, err_msg=name)


def test_adjoint_error_shrinks_with_step():
    """The adjoint/backprop gap is a discretisation artefact: quartic in h."""
    losses = {}
    for sub in (1, 4):
        ld, args = _loss_fn(adjoint=False, method="rk4", options={"substeps": sub})
        la, _ = _loss_fn(adjoint=True, method="rk4", options={"substeps": sub})
        gd = jax.grad(ld)(*args)
        ga = jax.grad(la)(*args)
        losses[sub] = float(np.max(np.abs(np.asarray(gd) - np.asarray(ga))))
    assert losses[4] < losses[1] / 16


def test_adjoint_dopri5_gradients_match_rk4_fine():
    """dopri5 trains via adjoint; its gradients must agree with a fine
    fixed-grid direct solve at tolerance."""
    loss_ref, args = _loss_fn(adjoint=False, method="rk4", options={"substeps": 32})
    loss_a, _ = _loss_fn(adjoint=True, method="dopri5")
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(*args)
    g_a = jax.grad(loss_a, argnums=(0, 1, 2))(*args)
    for r, a, name in zip(g_ref, g_a, ["z0", "W", "coeffs"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), rtol=2e-2,
                                   atol=1e-4, err_msg=name)


def test_direct_backprop_dopri5_gradients(  # reference gradient_tests.py:34-104
):
    """Direct (non-adjoint) backprop through the adaptive solver: gradients
    flow to z0/params/coeffs via the two-phase discretize-then-optimize
    re-integration and agree with a fine fixed-grid solve."""
    loss_ref, args = _loss_fn(adjoint=False, method="rk4", options={"substeps": 32})
    loss_d, _ = _loss_fn(adjoint=False, method="dopri5")
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(*args)
    g_d = jax.jit(jax.grad(loss_d, argnums=(0, 1, 2)))(*args)
    for r, d, name in zip(g_ref, g_d, ["z0", "W", "coeffs"]):
        np.testing.assert_allclose(np.asarray(d), np.asarray(r), rtol=2e-2,
                                   atol=1e-4, err_msg=name)
    # Forward values of the two-phase solve match the while-loop solve.
    loss_w, _ = _loss_fn(adjoint=True, method="dopri5")
    np.testing.assert_allclose(float(loss_d(*args)), float(loss_w(*args)),
                               rtol=1e-6)


def test_partial_interval_t_uses_generic_solver():
    """t=[0, 3] on a spline spanning [0, 10] must integrate to t=3, not
    silently run the full knot grid (the piece-scan fast path's contract)."""
    rng = np.random.default_rng(5)
    B, L, C, H = 2, 11, 2, 3
    x = rng.normal(size=(B, L, C))
    X = LinearInterpolation.create(linear_interpolation_coeffs(jnp.asarray(x)))
    z0 = jnp.asarray(rng.normal(size=(B, H)))
    W = jnp.asarray(rng.normal(size=(H, H * C)) * 0.1)

    def func(t, z, args):
        return jnp.tanh(z @ args).reshape(z.shape[:-1] + (H, C))

    t_partial = jnp.asarray([0.0, 3.0])
    zs = cdeint(X, func, z0, t_partial, W, adjoint=False, method="rk4",
                options={"substeps": 64})
    # Truth: full grid solve, state at knot 3.  (The generic solver's steps
    # straddle the spline kinks, so agreement is first-order at the kinks.)
    zs_full = cdeint(X, func, z0, X.grid_points, W, adjoint=False,
                     method="rk4", options={"substeps": 8})
    np.testing.assert_allclose(np.asarray(zs[:, -1]), np.asarray(zs_full[:, 3]),
                               rtol=2e-2, atol=2e-3)
    # And it must NOT equal the state at t=10.
    assert not np.allclose(np.asarray(zs[:, -1]), np.asarray(zs_full[:, -1]),
                           atol=1e-3)


def test_adjoint_under_jit():
    loss_a, args = _loss_fn(adjoint=True, method="rk4")
    g = jax.jit(jax.grad(loss_a))(*args)
    assert np.isfinite(np.asarray(g)).all()


def test_nfe_stats_surface():
    rng = np.random.default_rng(3)
    B, L, C, H = 2, 5, 2, 3
    x = rng.normal(size=(B, L, C))
    X = LinearInterpolation.create(linear_interpolation_coeffs(jnp.asarray(x)))
    z0 = jnp.zeros((B, H))
    W = jnp.asarray(rng.normal(size=(H, H * C)) * 0.1)

    def func(t, z, args):
        return jnp.tanh(z @ args).reshape(z.shape[:-1] + (H, C))

    _, stats = cdeint(X, func, z0, X.grid_points, W, adjoint=False,
                      method="rk4", return_stats=True)
    assert int(stats["nfe"]) == (L - 1) * 4

    _, stats_a = cdeint(X, func, z0, X.grid_points, W, adjoint=True,
                        method="dopri5", options={"min_step": 0.5},
                        return_stats=True)
    assert int(stats_a["nfe"]) > 0
