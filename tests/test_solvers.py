"""Solver accuracy/semantics tests against closed-form solutions — the
analogue of the reference's analytic-fixture battery
(modules/torchdiffeq/tests/problems.py, odeint_tests.py), including the
min/max-step NFE assertions of its ``TestMinMaxStep`` (odeint_tests.py:222-240)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from online_neural_cdes_tpu.ops.solvers import odeint


def const_f(t, y, args):
    return jnp.full_like(y, 2.0)


def cos_f(t, y, args):
    return jnp.broadcast_to(jnp.cos(t), y.shape)


def decay_f(t, y, args):
    return -y


@pytest.mark.parametrize("method", ["euler", "midpoint", "rk4"])
def test_fixed_grid_constant_ode_exact(method):
    y0 = jnp.array([1.0, -1.0])
    t = jnp.linspace(0.0, 4.0, 9)
    ys = odeint(const_f, y0, t, method=method)
    expected = y0[None] + 2.0 * np.asarray(t)[:, None]
    np.testing.assert_allclose(np.asarray(ys), expected, rtol=1e-12)


@pytest.mark.smoke
def test_rk4_accuracy_cos():
    y0 = jnp.array([0.0])
    t = jnp.linspace(0.0, 3.0, 31)
    ys = odeint(cos_f, y0, t, method="rk4")
    np.testing.assert_allclose(np.asarray(ys)[:, 0], np.sin(np.asarray(t)), atol=1e-6)


def test_rk4_substeps_improve_accuracy():
    y0 = jnp.array([1.0])
    t = jnp.linspace(0.0, 2.0, 3)
    coarse = odeint(decay_f, y0, t, method="rk4")
    fine = odeint(decay_f, y0, t, method="rk4", options={"substeps": 8})
    exact = np.exp(-np.asarray(t))
    err_c = abs(float(coarse[-1, 0]) - exact[-1])
    err_f = abs(float(fine[-1, 0]) - exact[-1])
    assert err_f < err_c / 100


def test_step_size_option_maps_to_substeps():
    y0 = jnp.array([1.0])
    t = jnp.linspace(0.0, 2.0, 3)  # spacing 1.0
    a = odeint(decay_f, y0, t, method="rk4", options={"step_size": 0.125})
    b = odeint(decay_f, y0, t, method="rk4", options={"substeps": 8})
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12)


@pytest.mark.parametrize(
    "method,tol", [("dopri5", 1e-5), ("bosh3", 1e-4), ("fehlberg2", 1e-3),
                   ("adaptive_heun", 1e-3), ("dopri8", 1e-6)]
)
def test_adaptive_accuracy(method, tol):
    y0 = jnp.array([1.0, 2.0])
    t = jnp.linspace(0.0, 5.0, 11)
    ys = odeint(decay_f, y0, t, method=method, rtol=1e-7, atol=1e-9)
    expected = np.asarray(y0)[None] * np.exp(-np.asarray(t))[:, None]
    np.testing.assert_allclose(np.asarray(ys), expected, rtol=tol)


def test_dopri5_dense_output_between_knots():
    y0 = jnp.array([0.0])
    t = jnp.linspace(0.0, 3.0, 41)  # many closely spaced outputs
    ys = odeint(cos_f, y0, t, method="dopri5", rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(ys)[:, 0], np.sin(np.asarray(t)), atol=1e-6)


def test_dopri8_takes_fewer_steps_than_dopri5():
    """8th order should need far fewer accepted steps at tight tolerance."""
    y0 = jnp.array([1.0])
    t = jnp.linspace(0.0, 10.0, 2)
    _, s5 = odeint(decay_f, y0, t, method="dopri5", rtol=1e-10, atol=1e-12,
                   return_stats=True)
    _, s8 = odeint(decay_f, y0, t, method="dopri8", rtol=1e-10, atol=1e-12,
                   return_stats=True)
    assert int(s8["accepted"]) < int(s5["accepted"]) / 2


def test_min_step_reduces_nfe():
    """The repo's bounded-step modification: with min_step large the solver
    takes big force-accepted steps, slashing NFE (reference
    odeint_tests.py:222-240)."""
    y0 = jnp.ones((4,))

    def stiffish(t, y, args):
        return jnp.sin(50.0 * t) * y

    t = jnp.linspace(0.0, 10.0, 3)
    _, stats_free = odeint(
        stiffish, y0, t, method="dopri5", rtol=1e-6, atol=1e-8, return_stats=True
    )
    _, stats_min = odeint(
        stiffish, y0, t, method="dopri5", rtol=1e-6, atol=1e-8,
        options={"min_step": 2.0}, return_stats=True,
    )
    assert int(stats_min["nfe"]) < int(stats_free["nfe"]) / 4
    # With min_step=2 over a length-10 interval: ~5-6 accepted steps.
    assert int(stats_min["accepted"]) <= 8


def test_max_step_bounds_steps():
    y0 = jnp.array([1.0])
    t = jnp.linspace(0.0, 8.0, 2)
    _, stats = odeint(
        const_f, y0, t, method="dopri5", options={"max_step": 1.0}, return_stats=True
    )
    # 8 time units at <= 1.0 per step -> at least 8 accepted steps.
    assert int(stats["accepted"]) >= 8


def test_min_step_forces_accept():
    """dt <= min_step accepts regardless of error (rk_common.py:275-276)."""
    y0 = jnp.array([1.0])

    def nasty(t, y, args):
        return 100.0 * jnp.cos(100.0 * t) * y

    t = jnp.linspace(0.0, 4.0, 2)
    _, stats = odeint(
        nasty, y0, t, method="dopri5", rtol=1e-9, atol=1e-12,
        options={"min_step": 0.5}, return_stats=True,
    )
    # Steps are clamped to [0.5, inf): at most 8 accepted + few rejected.
    assert int(stats["accepted"]) <= 9
    assert int(stats["rejected"]) == 0  # every dt==min_step is force-accepted


def test_jump_t_lands_on_discontinuity():
    """Piecewise-constant RHS: with jump_t at the kink the solution is exact."""
    y0 = jnp.array([0.0])

    def piecewise(t, y, args):
        return jnp.where(t < 1.0, jnp.ones_like(y), -jnp.ones_like(y))

    t = jnp.linspace(0.0, 2.0, 2)
    ys = odeint(
        piecewise, y0, t, method="dopri5", rtol=1e-6, atol=1e-8,
        options={"jump_t": jnp.array([1.0])},
    )
    np.testing.assert_allclose(float(ys[-1, 0]), 0.0, atol=1e-4)


def test_jump_t_reseeds_fsal_stage():
    """After an accepted step landing ON a jump, the next step's FSAL stage
    must be the right-side derivative (reference Perturb.NEXT,
    rk_common.py:295-297).  min_step forces acceptance so the error
    controller cannot mask a stale left-side stage."""
    y0 = jnp.array([0.0])

    def piecewise(t, y, args):
        return jnp.where(t < 1.0, jnp.ones_like(y), -jnp.ones_like(y))

    t = jnp.linspace(0.0, 2.0, 2)
    ys, stats = odeint(
        piecewise, y0, t, method="dopri5", rtol=1e-2, atol=1e-2,
        options={"jump_t": jnp.array([1.0]), "min_step": 2.0, "first_step": 2.0},
        return_stats=True,
    )
    # Exact: +1 over [0,1], -1 over [1,2].  A stale FSAL stage leaves an
    # O(dt * b1) = O(0.18) error here.
    np.testing.assert_allclose(float(ys[-1, 0]), 0.0, atol=1e-5)


def test_mixed_norm_controls_badly_scaled_pytree_blocks():
    """Per-leaf (mixed) error norms, reference misc.py:18-29: a huge smooth
    block must not drown a small fast block's error out of the flat RMS.
    The same mechanism protects the adjoint's (y, a_y, a_params) augmented
    state when parameter-gradient blocks dwarf the state block."""
    y0 = {"osc": jnp.array([1.0]), "big": 1e3 * jnp.ones(4096)}

    def f(t, y, args):
        return {"osc": 10.0 * jnp.cos(10.0 * t) * jnp.ones_like(y["osc"]),
                "big": -1e-3 * y["big"]}

    t = jnp.linspace(0.0, 3.0, 2)
    exact = 1.0 + jnp.sin(30.0)

    kw = dict(rtol=1e-6, atol=1e-8, method="dopri5", return_stats=True)
    # Per-leaf norms are the default for pytree states.
    ys_mixed, st_mixed = odeint(f, y0, t, **kw)
    err_mixed = abs(float(ys_mixed["osc"][-1, 0]) - float(exact))

    ys_flat, st_flat = odeint(f, y0, t, options={"norm": "rms"}, **kw)
    err_flat = abs(float(ys_flat["osc"][-1, 0]) - float(exact))

    assert err_mixed < 1e-5, err_mixed
    # Flat RMS dilutes the osc block's error over the 4096 big elements,
    # accepting larger steps and a larger error.
    assert err_flat > 2 * err_mixed, (err_flat, err_mixed)
    assert int(st_mixed["accepted"]) > 1.5 * int(st_flat["accepted"])


def test_pytree_state():
    y0 = {"a": jnp.array([1.0]), "b": jnp.array([[2.0, 3.0]])}

    def f(t, y, args):
        return {"a": -y["a"], "b": -2.0 * y["b"]}

    t = jnp.linspace(0.0, 1.0, 5)
    ys = odeint(f, y0, t, method="rk4", options={"substeps": 16})
    np.testing.assert_allclose(
        np.asarray(ys["a"])[:, 0], np.exp(-np.asarray(t)), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(ys["b"])[:, 0, 0], 2.0 * np.exp(-2.0 * np.asarray(t)), rtol=1e-6
    )


def test_odeint_under_jit_and_vmap():
    @jax.jit
    def run(y0):
        return odeint(decay_f, y0, jnp.linspace(0.0, 1.0, 5), method="dopri5")

    batched = jax.vmap(run)(jnp.ones((3, 2)))
    assert batched.shape == (3, 5, 2)
    np.testing.assert_allclose(
        np.asarray(batched[:, -1]), np.full((3, 2), np.exp(-1.0)), rtol=1e-5
    )


def test_args_are_threaded():
    def f(t, y, args):
        return args["rate"] * y

    y0 = jnp.array([1.0])
    t = jnp.linspace(0.0, 1.0, 3)
    ys = odeint(f, y0, t, {"rate": jnp.array(-3.0)}, method="dopri5",
                rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(float(ys[-1, 0]), np.exp(-3.0), rtol=1e-5)


def test_adams_rejects_non_uniform_output_grid():
    """Adams coefficients assume a uniform step stencil; a non-uniform
    concrete grid must raise instead of returning trajectories labelled
    with the wrong times."""
    def f(t, y, _):
        return -y

    y0 = jnp.array([1.0])
    with pytest.raises(ValueError, match="uniformly spaced"):
        odeint(f, y0, jnp.array([0.0, 1.0, 10.0]), method="explicit_adams")


def test_step_size_under_traced_times_raises():
    """step_size against traced times must fail loudly, not silently fall
    back to one step per interval."""
    def f(t, y, _):
        return -y

    y0 = jnp.array([1.0])

    @jax.jit
    def solve(t):
        return odeint(f, y0, t, method="rk4", options={"step_size": 0.1})

    with pytest.raises(ValueError, match="substeps"):
        solve(jnp.array([0.0, 1.0]))


def test_budget_exhaustion_poisons_instead_of_extrapolating():
    """Exhausting max_num_steps before reaching an output time must return
    NaN for the unreached outputs, not dense-output extrapolation."""
    def f(t, y, _):
        return -y

    y0 = jnp.array([1.0])
    t = jnp.array([0.0, 50.0, 100.0])
    ys, stats = odeint(f, y0, t, method="dopri5", rtol=1e-10, atol=1e-12,
                       options={"max_num_steps": 3, "max_step": 1.0},
                       return_stats=True)
    assert np.isnan(np.asarray(ys[1:])).all()
    assert np.isfinite(np.asarray(ys[0])).all()


def test_adjoint_backward_honours_jump_t():
    """Declared discontinuities must clamp steps in the BACKWARD solve too
    (forward times negate under the s = -tau substitution): with bounded
    steps the gradient across the jump is ~500x more accurate than a
    smooth crossing."""
    from online_neural_cdes_tpu.ops.cdeint import odeint_adjoint

    def f(t, y, w):
        rate = jnp.where(t < 1.25, 1.0, 2.0)
        return w * y * rate

    y0 = jnp.array([1.0])
    t = jnp.array([0.0, 3.0])
    w = 0.3
    exact_grad = (1.25 + 2 * 1.75) * np.exp(w * (1.25 + 2 * 1.75))

    def loss(w_):
        ys = odeint_adjoint(
            f, y0, t, w_, rtol=1e-10, atol=1e-12, method="dopri5",
            options={"min_step": 0.5, "max_step": 0.75,
                     "jump_t": jnp.array([1.25])},
        )
        return ys[-1, 0]

    grad = jax.grad(loss)(w)
    assert abs(float(grad) - exact_grad) < 1e-3, (float(grad), exact_grad)


def test_forward_fill_treats_inf_as_observed():
    """Missing data is NaN, not inf: an inf observation must propagate
    loudly instead of being silently replaced by the previous value."""
    from online_neural_cdes_tpu.ops.fill import forward_fill

    x = jnp.array([[1.0], [jnp.inf], [jnp.nan]])
    out = np.asarray(forward_fill(x, axis=-2))
    assert np.isinf(out[1, 0])
    assert np.isinf(out[2, 0])  # forward fill carries the inf, not the 1.0


@pytest.mark.parametrize("method", ["dopri5", "dopri8", "bosh3", "rk4",
                                    "implicit_adams"])
def test_fuzz_random_linear_systems_vs_expm(method):
    """Random linear systems dy/dt = A y over several seeds, checked
    against the matrix exponential — fuzzes every solver family (adaptive,
    fixed-grid, multistep) on coupled dynamics with mixed eigenvalues."""
    from scipy.linalg import expm

    for seed in range(4):
        rng = np.random.default_rng(seed)
        n = 4
        A = rng.normal(size=(n, n)) * 0.6
        A -= np.eye(n) * 0.5            # pull spectra leftward (stability)
        y0 = jnp.asarray(rng.normal(size=(n,)))

        def f(t, y, _):
            return jnp.asarray(A) @ y

        t = jnp.linspace(0.0, 2.0, 9)
        opts = {"substeps": 8} if method in ("rk4", "implicit_adams") else {}
        ys = odeint(f, y0, t, method=method, rtol=1e-9, atol=1e-11,
                    options=opts)
        for i, ti in enumerate(np.asarray(t)):
            ref = expm(A * ti) @ np.asarray(y0)
            np.testing.assert_allclose(
                np.asarray(ys[i]), ref, rtol=2e-5, atol=2e-6,
                err_msg=f"{method} seed {seed} t={ti}",
            )
