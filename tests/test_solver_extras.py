"""Tests for the extended solver inventory: Adams multistep, scipy host
fallback, event handling, seminorm adjoint, TupleControl (reference
fixed_adams.py / scipy_wrapper.py / event_handling.py / adjoint.py:235-281 /
misc.py:129-166 roles)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from online_neural_cdes_tpu.ops.cdeint import cdeint, odeint_adjoint
from online_neural_cdes_tpu.ops.interpolation import (
    LinearInterpolation,
    TupleControl,
    linear_interpolation_coeffs,
)
from online_neural_cdes_tpu.ops.solvers import combine_event_functions, odeint, odeint_event


def decay(t, y, args):
    return -y


@pytest.mark.parametrize("method", ["explicit_adams", "implicit_adams"])
def test_adams_accuracy(method):
    y0 = jnp.array([1.0, 2.0])
    t = jnp.linspace(0.0, 2.0, 5)
    # Explicit Adams-Bashforth orders >~6 have tiny stability intervals (the
    # reference grows order identically and would diverge identically here);
    # cap the explicit variant at a stable order for this step size.
    opts = {"substeps": 8}
    if method == "explicit_adams":
        opts["max_order"] = 5
    ys = odeint(decay, y0, t, method=method, options=opts)
    expected = np.asarray(y0)[None] * np.exp(-np.asarray(t))[:, None]
    np.testing.assert_allclose(np.asarray(ys), expected, rtol=2e-4)
    # The corrector is more accurate than the predictor alone.
    coarse_e = odeint(
        decay, y0, t, method="explicit_adams",
        options={"substeps": 2, "max_order": 5},
    )
    coarse_i = odeint(
        decay, y0, t, method="implicit_adams",
        options={"substeps": 2, "max_order": 5},
    )
    err_e = abs(float(coarse_e[-1, 0]) - np.exp(-2.0))
    err_i = abs(float(coarse_i[-1, 0]) - np.exp(-2.0))
    assert err_i < err_e


@pytest.mark.smoke
def test_adams_coefficient_tables_match_published():
    """The Lagrange-integration generator reproduces the classic published
    Adams constants (reference fixed_adams.py:10-143 tables)."""
    from online_neural_cdes_tpu.ops.solvers import _adams_coefficient_tables

    bash, moul = _adams_coefficient_tables(12)
    np.testing.assert_allclose(bash[4], np.array([55, -59, 37, -9]) / 24)
    np.testing.assert_allclose(bash[2], np.array([3, -1]) / 2)
    np.testing.assert_allclose(moul[3], np.array([5, 8, -1]) / 12)
    np.testing.assert_allclose(moul[4], np.array([9, 19, -5, 1]) / 24)
    np.testing.assert_allclose(
        bash[12],
        np.array([
            4527766399, -19433810163, 61633227185, -135579356757,
            214139355366, -247741639374, 211103573298, -131365867290,
            58189107627, -17410248271, 3158642445, -262747265,
        ]) / 958003200,
        rtol=1e-12,
    )


def test_adams_variable_order_beats_order4():
    """Growing to high order (reference fixed_adams.py:184 order schedule)
    is far more accurate than the order-4 cap on a smooth problem."""
    y0 = jnp.array([1.0])
    t = jnp.linspace(0.0, 2.0, 41)
    hi = odeint(decay, y0, t, method="implicit_adams")
    lo = odeint(decay, y0, t, method="implicit_adams", options={"max_order": 4})
    err_hi = abs(float(hi[-1, 0]) - np.exp(-2.0))
    err_lo = abs(float(lo[-1, 0]) - np.exp(-2.0))
    assert err_hi < err_lo / 10
    assert err_hi < 1e-9


def test_adams_gradient_flows():
    """Reverse-mode AD through the growing-order corrector scan."""
    y0 = jnp.array([1.0, 2.0])
    t = jnp.linspace(0.0, 2.0, 21)

    def loss(y0):
        return odeint(decay, y0, t, method="implicit_adams")[-1].sum()

    g = jax.grad(loss)(y0)
    np.testing.assert_allclose(np.asarray(g), np.exp(-2.0), rtol=1e-5)


def test_scipy_solver_wrapper():
    y0 = jnp.array([1.0])
    t = jnp.linspace(0.0, 3.0, 7)
    ys, stats = odeint(
        decay, y0, t, method="scipy_solver", rtol=1e-8, atol=1e-10,
        options={"solver": "RK45"}, return_stats=True,
    )
    np.testing.assert_allclose(
        np.asarray(ys)[:, 0], np.exp(-np.asarray(t)), rtol=1e-5
    )
    assert int(stats["nfe"]) > 0


def test_odeint_event_linear_crossing():
    """dy/dt = -1 from y=1: event y=0 fires at t=1."""
    def f(t, y, args):
        return -jnp.ones_like(y)

    def event(t, y):
        return y[0]

    event_t, y_event = odeint_event(
        f, jnp.array([1.0]), 0.0, event, method="dopri5", rtol=1e-8, atol=1e-10
    )
    np.testing.assert_allclose(float(event_t), 1.0, atol=1e-6)
    np.testing.assert_allclose(float(y_event[0]), 0.0, atol=1e-6)


def test_odeint_event_nonlinear():
    """Exponential decay hits 0.5 at t = ln 2."""
    def event(t, y):
        return y[0] - 0.5

    event_t, _ = odeint_event(
        decay, jnp.array([1.0]), 0.0, event, method="dopri5", rtol=1e-9, atol=1e-12
    )
    np.testing.assert_allclose(float(event_t), np.log(2.0), atol=1e-6)


def test_combine_event_functions():
    def events(t, y):
        return jnp.array([y[0] - 0.25, 0.75 - y[0]])  # second starts negative? no: y0=1 -> 0.75-1=-0.25

    # Signs normalised at t0 so the combination starts positive; first
    # crossing of either component fires.
    def f(t, y, args):
        return -jnp.ones_like(y)

    event_t, _ = odeint_event(
        f, jnp.array([1.0]), 0.0, events, method="dopri5", rtol=1e-8, atol=1e-10
    )
    # y(t) = 1 - t; component 2 (0.75 - y) starts at -0.25 -> normalised;
    # crosses zero at t=0.25; component 1 crosses at t=0.75.
    np.testing.assert_allclose(float(event_t), 0.25, atol=1e-5)


def test_event_time_gradients_ift():
    """dy/dt = -r from y0: event y=0 at t* = y0/r, so dt*/dy0 = 1/r and
    dt*/dr = -y0/r^2 (implicit-function-theorem rerouting)."""
    def f(t, y, args):
        return -args * jnp.ones_like(y)

    def event(t, y):
        return y[0]

    def event_time(y0_scalar, rate):
        t_star, _ = odeint_event(
            f, jnp.array([y0_scalar]), 0.0, event, rate,
            method="dopri5", rtol=1e-9, atol=1e-12, differentiable=True,
        )
        return t_star

    y0, r = 2.0, 0.5
    t_star = event_time(y0, r)
    np.testing.assert_allclose(float(t_star), y0 / r, rtol=1e-6)
    g_y0, g_r = jax.grad(event_time, argnums=(0, 1))(y0, r)
    np.testing.assert_allclose(float(g_y0), 1.0 / r, rtol=1e-4)
    np.testing.assert_allclose(float(g_r), -y0 / r**2, rtol=1e-4)


def test_seminorm_adjoint_gradients_close():
    rng = np.random.default_rng(0)
    W = jnp.asarray(rng.normal(size=(3, 3)) * 0.3)
    y0 = jnp.asarray(rng.normal(size=(2, 3)))
    t = jnp.linspace(0.0, 2.0, 4)

    def f(tt, y, args):
        return jnp.tanh(y @ args)

    def loss(norm_opts):
        def inner(y0_, W_):
            ys = odeint_adjoint(
                f, y0_, t, W_, rtol=1e-8, atol=1e-10, method="dopri5",
                adjoint_options=norm_opts,
            )
            return jnp.sum(ys ** 2)
        return inner

    g_full = jax.grad(loss(None), argnums=(0, 1))(y0, W)
    g_semi = jax.grad(loss({"norm": "seminorm"}), argnums=(0, 1))(y0, W)
    for a, b in zip(g_full, g_semi):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_tuple_control_cdeint():
    rng = np.random.default_rng(1)
    B, L = 3, 6
    x1 = rng.normal(size=(B, L, 2)).astype(np.float32)
    x2 = rng.normal(size=(B, L, 3)).astype(np.float32)
    X = TupleControl.create(
        LinearInterpolation.create(linear_interpolation_coeffs(jnp.asarray(x1))),
        LinearInterpolation.create(linear_interpolation_coeffs(jnp.asarray(x2))),
    )
    assert len(X.evaluate(1.5)) == 2
    H = 4
    W1 = jnp.asarray(rng.normal(size=(H, H * 2)) * 0.1)
    W2 = jnp.asarray(rng.normal(size=(H, H * 3)) * 0.1)

    def func(t, z, args):
        w1, w2 = args
        m1 = jnp.tanh(z @ w1).reshape(z.shape[:-1] + (H, 2))
        m2 = jnp.tanh(z @ w2).reshape(z.shape[:-1] + (H, 3))
        return (m1, m2)

    z0 = jnp.zeros((B, H))
    zs = cdeint(X, func, z0, X.grid_points, (W1, W2), adjoint=False, method="dopri5")
    assert zs.shape == (B, L, H)
    assert np.isfinite(np.asarray(zs)).all()

    # Equivalent to a single control with concatenated channels and a
    # block-concatenated field.
    x_cat = np.concatenate([x1, x2], axis=-1)
    Xc = LinearInterpolation.create(linear_interpolation_coeffs(jnp.asarray(x_cat)))

    def func_cat(t, z, args):
        w1, w2 = args
        m1 = jnp.tanh(z @ w1).reshape(z.shape[:-1] + (H, 2))
        m2 = jnp.tanh(z @ w2).reshape(z.shape[:-1] + (H, 3))
        return jnp.concatenate([m1, m2], axis=-1)

    zs_cat = cdeint(Xc, func_cat, z0, Xc.grid_points, (W1, W2), adjoint=False,
                    method="dopri5")
    np.testing.assert_allclose(np.asarray(zs), np.asarray(zs_cat), rtol=1e-4, atol=1e-6)


def test_differentiable_adaptive_inference_uses_while_loop_values():
    """The custom_vjp primal (no differentiation) is the plain adaptive
    while_loop — accurate regardless of the fwd/bwd step budget."""
    def osc(t, y, args):
        return jnp.stack([y[1], -25.0 * y[0]])

    y0 = jnp.array([1.0, 0.0])
    ys = odeint(osc, y0, jnp.array([0.0, 100.0]), method="dopri5",
                rtol=1e-6, atol=1e-9, options={"differentiable": True})
    np.testing.assert_allclose(float(ys[-1, 0]), np.cos(500.0), atol=2e-2)


def test_differentiable_adaptive_exhaustion_poisons_not_extrapolates():
    """When the accepted-step budget runs out under differentiation, outputs
    past the reached time must be NaN (loud) — never silently wrong."""
    def osc(t, y, args):
        return jnp.stack([y[1], -25.0 * y[0]])

    y0 = jnp.array([1.0, 0.0])

    def loss(y0_):
        ys = odeint(osc, y0_, jnp.array([0.0, 100.0]), method="dopri5",
                    rtol=1e-6, atol=1e-9, options={"differentiable": True})
        return ys[-1, 0]

    val = jax.value_and_grad(loss)(y0)[0]
    assert np.isnan(float(val))
    # With an explicit adequate budget the same gradient pass is accurate.
    def loss_ok(y0_):
        ys = odeint(osc, y0_, jnp.array([0.0, 30.0]), method="dopri5",
                    rtol=1e-6, atol=1e-9,
                    options={"differentiable": True, "max_steps": 900})
        return ys[-1, 0]

    val_ok, g_ok = jax.value_and_grad(loss_ok)(y0)
    np.testing.assert_allclose(float(val_ok), np.cos(150.0), atol=2e-2)
    assert np.isfinite(np.asarray(g_ok)).all()


def test_differentiable_adaptive_closure_captured_params():
    """Gradients flow to parameters captured in the vector-field closure
    (closure_convert hoists them through the custom_vjp)."""
    y0 = jnp.array([1.0, 0.0])
    t = jnp.linspace(0.0, 1.0, 3)

    def loss(a):
        f = lambda tt, y, args: jnp.stack([y[1], -a * y[0]])
        ys = odeint(f, y0, t, method="dopri5", rtol=1e-8, atol=1e-10,
                    options={"differentiable": True})
        return ys[-1, 0]

    loss_j = jax.jit(loss)            # one compile for both fd evals
    g = jax.grad(loss)(25.0)
    eps = 1e-5
    fd = (loss_j(25.0 + eps) - loss_j(25.0 - eps)) / (2 * eps)
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-4)


def test_adams_adjoint_substeps_resolved_from_concrete_grid():
    """cdeint must resolve step_size->substeps against the concrete knot
    grid BEFORE entering the adjoint: inside the backward scan the interval
    span is a tracer, and the solver-level fallback would integrate the
    whole span in one bootstrap step (wrong gradients that do not improve
    with step_size).  Regression: adjoint gradients must converge to the
    direct gradients as substeps refine."""
    from online_neural_cdes_tpu.models.ncde import NeuralCDE, make_spline
    from online_neural_cdes_tpu.ops.interpolation import natural_cubic_coeffs

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, 5, 3)) * 0.3, jnp.float32)
    spline = make_spline("cubic", natural_cubic_coeffs(x))
    model = NeuralCDE(input_dim=3, hidden_dim=6, output_dim=2,
                      hidden_hidden_dim=8, num_layers=1,
                      interpolation="cubic", adjoint=False)
    field = model.field
    params = model.init(jax.random.PRNGKey(0))["field"]

    def func(t, z, fp):
        return field.apply(fp, t, z)

    z0 = jnp.zeros((2, 6), jnp.float32)
    t = spline.interval

    def grads(adjoint, substeps):
        def loss(p):
            out = cdeint(spline, func, z0, t, p, adjoint=adjoint,
                         method="implicit_adams",
                         options={"substeps": substeps})
            return jnp.sum(out[..., -1, :] ** 2)

        return jax.grad(loss)(params)

    def maxdiff(a, b):
        return max(float(jnp.max(jnp.abs(x - y)))
                   for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)))

    coarse = maxdiff(grads(True, 4), grads(False, 4))
    fine = maxdiff(grads(True, 32), grads(False, 32))
    mag = max(float(jnp.max(jnp.abs(g)))
              for g in jax.tree.leaves(grads(False, 32)))
    assert fine < coarse / 4, (coarse, fine)
    # The residual gap is the optimize-vs-discretize divergence, shrinking
    # with h; before the fix it was O(1) and did not improve with substeps.
    assert fine < 0.12 * mag, (fine, mag)


# ---------------------------------------------------------------------------
# grid_constructor (reference solvers.py:51-77, tests/odeint_tests.py:181-218)
# ---------------------------------------------------------------------------

def test_grid_constructor_euler_matches_reference_semantics():
    """f(t,x)=x over [0,1] with an 11-point constructed grid: Euler gives
    exactly x0 * 1.1**10, and direct backprop gives the Euler-exact
    gradient (the reference's TestGridConstructor)."""
    def f(t, y, args):
        return y

    x0 = jnp.array([1.0])
    t = jnp.array([0.0, 1.0])
    seen = {}

    def ctor(func, y0, tt):
        seen["shape"] = tt.shape
        return jnp.linspace(tt[0], tt[-1], 11)

    def loss(x0):
        ys = odeint(f, x0, t, method="euler",
                    options={"grid_constructor": ctor})
        return ys[1, 0]

    val, g = jax.value_and_grad(loss)(x0)
    assert seen["shape"] == (2,)
    np.testing.assert_allclose(float(val), 1.1 ** 10, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(g), 1.1 ** 10, rtol=1e-10)


def test_grid_constructor_adjoint():
    """The adjoint's backward per-interval solves call the constructor with
    the traced substituted-time span; a trace-compatible constructor yields
    the Euler-exact adjoint gradient (reference runs the same check through
    odeint_adjoint)."""
    def f(t, y, args):
        return y

    def ctor(func, y0, tt):
        return jnp.linspace(tt[0], tt[-1], 11)

    x0 = jnp.array([1.0])
    t = jnp.array([0.0, 1.0])

    def loss(x0):
        ys = odeint_adjoint(f, x0, t, method="euler",
                            options={"grid_constructor": ctor})
        return ys[1, 0]

    val, g = jax.value_and_grad(loss)(x0)
    np.testing.assert_allclose(float(val), 1.1 ** 10, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(g), 1.1 ** 10, rtol=1e-10)


def test_grid_constructor_interpolates_interior_outputs():
    """Outputs strictly inside the constructed grid are linearly
    interpolated between grid states (reference interp='linear' default)."""
    def f(t, y, args):
        return jnp.ones_like(y)

    x0 = jnp.array([0.0])
    t = jnp.array([0.0, 0.35, 1.0])
    ys = odeint(
        f, x0, t, method="euler",
        options={"grid_constructor": lambda fn, y0, tt: jnp.linspace(0.0, 1.0, 5)},
    )
    # dy/dt = 1 is linear, so linear interpolation is exact everywhere.
    np.testing.assert_allclose(np.asarray(ys[:, 0]), np.asarray(t), atol=1e-12)


def test_grid_constructor_mutually_exclusive_with_step_size():
    def f(t, y, args):
        return y

    with pytest.raises(ValueError, match="mutually exclusive"):
        odeint(
            f, jnp.array([1.0]), jnp.array([0.0, 1.0]), method="euler",
            options={"grid_constructor": lambda fn, y0, tt: tt,
                     "step_size": 0.1},
        )


def test_grid_constructor_span_mismatch_raises():
    def f(t, y, args):
        return y

    with pytest.raises(ValueError, match="spanning"):
        odeint(
            f, jnp.array([1.0]), jnp.array([0.0, 1.0]), method="euler",
            options={"grid_constructor":
                     lambda fn, y0, tt: jnp.linspace(0.0, 0.5, 5)},
        )


def test_scipy_min_step_forwarded(monkeypatch):
    """min_step reaches scipy's solve_ivp (reference scipy_wrapper.py:39
    forwards both bounds; scipy treats hmin as an LSODA error threshold, so
    the contract to verify is the forwarding itself)."""
    import scipy.integrate

    captured = {}
    real = scipy.integrate.solve_ivp

    def spy(*args, **kwargs):
        captured.update(kwargs)
        return real(*args, **kwargs)

    import online_neural_cdes_tpu.ops.solvers as solvers_mod

    monkeypatch.setattr("scipy.integrate.solve_ivp", spy)
    y0 = jnp.array([1.0])
    t = jnp.linspace(0.0, 10.0, 5)
    odeint(
        decay, y0, t, method="scipy_solver", rtol=1e-8, atol=1e-10,
        options={"solver": "LSODA", "min_step": 0.1, "max_step": 5.0},
    )
    assert captured.get("min_step") == 0.1
    assert captured.get("max_step") == 5.0


# ---------------------------------------------------------------------------
# Output-time gradients (vjp_t — reference adjoint.py:116-137 time_vjps)
# ---------------------------------------------------------------------------

def _tdep_field(t, y, args):
    # Explicit time dependence so the integrated a . df/dt term is nonzero.
    return -y + jnp.sin(3.0 * t)


def test_output_time_gradients_adjoint_fd():
    """dL/dt_i from the adjoint matches central finite differences for every
    output time INCLUDING t_0 (the accumulated vjp_t slot)."""
    y0 = jnp.array([0.7, -0.3])
    t = jnp.array([0.1, 0.9, 1.7])
    w = jnp.array([[2.0, -1.0], [0.5, 1.5], [1.0, 1.0]])

    def loss(tvec):
        ys = odeint_adjoint(_tdep_field, y0, tvec, rtol=1e-10, atol=1e-12)
        return jnp.sum(w * ys)

    g = np.asarray(jax.grad(loss)(t))
    eps = 1e-5
    for i in range(3):
        tp = t.at[i].add(eps)
        tm = t.at[i].add(-eps)
        fd = (float(loss(tp)) - float(loss(tm))) / (2 * eps)
        np.testing.assert_allclose(g[i], fd, rtol=1e-4, atol=1e-7)


def test_output_time_gradients_differentiable_adaptive_fd():
    """dL/dt_i (i >= 1) through the differentiable adaptive solve matches
    finite differences via the dense-output derivative; the start time is
    treated as a constant of the recorded grid (documented)."""
    y0 = jnp.array([0.7, -0.3])
    t = jnp.array([0.1, 0.9, 1.7])
    w = jnp.array([[2.0, -1.0], [0.5, 1.5], [1.0, 1.0]])

    def loss(tvec):
        ys = odeint(_tdep_field, y0, tvec, rtol=1e-10, atol=1e-12,
                    options={"differentiable": True})
        return jnp.sum(w * ys)

    g = np.asarray(jax.grad(loss)(t))
    eps = 1e-5
    for i in (1, 2):
        tp = t.at[i].add(eps)
        tm = t.at[i].add(-eps)
        fd = (float(loss(tp)) - float(loss(tm))) / (2 * eps)
        np.testing.assert_allclose(g[i], fd, rtol=1e-4, atol=1e-7)


def test_output_time_gradients_zero_when_field_autonomous_interiors():
    """For an autonomous linear field the t_i gradient reduces to
    g_i . f(y_i) exactly — a closed-form cross-check of the boundary term."""
    A = jnp.array([[-0.5, 0.2], [0.1, -0.8]])

    def f(t, y, args):
        return y @ A.T

    y0 = jnp.array([1.0, 2.0])
    t = jnp.array([0.0, 1.0, 2.0])

    def loss(tvec):
        ys = odeint_adjoint(f, y0, tvec, rtol=1e-11, atol=1e-13)
        return jnp.sum(ys[2] ** 2)

    g = np.asarray(jax.grad(loss)(t))
    ys = odeint_adjoint(f, y0, t, rtol=1e-11, atol=1e-13)
    expected_t2 = float(2.0 * jnp.sum(ys[2] * (ys[2] @ A.T)))
    np.testing.assert_allclose(g[2], expected_t2, rtol=1e-6)
    # t_1 does not appear in the loss: boundary term zero, and for the
    # reconstruction-exact adjoint the interior contribution vanishes too.
    np.testing.assert_allclose(g[1], 0.0, atol=1e-8)


def test_output_time_gradients_adjoint_pytree_state():
    """vjp_t with a PYTREE state: the augmented vt slot rides the ravelled
    tuple state; FD check on an interior output time."""
    def f(t, y, args):
        a, b = y
        return (-a + jnp.sin(2.0 * t) * b, -0.5 * b + jnp.cos(t))

    y0 = (jnp.array([0.5, -0.2]), jnp.array([1.0, 0.3]))
    t = jnp.array([0.2, 1.0, 1.9])

    def loss(tvec):
        ys = odeint_adjoint(f, y0, tvec, rtol=1e-10, atol=1e-12)
        return jnp.sum(ys[0][1] * 1.5) + jnp.sum(ys[1][2] ** 2)

    g = np.asarray(jax.grad(loss)(t))
    eps = 1e-5
    for i in (1, 2):
        fd = (float(loss(t.at[i].add(eps))) - float(loss(t.at[i].add(-eps)))) / (2 * eps)
        np.testing.assert_allclose(g[i], fd, rtol=1e-4, atol=1e-7)


def test_scipy_min_step_rejected_for_non_lsoda():
    """Of scipy's solve_ivp methods only LSODA accepts min_step; forwarding
    it to RK45 would raise a TypeError deep inside scipy, so the fallback
    rejects the combination loudly instead (review r3)."""
    import jax.numpy as jnp

    from online_neural_cdes_tpu.ops.solvers import odeint

    with pytest.raises(ValueError, match="min_step"):
        odeint(
            lambda t, y, args: -y, jnp.ones(2), jnp.linspace(0.0, 1.0, 3),
            None, method="scipy_solver",
            options={"solver": "RK45", "min_step": 0.1},
        )


def test_vmap_per_sample_adaptive_stepping():
    """Per-sample adaptive stepping (torchode semantics) composes via
    jax.vmap over the adaptive while_loop core — each sample carries its
    own step controller, results match per-sample solves (DESIGN.md
    §Considered and rejected)."""
    from online_neural_cdes_tpu.ops.solvers import odeint

    def f(t, y, a):
        return -a * y  # per-sample decay rates -> heterogeneous stiffness

    t = jnp.asarray([0.0, 1.0], jnp.float64)
    y0 = jnp.ones((4, 1), jnp.float64)
    rates = jnp.asarray([0.1, 1.0, 10.0, 50.0], jnp.float64)

    batched = jax.vmap(
        lambda y, a: odeint(f, y, t, a, method="dopri5",
                            rtol=1e-8, atol=1e-10)
    )(y0, rates)
    single = jnp.stack([
        odeint(f, y0[i], t, rates[i], method="dopri5",
               rtol=1e-8, atol=1e-10)
        for i in range(4)
    ])
    np.testing.assert_allclose(np.asarray(batched), np.asarray(single),
                               rtol=1e-7, atol=1e-9)
    exact = y0[:, None, :] * jnp.exp(-rates[:, None, None] * t[None, :, None])
    np.testing.assert_allclose(np.asarray(batched), np.asarray(exact),
                               rtol=1e-6, atol=1e-8)
