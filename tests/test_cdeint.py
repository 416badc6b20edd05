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


@pytest.mark.smoke
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


def test_fixed_adjoint_method_override():
    """adjoint_options={"method": "midpoint"} runs the backward solve with
    a cheaper stepper (reference adjoint_options semantics): gradients
    stay close to the rk4-backward adjoint at the lower order's accuracy,
    converging to it under backward sub-stepping."""
    from online_neural_cdes_tpu.models.ncde import NeuralCDE, make_spline
    from online_neural_cdes_tpu.ops.interpolation import linear_interpolation_coeffs

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(6, 9, 3)) * 0.3, jnp.float32)
    spline = make_spline("linear", linear_interpolation_coeffs(x))
    model = NeuralCDE(input_dim=3, hidden_dim=6, output_dim=2,
                      hidden_hidden_dim=8, num_layers=1,
                      interpolation="linear", adjoint=False)
    field = model.field
    params = model.init(jax.random.PRNGKey(0))["field"]

    def func(t, z, fp):
        return field.apply(fp, t, z)

    z0 = jnp.zeros((6, 6), jnp.float32)

    def grads(adjoint_options):
        def loss(p):
            out = cdeint(spline, func, z0, spline.interval, p, adjoint=True,
                         method="rk4", adjoint_options=adjoint_options)
            return jnp.sum(out ** 2)

        return jax.grad(loss)(params)

    g_rk4 = grads(None)
    g_mid = grads({"method": "midpoint"})

    def maxdiff(a, b):
        return max(float(jnp.max(jnp.abs(x_ - y_)))
                   for x_, y_ in zip(jax.tree.leaves(a), jax.tree.leaves(b)))

    mag = max(float(jnp.max(jnp.abs(g))) for g in jax.tree.leaves(g_rk4))
    coarse = maxdiff(g_mid, g_rk4)
    # Both backward methods converge to the SAME continuous-adjoint limit
    # as the backward refines: at matched substeps the midpoint and rk4
    # backwards must agree far more tightly than at one step per knot
    # (the knob trades gradient order for stage count, as the reference's
    # adjoint_options method override does).
    fine = maxdiff(grads({"method": "midpoint", "substeps": 8}),
                   grads({"substeps": 8}))
    assert coarse < 0.5 * mag, (coarse, mag)
    assert fine < coarse / 8, (coarse, fine)
    with pytest.raises(ValueError, match="fixed-grid adjoint_options"):
        grads({"method": "dopri5"})


def test_ncde_adjoint_method_field():
    from online_neural_cdes_tpu.models.ncde import NeuralCDE
    from online_neural_cdes_tpu.ops.interpolation import linear_interpolation_coeffs

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(4, 7, 3)) * 0.3, jnp.float32)
    x = x.at[:, :, 0].set(jnp.arange(7, dtype=jnp.float32))
    coeffs = linear_interpolation_coeffs(x, rectilinear=0)
    base = dict(input_dim=3, hidden_dim=6, output_dim=1, hidden_hidden_dim=8,
                num_layers=1, interpolation="rectilinear", adjoint=True)
    m_rk4 = NeuralCDE(**base)
    m_mid = NeuralCDE(**base, adjoint_method="midpoint")
    params = m_rk4.init(jax.random.PRNGKey(0))

    def g(model):
        return jax.grad(
            lambda p: jnp.sum(model.apply(p, coeffs) ** 2))(params)

    # Forward values identical; gradients differ (cheaper backward) but
    # stay bounded relative to the rk4-adjoint gradients.
    np.testing.assert_allclose(np.asarray(m_mid.apply(params, coeffs)),
                               np.asarray(m_rk4.apply(params, coeffs)))
    ga, gb = g(m_mid), g(m_rk4)
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        scale = float(jnp.max(jnp.abs(b))) + 1e-8
        assert float(jnp.max(jnp.abs(a - b))) < 0.5 * scale + 1e-6


def test_adjoint_method_training_parity():
    """On the EASY toy task the cheaper backward steppers reach the same
    optimum (rk4/midpoint/euler losses agree) — the favourable end of the
    knob's task-dependent accuracy trade (harder tasks converge slower
    under the cheap backwards; DESIGN.md section 1c records both)."""
    import optax

    from online_neural_cdes_tpu.models.ncde import NeuralCDE
    from online_neural_cdes_tpu.ops.interpolation import linear_interpolation_coeffs

    rng = np.random.default_rng(0)
    N, L = 128, 6
    inc = rng.normal(size=(N, L - 1)) / np.sqrt(L - 1)
    bm = np.concatenate([np.zeros((N, 1)), np.cumsum(inc, 1)], 1)
    x = np.stack([np.tile(np.arange(L), (N, 1)), bm], -1).astype(np.float32)
    y = jnp.asarray((bm[:, -1:] > 0).astype(np.float32)
                    * np.ones((1, L), np.float32))
    coeffs = linear_interpolation_coeffs(jnp.asarray(x), rectilinear=0)

    def train(adjoint_method, epochs=25):
        model = NeuralCDE(input_dim=2, hidden_dim=6, output_dim=1,
                          hidden_hidden_dim=12, num_layers=1,
                          interpolation="rectilinear",
                          return_sequences=True, adjoint=True,
                          solver="rk4", adjoint_method=adjoint_method)
        params = model.init(jax.random.PRNGKey(0))
        opt = optax.adam(3e-3)
        s = opt.init(params)

        def loss_fn(p):
            logits = model.apply(p, coeffs)[..., 0]
            return optax.sigmoid_binary_cross_entropy(logits, y).mean()

        @jax.jit
        def step(p, s):
            l, g = jax.value_and_grad(loss_fn)(p)
            u, s = opt.update(g, s)
            return optax.apply_updates(p, u), s, l

        for _ in range(epochs):
            params, s, l = step(params, s)
        return float(l)

    l_rk4 = train(None)
    l_mid = train("midpoint")
    l_eul = train("euler")
    assert abs(l_mid - l_rk4) < 0.01, (l_rk4, l_mid)
    assert abs(l_eul - l_rk4) < 0.02, (l_rk4, l_eul)


def test_fixed_adjoint_step_size_resolves_like_substeps():
    """adjoint_options={'step_size': 0.5} on the piece-scan path resolves
    to 2 backward substeps per unit knot — bitwise-equal gradients to the
    explicit substeps form (the generic path's contract)."""
    from online_neural_cdes_tpu.models.ncde import NeuralCDE, make_spline
    from online_neural_cdes_tpu.ops.interpolation import linear_interpolation_coeffs

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(4, 7, 3)) * 0.3, jnp.float32)
    spline = make_spline("linear", linear_interpolation_coeffs(x))
    model = NeuralCDE(input_dim=3, hidden_dim=6, output_dim=2,
                      hidden_hidden_dim=8, num_layers=1,
                      interpolation="linear", adjoint=False)
    field = model.field
    params = model.init(jax.random.PRNGKey(0))["field"]

    def func(t, z, fp):
        return field.apply(fp, t, z)

    z0 = jnp.zeros((4, 6), jnp.float32)

    def grads(adjoint_options):
        def loss(p):
            out = cdeint(spline, func, z0, spline.interval, p, adjoint=True,
                         method="rk4", adjoint_options=adjoint_options)
            return jnp.sum(out ** 2)

        return jax.grad(loss)(params)

    g_step = grads({"step_size": 0.5})
    g_sub = grads({"substeps": 2})
    g_one = grads(None)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        g_step, g_sub,
    )
    # and it genuinely changed the backward (not a silent no-op)
    diffs = [float(jnp.max(jnp.abs(a - b)))
             for a, b in zip(jax.tree.leaves(g_step), jax.tree.leaves(g_one))]
    assert max(diffs) > 0, diffs


@pytest.mark.parametrize("interpolation,adjoint", [
    ("rectilinear", True),   # paired scan + interval adjoint
    ("linear", True),        # unpaired scan + interval adjoint
    ("linear", False),       # unpaired scan + direct backprop
])
def test_bf16_storage_adjoint_path(interpolation, adjoint):
    """Reduced-precision storage (bf16 params + coefficients) flows through
    every fixed-grid solve path — paired rectilinear, unpaired linear,
    adjoint and direct backprop: scan carries and vjp cotangents keep the
    storage dtype (the f32 grid times must not promote them), gradients
    come back bf16 and finite, and the loss sits within reduced-precision
    tolerance of f32."""
    import optax

    from online_neural_cdes_tpu.models.ncde import NeuralCDE

    B, L, C, H = 8, 12, 4, 8
    rng = np.random.default_rng(0)
    x = rng.normal(size=(B, L, C)).astype(np.float32)
    x[:, :, 0] = np.arange(L)
    if interpolation == "rectilinear":
        coeffs32 = linear_interpolation_coeffs(jnp.asarray(x), rectilinear=0)
    else:
        coeffs32 = linear_interpolation_coeffs(jnp.asarray(x))
    labels = jnp.asarray(rng.integers(0, 2, size=(B, L)).astype(np.float32))
    model = NeuralCDE(
        input_dim=C, hidden_dim=H, output_dim=1, hidden_hidden_dim=H,
        num_layers=2, interpolation=interpolation, return_sequences=True,
        adjoint=adjoint, solver="rk4",
    )

    losses = {}
    for dtype in (jnp.float32, jnp.bfloat16):
        params = model.init(jax.random.PRNGKey(0), dtype=dtype)
        inputs = jax.tree.map(lambda c: c.astype(dtype), coeffs32)

        def loss_fn(p):
            logits = model.apply(p, inputs)[..., 0]
            per = optax.sigmoid_binary_cross_entropy(
                logits.astype(jnp.float32), labels)
            return per.mean()

        v, g = jax.jit(jax.value_and_grad(loss_fn))(params)
        leaves = jax.tree.leaves(g)
        assert {str(l.dtype) for l in leaves} == {dtype.__name__}
        assert all(bool(jnp.isfinite(l.astype(jnp.float32)).all())
                   for l in leaves)
        losses[dtype.__name__] = float(v)
    assert abs(losses["float32"] - losses["bfloat16"]) < 0.06, losses
