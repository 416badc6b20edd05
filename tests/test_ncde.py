"""NeuralCDE model tests: no-NaN forward fuzzing across the config space
(the analogue of reference src/tests/test_ncde.py:8-41) plus an end-to-end
Brownian-motion training run (the minimum slice of SURVEY.md §7.4)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from online_neural_cdes_tpu.data.toy import brownian_motion_data
from online_neural_cdes_tpu.models.ncde import NeuralCDE
from online_neural_cdes_tpu.ops.interpolation import (
    hermite_cubic_coefficients_with_backward_differences,
    linear_interpolation_coeffs,
    natural_cubic_coeffs,
)

B, L, C, H = 4, 6, 3, 8


def _coeffs_for(interpolation, x):
    if interpolation in ("linear", "linear_cubic_smoothing", "linear_quintic_smoothing"):
        return linear_interpolation_coeffs(x)
    if interpolation == "rectilinear":
        return linear_interpolation_coeffs(x, rectilinear=0)
    if interpolation == "cubic":
        return natural_cubic_coeffs(x)
    if interpolation == "hermite":
        return hermite_cubic_coefficients_with_backward_differences(x)
    raise ValueError(interpolation)


def _run_model(model, key=0, static=None):
    rng = np.random.default_rng(key)
    x = rng.normal(size=(B, L, C)).astype(np.float32)
    x[:, :, 0] = np.arange(L)  # time channel for rectilinear
    x[1, 2, 1] = np.nan        # some missingness
    coeffs = _coeffs_for(model.interpolation, jnp.asarray(x))
    params = model.init(jax.random.PRNGKey(0))
    inputs = coeffs if static is None else (static, coeffs)
    return model.apply(params, inputs)


@pytest.mark.parametrize("vector_field", ["original", "gru", "minimal"])
@pytest.mark.parametrize("vf_type", ["matmul", "evaluate", "derivative"])
def test_field_combinations_forward(vector_field, vf_type):
    model = NeuralCDE(
        input_dim=C, hidden_dim=H, output_dim=2, hidden_hidden_dim=12,
        num_layers=2, vector_field=vector_field, vector_field_type=vf_type,
        adjoint=False, solver="rk4",
    )
    out = _run_model(model)
    assert out.shape == (B, 2)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("vector_field,sparsity", [("sparse", 0.5), ("low-rank", 0.4)])
def test_sparse_fields_forward(vector_field, sparsity):
    """The reference keeps these commented out of its registry but tests
    them (src/tests/test_ncde.py:14-15); first-class here."""
    model = NeuralCDE(
        input_dim=C, hidden_dim=H, output_dim=2, sparsity=sparsity,
        vector_field=vector_field, adjoint=False, solver="rk4",
    )
    out = _run_model(model)
    assert out.shape == (B, 2)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize(
    "interpolation,eps",
    [("linear", None), ("rectilinear", None), ("cubic", None), ("hermite", None),
     ("linear_cubic_smoothing", 0.2), ("linear_quintic_smoothing", 0.2)],
)
def test_interpolation_schemes_forward(interpolation, eps):
    model = NeuralCDE(
        input_dim=C, hidden_dim=H, output_dim=1, interpolation=interpolation,
        interpolation_eps=eps, adjoint=False, solver="rk4",
    )
    out = _run_model(model)
    assert out.shape == (B, 1)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.smoke
def test_return_sequences_and_rectilinear_filtering():
    model = NeuralCDE(
        input_dim=C, hidden_dim=H, output_dim=2, interpolation="rectilinear",
        return_sequences=True, adjoint=False, solver="rk4",
    )
    out = _run_model(model)
    # Rectilinear doubles length to 2L-1; ::2 filtering returns L outputs
    # (reference ncde.py:200-212).
    assert out.shape == (B, L, 2)

    model_full = NeuralCDE(
        input_dim=C, hidden_dim=H, output_dim=2, interpolation="rectilinear",
        return_sequences=True, return_filtered_rectilinear=False,
        adjoint=False, solver="rk4",
    )
    assert _run_model(model_full).shape == (B, 2 * L - 1, 2)


def test_static_features_and_initial_variants():
    static = jnp.asarray(np.random.default_rng(5).normal(size=(B, 4)), jnp.float32)
    for use_initial in (True, False):
        model = NeuralCDE(
            input_dim=C, hidden_dim=H, output_dim=2, static_dim=4,
            use_initial=use_initial, adjoint=False, solver="rk4",
        )
        out = _run_model(model, static=static)
        assert out.shape == (B, 2)
        assert np.isfinite(np.asarray(out)).all()

    model = NeuralCDE(
        input_dim=C, hidden_dim=H, output_dim=2, use_initial=False,
        adjoint=False, solver="rk4",
    )
    assert _run_model(model).shape == (B, 2)


def test_dopri5_bounded_step_forward_with_stats():
    model = NeuralCDE(
        input_dim=C, hidden_dim=H, output_dim=2, solver="dopri5", adjoint=False,
    )
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(B, L, C)), jnp.float32)
    coeffs = linear_interpolation_coeffs(x)
    params = model.init(jax.random.PRNGKey(0))
    out, stats = model.apply(params, coeffs, return_stats=True)
    assert out.shape == (B, 2)
    # min_step=0.5 on a length-(L-1) interval bounds accepted steps.
    assert int(stats["accepted"]) <= 2 * (L - 1) + 2
    assert int(stats["nfe"]) >= 6


def test_end_to_end_brownian_motion_training():
    """Minimum end-to-end slice: rectilinear NCDE + rk4 + Adam learns the
    BM sign task well above chance (sim_bm_toy_example semantics)."""
    key = jax.random.PRNGKey(42)
    x, y = brownian_motion_data(key, num_paths=192, n_points=3)
    coeffs = linear_interpolation_coeffs(x, rectilinear=0)

    model = NeuralCDE(
        input_dim=2, hidden_dim=8, output_dim=1, hidden_hidden_dim=32,
        num_layers=2, interpolation="rectilinear", return_sequences=True,
        adjoint=True, solver="rk4",
    )
    params = model.init(jax.random.PRNGKey(0))
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    def loss_fn(p):
        logits = model.apply(p, coeffs)[..., 0]  # (B, L)
        return optax.sigmoid_binary_cross_entropy(logits, y).mean()

    @jax.jit
    def step(p, s):
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(grads, s)
        return optax.apply_updates(p, updates), s, loss

    losses = []
    for _ in range(45):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))

    logits = model.apply(params, coeffs)[..., 0]
    acc = float(((jax.nn.sigmoid(logits[:, -1]) > 0.5) == (y[:, -1] > 0.5)).mean())
    assert losses[-1] < losses[0] * 0.75, (losses[0], losses[-1])
    assert acc > 0.8, acc


def test_dopri5_matches_fine_rk4_at_tolerance():
    """Numerics parity across solvers: the bounded-step dopri5 forward must
    match a fine fixed-grid solve at its tolerances (the BASELINE.md
    'numerics matching at solver tolerance' contract)."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(4, 8, C)) * 0.5, jnp.float32)
    coeffs = linear_interpolation_coeffs(x)
    kw = dict(input_dim=C, hidden_dim=H, output_dim=2, hidden_hidden_dim=16,
              num_layers=2, adjoint=False, return_sequences=True)
    m_fine = NeuralCDE(solver="rk4", **kw)
    m_adpt = NeuralCDE(solver="dopri5", **kw)
    params = m_fine.init(jax.random.PRNGKey(0))
    # rk4 with 32 substeps as the truth.
    import online_neural_cdes_tpu.ops.cdeint as cdeint_mod
    from online_neural_cdes_tpu.models.ncde import make_spline

    spline = make_spline("linear", coeffs)
    field = m_fine.field

    def func(t, z, fp):
        return field.apply(fp, t, z)

    h0 = m_fine._setup_h0(params, coeffs)[1]
    truth = cdeint_mod.cdeint(
        spline, func, h0, spline.grid_points, params["field"], adjoint=False,
        method="rk4", options={"substeps": 32},
    )
    # Unbounded dopri5 at tight tolerance: parity at solver tolerance.
    tight = cdeint_mod.cdeint(
        spline, func, h0, spline.grid_points, params["field"], adjoint=False,
        method="dopri5", atol=1e-7, rtol=1e-6,
    )
    # f32 + quartic dense output across linear kinks: ~1e-4 absolute.
    np.testing.assert_allclose(
        np.asarray(tight), np.asarray(truth), rtol=5e-3, atol=5e-4
    )
    # The paper's bounded-step variant trades accuracy for a hard NFE cap
    # (force-accepted steps at dt<=min_step): stays within a loose bound.
    bounded = cdeint_mod.cdeint(
        spline, func, h0, spline.grid_points, params["field"], adjoint=False,
        method="dopri5", atol=1e-5, rtol=1e-3, options={"min_step": 0.5},
    )
    assert float(jnp.max(jnp.abs(bounded - truth))) < 0.2


@pytest.mark.parametrize("solver", ["dopri8", "implicit_adams", "adaptive_heun"])
def test_ncde_full_solver_registry(solver):
    """The reference NeuralCDE accepts any torchdiffeq method string
    (ncde.py:129-134 just maps presets); the TPU build must too.  Results
    agree with rk4 at modest tolerance on a SMOOTH (cubic) control —
    multistep history and low-order adaptive steps are only meaningful
    when the control derivative has no kinks."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(4, 6, 3)) * 0.3, jnp.float32)
    coeffs = natural_cubic_coeffs(x)
    kw = dict(input_dim=3, hidden_dim=8, output_dim=2, hidden_hidden_dim=16,
              num_layers=1, interpolation="cubic", adjoint=False)
    m = NeuralCDE(solver=solver, **kw)
    m_ref = NeuralCDE(solver="rk4", **kw)
    params = m.init(jax.random.PRNGKey(0))
    out = m.apply(params, coeffs)
    out_ref = m_ref.apply(params, coeffs)
    assert np.isfinite(np.asarray(out)).all()
    # One step per knot is coarse for the low-order/multistep methods;
    # agreement is sanity-level here (convergence is asserted at the
    # cdeint level below with a finer grid).
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               rtol=0.5, atol=5e-2)


def test_cdeint_adams_converges_to_rk4_on_smooth_control():
    """implicit_adams through the generic cdeint path converges to the
    fine-rk4 solution as step_size shrinks (smooth cubic control)."""
    from online_neural_cdes_tpu.models.ncde import make_spline
    from online_neural_cdes_tpu.ops.cdeint import cdeint

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(4, 6, 3)) * 0.3, jnp.float32)
    spline = make_spline("cubic", natural_cubic_coeffs(x))
    model = NeuralCDE(input_dim=3, hidden_dim=8, output_dim=2,
                      hidden_hidden_dim=16, num_layers=1,
                      interpolation="cubic", adjoint=False)
    field = model.field
    params = model.init(jax.random.PRNGKey(0))["field"]

    def func(t, z, fp):
        return field.apply(fp, t, z)

    z0 = jnp.zeros((4, 8), jnp.float32)
    t = spline.interval
    ref = cdeint(spline, func, z0, t, params, adjoint=False, method="rk4",
                 options={"step_size": 0.125})
    errs = []
    for h in (1.0, 0.25):
        out = cdeint(spline, func, z0, t, params, adjoint=False,
                     method="implicit_adams", options={"step_size": h})
        errs.append(float(jnp.max(jnp.abs(out - ref))))
    assert errs[1] < errs[0] / 4, errs      # converging (measured ~40x)
    assert errs[1] < 1e-2, errs             # and accurate at h=0.25 (f32)


def test_ncde_scipy_solver_host_fallback():
    """NeuralCDE(solver='scipy_solver') — eager host fallback, matching rk4
    at tolerance (reference accepts any torchdiffeq method string)."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(4, 6, 3)) * 0.3, jnp.float32)
    coeffs = natural_cubic_coeffs(x)
    kw = dict(input_dim=3, hidden_dim=8, output_dim=2, hidden_hidden_dim=16,
              num_layers=1, interpolation="cubic", adjoint=False)
    m = NeuralCDE(solver="scipy_solver", **kw)
    m_ref = NeuralCDE(solver="rk4", **kw)
    params = m.init(jax.random.PRNGKey(0))
    out = m.apply(params, coeffs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(m_ref.apply(params, coeffs)),
                               rtol=5e-2, atol=1e-2)


def test_fuzz_adjoint_vs_direct_gradients_across_configs():
    """Randomised NCDE configurations (interpolation x vector field x
    field type): adjoint and straight-through gradients of the training
    loss must agree on every sampled config — catches cross-config wiring
    faults (sign errors, dropped leaves, mis-routed cotangents) the
    targeted gradient tests (one config each) cannot.  Tolerance is
    norm-based at 10%: the presets run one RK4 step per knot, where the
    adjoint's discretisation gap is a few percent (verified to vanish
    quartically under sub-stepping: rel gap 7e-3 -> 3e-4 -> 4e-6 at
    substeps 1/2/4 on this exact setup); wiring faults — sign errors,
    dropped leaves, mis-routed cotangents — produce >=100% disagreement."""
    rng = np.random.default_rng(0)
    configs = [
        ("linear", "original", "matmul"),
        ("rectilinear", "original", "matmul"),
        ("cubic", "gru", "matmul"),
        ("hermite", "minimal", "matmul"),
        ("linear", "original", "evaluate"),
        ("rectilinear", "original", "derivative"),
    ]
    B, L, C, H = 6, 6, 3, 5
    for interp, field, vf_type in configs:
        x = np.asarray(rng.normal(size=(B, L, C)) * 0.15, np.float64)
        x[:, :, 0] = np.arange(L)
        coeffs = {
            "linear": lambda a: linear_interpolation_coeffs(jnp.asarray(a)),
            "rectilinear": lambda a: linear_interpolation_coeffs(
                jnp.asarray(a), rectilinear=0),
            "cubic": lambda a: natural_cubic_coeffs(jnp.asarray(a)),
            "hermite": lambda a: hermite_cubic_coefficients_with_backward_differences(
                jnp.asarray(a)),
        }[interp](x)
        labels = jnp.asarray(rng.normal(size=(B,)))

        def make(adjoint):
            model = NeuralCDE(
                input_dim=C, hidden_dim=H, output_dim=1, hidden_hidden_dim=7,
                num_layers=1, interpolation=interp, vector_field=field,
                vector_field_type=vf_type, adjoint=adjoint, solver="rk4",
                return_sequences=False,
            )

            def loss(p):
                return jnp.mean((model.apply(p, coeffs)[..., 0] - labels) ** 2)

            return model, loss

        model_d, loss_d = make(False)
        _, loss_a = make(True)
        params = model_d.init(jax.random.PRNGKey(3))
        g_d = jax.grad(loss_d)(params)
        g_a = jax.grad(loss_a)(params)
        def close(a, b):
            a, b = np.asarray(a), np.asarray(b)
            gap = np.linalg.norm(a - b)
            scale = np.linalg.norm(b)
            assert gap <= 0.10 * scale + 1e-7, (
                f"{interp}/{field}/{vf_type}: |Δg|={gap:.3e} vs |g|={scale:.3e}"
            )

        jax.tree.map(close, g_d, g_a)
