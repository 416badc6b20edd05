"""Interpolation oracle tests.

Mirrors the reference's test strategy (SURVEY.md §4): scipy-spline oracles,
knot-reconstruction with random + NaN data, and the rectilinear-preparation
golden test (reference modules/torchcde/test/test_linear_interpolation.py,
test_natural_cubic_spline.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.interpolate

from online_neural_cdes_tpu.ops import fill
from online_neural_cdes_tpu.ops.interpolation import (
    CubicSpline,
    LinearInterpolation,
    SmoothLinearInterpolation,
    hermite_cubic_coefficients_with_backward_differences,
    linear_interpolation_coeffs,
    linear_rectilinear_hybrid,
    natural_cubic_coeffs,
    prepare_rectilinear_interpolation,
)


def test_forward_fill():
    x = jnp.array([[np.nan, 1.0, np.nan, 3.0, np.nan]]).T  # (5, 1)
    out = fill.forward_fill(x, axis=-2)
    expected = np.array([[np.nan, 1.0, 1.0, 3.0, 3.0]]).T
    np.testing.assert_array_equal(np.asarray(out), expected)


@pytest.mark.smoke
def test_linear_fill_interior_and_ends():
    t = jnp.arange(5.0)
    x = jnp.array([np.nan, 1.0, np.nan, 5.0, np.nan])[:, None]
    out = np.asarray(fill.linear_fill(x, t=t, axis=-2))[:, 0]
    np.testing.assert_allclose(out, [1.0, 1.0, 3.0, 5.0, 5.0])


def test_linear_fill_all_nan_is_zero():
    x = jnp.full((4, 2), np.nan)
    out = np.asarray(fill.linear_fill(x, axis=-2))
    np.testing.assert_array_equal(out, np.zeros((4, 2)))


def test_tridiagonal_solve_vs_numpy():
    rng = np.random.default_rng(0)
    n = 17
    d = rng.uniform(2.0, 3.0, n)
    u = rng.uniform(-1.0, 1.0, n - 1)
    l = rng.uniform(-1.0, 1.0, n - 1)
    b = rng.normal(size=(4, n))
    A = np.diag(d) + np.diag(u, 1) + np.diag(l, -1)
    expected = np.linalg.solve(A, b.T).T
    got = fill.tridiagonal_solve(jnp.asarray(b), jnp.asarray(u), jnp.asarray(d), jnp.asarray(l))
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-10)


def test_rectilinear_preparation_golden():
    """Docstring example of reference interpolation_linear.py:98-105."""
    t1, t2, t3 = 0.0, 1.0, 2.0
    x1, x3 = 5.0, 7.0
    data = jnp.array([[t1, x1], [t2, np.nan], [t3, x3]])[None]
    rect = np.asarray(prepare_rectilinear_interpolation(data, 0))[0]
    expected = np.array(
        [[t1, x1], [t2, x1], [t2, x1], [t3, x1], [t3, x3]]
    )
    np.testing.assert_allclose(rect, expected)


def test_linear_interpolation_reconstructs_knots():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(3, 11, 4)).astype(np.float64)
    coeffs = linear_interpolation_coeffs(jnp.asarray(x))
    X = LinearInterpolation.create(coeffs)
    for i in [0, 3, 10]:
        np.testing.assert_allclose(np.asarray(X.evaluate(float(i))), x[:, i], atol=1e-12)
    # Midpoint is the mean of neighbours.
    np.testing.assert_allclose(
        np.asarray(X.evaluate(2.5)), 0.5 * (x[:, 2] + x[:, 3]), atol=1e-12
    )
    # Derivative is the slope of the containing piece.
    np.testing.assert_allclose(
        np.asarray(X.derivative(2.5)), x[:, 3] - x[:, 2], atol=1e-12
    )


def test_linear_interpolation_with_nans_matches_fill():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 9, 3))
    x[0, 1:4, 0] = np.nan
    x[1, 0, 1] = np.nan
    x[1, 8, 2] = np.nan
    x[0, :, 2] = np.nan  # entire channel missing
    coeffs = np.asarray(linear_interpolation_coeffs(jnp.asarray(x)))
    assert np.isfinite(coeffs).all()
    # Observed values unchanged.
    obs = np.isfinite(x)
    np.testing.assert_allclose(coeffs[obs], x[obs])
    # Interior NaN got the straight line between its neighbours.
    expected = x[0, 0, 0] + (x[0, 4, 0] - x[0, 0, 0]) * np.arange(1, 4) / 4.0
    np.testing.assert_allclose(coeffs[0, 1:4, 0], expected, rtol=1e-12)


@pytest.mark.parametrize("length", [2, 3, 10])
def test_natural_cubic_vs_scipy(length):
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, length, 3))
    t = np.arange(length, dtype=np.float64)
    coeffs = natural_cubic_coeffs(jnp.asarray(x))
    X = CubicSpline.create(coeffs)
    query = np.linspace(0, length - 1, 37)
    got = np.asarray(X.evaluate(jnp.asarray(query)))      # (2, 37, 3)
    got_d = np.asarray(X.derivative(jnp.asarray(query)))
    for b in range(2):
        for c in range(3):
            if length == 2:
                expected = np.interp(query, t, x[b, :, c])
                np.testing.assert_allclose(got[b, :, c], expected, atol=1e-10)
                continue
            ref = scipy.interpolate.CubicSpline(t, x[b, :, c], bc_type="natural")
            np.testing.assert_allclose(got[b, :, c], ref(query), atol=1e-8)
            np.testing.assert_allclose(got_d[b, :, c], ref(query, 1), atol=1e-8)


def test_natural_cubic_linear_data_is_exact():
    """Linear data must produce an exactly linear spline (reference
    test_natural_cubic_spline.py:102)."""
    t = np.arange(8, dtype=np.float64)
    x = (2.0 * t - 3.0)[None, :, None]
    X = CubicSpline.create(natural_cubic_coeffs(jnp.asarray(x)))
    q = jnp.linspace(0.0, 7.0, 23)
    np.testing.assert_allclose(
        np.asarray(X.evaluate(q))[0, :, 0], 2.0 * np.asarray(q) - 3.0, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(X.derivative(q))[0, :, 0], np.full(23, 2.0), atol=1e-9
    )


def test_natural_cubic_with_missing_values_interpolates_observations():
    rng = np.random.default_rng(4)
    length = 12
    x = rng.normal(size=(1, length, 2))
    x[0, [2, 3, 7], 0] = np.nan
    x[0, [0, 11], 1] = np.nan
    coeffs = natural_cubic_coeffs(jnp.asarray(x))
    assert np.isfinite(np.asarray(coeffs)).all()
    X = CubicSpline.create(coeffs)
    t = np.arange(length, dtype=np.float64)
    for c in range(2):
        obs = np.isfinite(x[0, :, c])
        got = np.asarray(X.evaluate(jnp.asarray(t[obs])))[0, :, c]
        np.testing.assert_allclose(got, x[0, obs, c], atol=1e-8)
        # And matches scipy's natural spline through the observed knots.
        ref = scipy.interpolate.CubicSpline(t[obs], x[0, obs, c], bc_type="natural")
        interior = (t >= t[obs][0]) & (t <= t[obs][-1])
        q = t[interior]
        np.testing.assert_allclose(
            np.asarray(X.evaluate(jnp.asarray(q)))[0, :, c], ref(q), atol=1e-8
        )


def test_hermite_cubic_backward_differences():
    rng = np.random.default_rng(5)
    length = 9
    x = rng.normal(size=(2, length, 3))
    coeffs = hermite_cubic_coefficients_with_backward_differences(jnp.asarray(x))
    X = CubicSpline.create(coeffs)
    # Knot reconstruction.
    q = jnp.arange(float(length))
    np.testing.assert_allclose(np.asarray(X.evaluate(q)), x, atol=1e-10)
    # Causality: piece i must not depend on any x[j] for j > i+1.
    x2 = x.copy()
    x2[:, 5:, :] = 99.0
    X2 = CubicSpline.create(
        hermite_cubic_coefficients_with_backward_differences(jnp.asarray(x2))
    )
    q_early = jnp.linspace(0.0, 4.0, 11)
    np.testing.assert_allclose(
        np.asarray(X.evaluate(q_early)), np.asarray(X2.evaluate(q_early)), atol=1e-12
    )
    # Left derivative of piece i equals the backward difference.
    np.testing.assert_allclose(
        np.asarray(X.derivative(3.0)), x[:, 3] - x[:, 2], atol=1e-10
    )


def test_smooth_linear_interpolation_matches_linear_outside_eps():
    rng = np.random.default_rng(6)
    x = rng.normal(size=(2, 7, 3))
    coeffs = linear_interpolation_coeffs(jnp.asarray(x))
    eps = 0.2
    Xs = SmoothLinearInterpolation.create(coeffs, gradient_matching_eps=eps)
    Xl = LinearInterpolation.create(coeffs)
    # Outside matching regions the two agree.
    for t in [0.05, 0.5, 1.9, 3.75, 5.5]:
        np.testing.assert_allclose(
            np.asarray(Xs.evaluate(t)), np.asarray(Xl.evaluate(t)), atol=1e-10
        )
    # At the end of a matching region the values and derivatives line up with
    # the linear piece (C1 matching).
    t_end = 2.0 + eps
    np.testing.assert_allclose(
        np.asarray(Xs.evaluate(t_end)), np.asarray(Xl.evaluate(t_end)), atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(Xs.derivative(t_end)), np.asarray(Xl.derivative(t_end)), atol=1e-7
    )
    # At the start of the region the derivative matches the previous piece.
    np.testing.assert_allclose(
        np.asarray(Xs.derivative(2.0)), np.asarray(Xl.derivative(1.5)), atol=1e-8
    )


def test_smooth_quintic_matches_second_derivatives():
    rng = np.random.default_rng(7)
    x = rng.normal(size=(1, 6, 2))
    coeffs = linear_interpolation_coeffs(jnp.asarray(x))
    eps = 0.3
    Xq = SmoothLinearInterpolation.create(
        coeffs, gradient_matching_eps=eps, match_second_derivatives=True
    )
    Xl = LinearInterpolation.create(coeffs)
    np.testing.assert_allclose(
        np.asarray(Xq.evaluate(2.0 + eps)), np.asarray(Xl.evaluate(2.0 + eps)), atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(Xq.derivative(2.0)), np.asarray(Xl.derivative(1.5)), atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(Xq.derivative(2.0 + eps)), np.asarray(Xl.derivative(2.5)), atol=1e-7
    )


def test_linear_rectilinear_hybrid_golden():
    """Golden test in the spirit of reference src/tests/test_interpolation.py:
    dense channel linearly interpolated + sparse channel compressed to its
    change points."""
    t = np.arange(4.0)
    dense = np.array([0.0, 1.0, 2.0, 3.0])
    sparse = np.array([5.0, np.nan, np.nan, 6.0])
    data = np.stack([t, dense, sparse], axis=-1)[None]
    out = linear_rectilinear_hybrid(data, rectilinear_indices=[2], time_index=0)
    # Rows with no time/sparse change are dropped: the only sparse change is
    # at t=3 -> rows: start, each time change, and the (3, ., new) update.
    assert out.shape[0] == 1
    times = out[0, :, 0]
    assert (np.diff(times) >= 0).all()
    # Sparse channel only changes at its observation.
    sparse_out = out[0, :, 2]
    assert set(np.unique(sparse_out)) == {5.0, 6.0}


def test_interpolation_pytree_flows_through_jit():
    x = jnp.asarray(np.random.default_rng(8).normal(size=(2, 6, 3)))
    X = LinearInterpolation.create(linear_interpolation_coeffs(x))

    @jax.jit
    def f(spline, t):
        return spline.evaluate(t).sum()

    assert np.isfinite(float(f(X, 2.3)))


def test_fuzz_nan_patterns_match_per_path_references():
    """Randomised NaN masks (varying density, leading/trailing gaps, empty
    channels) through the vectorised compress->Thomas->re-expand cubic path
    and the linear fill, checked against per-scalar-path references — the
    reference implements these as per-path Python recursions, so per-path
    oracles are the ground truth."""
    from online_neural_cdes_tpu.ops.fill import linear_fill

    rng = np.random.default_rng(7)
    L = 12
    t = np.arange(L, dtype=np.float64)
    for trial in range(8):
        density = rng.uniform(0.1, 0.6)
        x = rng.normal(size=(L,)).astype(np.float64)
        mask = rng.random(L) < density
        if trial % 3 == 0:
            mask[: rng.integers(1, 4)] = True       # leading gap
        if trial % 3 == 1:
            mask[-rng.integers(1, 4):] = True       # trailing gap
        if mask.all():
            mask[rng.integers(0, L)] = False        # keep >= 1 observation
        x_nan = x.copy()
        x_nan[mask] = np.nan
        obs = ~mask

        # linear_fill: interior linear in t, ends copy nearest observation.
        got = np.asarray(linear_fill(jnp.asarray(x_nan)[:, None], axis=-2))[:, 0]
        first, last = np.argmax(obs), L - 1 - np.argmax(obs[::-1])
        ref = np.interp(t, t[obs], x[obs])          # np.interp clamps ends
        np.testing.assert_allclose(got, ref, atol=1e-12, err_msg=f"trial {trial}")

        # natural cubic (version=1): EVERY position before the first / after
        # the last observation becomes an observed knot holding the nearest
        # observed value (ops/interpolation.py:147-149), then a natural
        # spline runs through that knot set.
        xs_full = x.copy()
        xs_full[:first] = x[first]
        xs_full[last + 1:] = x[last]
        obs_full = obs.copy()
        obs_full[:first] = True
        obs_full[last + 1:] = True
        if obs_full.sum() < 2:
            continue
        ref_spline = scipy.interpolate.CubicSpline(
            t[obs_full], xs_full[obs_full], bc_type="natural"
        )
        coeffs = natural_cubic_coeffs(jnp.asarray(x_nan)[None, :, None])
        ours = CubicSpline.create(coeffs)
        query = rng.uniform(0, L - 1, size=16)
        np.testing.assert_allclose(
            np.asarray(jax.vmap(ours.evaluate)(jnp.asarray(query)))[:, 0, 0],
            ref_spline(query), atol=1e-8, err_msg=f"trial {trial}",
        )
