"""Native C++ preprocessing vs the JAX reference implementations: the two
paths must agree exactly on ragged NaN-laden corpora."""

import jax.numpy as jnp
import numpy as np
import pytest

from online_neural_cdes_tpu.data import native
from online_neural_cdes_tpu.models.grud import time_since_last_observation
from online_neural_cdes_tpu.ops.fill import forward_fill, linear_fill
from online_neural_cdes_tpu.ops.interpolation import (
    hermite_cubic_coefficients_with_backward_differences,
    linear_interpolation_coeffs,
    natural_cubic_coeffs,
    prepare_rectilinear_interpolation,
)

pytestmark = pytest.mark.skipif(not native.available(), reason="g++ build failed")


def _ragged(seed=0, n=6, channels=3):
    rng = np.random.default_rng(seed)
    series = []
    for _ in range(n):
        length = int(rng.integers(3, 12))
        s = rng.normal(size=(length, channels)).astype(np.float32)
        s[:, 0] = np.arange(length)  # time channel
        mask = rng.uniform(size=(length, channels - 1)) < 0.3
        s[:, 1:][mask] = np.nan
        series.append(s)
    return series


def test_forward_fill_matches():
    series = _ragged(0)
    got = native.forward_fill_ragged([s.copy() for s in series])
    for s, g in zip(series, got):
        expected = np.asarray(forward_fill(jnp.asarray(s), axis=-2))
        np.testing.assert_array_equal(g, expected)


def test_linear_fill_matches():
    series = _ragged(1)
    got = native.linear_fill_ragged([s.copy() for s in series])
    for s, g in zip(series, got):
        expected = np.asarray(linear_fill(jnp.asarray(s), axis=-2))
        np.testing.assert_allclose(g, expected, atol=1e-6)


@pytest.mark.smoke
def test_rectilinear_matches():
    series = _ragged(2)
    got = native.rectilinear_ragged(series, time_index=0)
    for s, g in zip(series, got):
        expected = np.asarray(prepare_rectilinear_interpolation(jnp.asarray(s)[None], 0))[0]
        assert g.shape == expected.shape
        # NaNs (leading unobserved) compare positionally.
        np.testing.assert_array_equal(np.isnan(g), np.isnan(expected))
        np.testing.assert_allclose(
            g[~np.isnan(g)], expected[~np.isnan(expected)], atol=1e-6
        )


def test_natural_cubic_matches():
    series = _ragged(3)
    got = native.natural_cubic_ragged(series)
    for s, g in zip(series, got):
        expected = np.asarray(natural_cubic_coeffs(jnp.asarray(s)[None]))[0]
        np.testing.assert_allclose(g, expected, atol=2e-4, rtol=1e-4)


def test_hermite_matches():
    series = _ragged(7)
    got = native.hermite_ragged(series)
    for s, g in zip(series, got):
        expected = np.asarray(
            hermite_cubic_coefficients_with_backward_differences(
                jnp.asarray(s)[None]))[0]
        np.testing.assert_allclose(g, expected, atol=2e-4, rtol=1e-4)


def test_delta_mask_matches():
    series = _ragged(4)
    deltas, masks = native.delta_mask_ragged(series)
    for s, d, m in zip(series, deltas, masks):
        ed, em = time_since_last_observation(jnp.asarray(s)[None])
        np.testing.assert_allclose(d, np.asarray(ed)[0], atol=1e-5)
        np.testing.assert_array_equal(m, np.asarray(em)[0])


def test_native_is_fast_on_many_series():
    """Sanity: 2000 ragged series preprocess in well under a second."""
    import time

    series = _ragged(5, n=2000, channels=6)
    t0 = time.perf_counter()
    native.natural_cubic_ragged(series)
    native.rectilinear_ragged(series)
    elapsed = time.perf_counter() - t0
    assert elapsed < 5.0, elapsed


def test_native_rejects_too_short_series():
    """Zero-length series made the 2L-1 / L-1 output-length arithmetic go
    negative, corrupting offsets and writing past the output buffer."""
    with pytest.raises(ValueError, match="at least 1"):
        native.rectilinear_ragged([np.zeros((3, 2), np.float32),
                                   np.zeros((0, 2), np.float32)])
    with pytest.raises(ValueError, match="at least 2"):
        native.natural_cubic_ragged([np.zeros((1, 2), np.float32)])


def test_native_rejects_mismatched_times():
    series = [np.zeros((4, 2), np.float32)]
    with pytest.raises(ValueError, match="times"):
        native.linear_fill_ragged(series, times=[np.arange(3.0)])
