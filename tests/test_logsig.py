"""Log-ODE transform tests: BCH closed-form oracles, refinement invariance,
channel counting (reference test_log_ode.py's role, without the signatory
dependency)."""

import jax.numpy as jnp
import numpy as np

from online_neural_cdes_tpu.ops.logsig import (
    _segment_signature,
    _tensor_log,
    _window_logsig,
    logsig_windows,
    logsignature_channels,
    logsignature_windows,
    lyndon_words,
)


def test_channel_counts():
    # Witt-number channel counts: C, (C^2-C)/2, (C^3-C)/3.
    assert logsignature_channels(2, 1) == 2
    assert logsignature_channels(2, 2) == 3
    assert logsignature_channels(2, 3) == 5
    assert logsignature_channels(3, 3) == 3 + 3 + 8
    assert len(lyndon_words(4, 3)) == 4 + 6 + 20


def _bch_two_segments(a, b):
    """log(exp(a) exp(b)) to depth 3 by Baker-Campbell-Hausdorff:
    a+b + [a,b]/2 + ([a,[a,b]] + [b,[b,a]])/12 — an independent oracle."""
    C = len(a)
    l1 = a + b
    comm = np.einsum("i,j->ij", a, b) - np.einsum("i,j->ij", b, a)
    l2 = 0.5 * comm

    def bracket_vec_mat(v, m):  # [v, m] with m a level-2 tensor
        return np.einsum("i,jk->ijk", v, m) - np.einsum("jk,i->jki", m, v)

    l3 = (bracket_vec_mat(a, comm) + bracket_vec_mat(b, -comm)) / 12.0
    return l1, l2, l3


def test_two_segment_bch_oracle():
    rng = np.random.default_rng(0)
    C = 3
    a = rng.normal(size=C)
    b = rng.normal(size=C)
    deltas = jnp.asarray(np.stack([a, b])[None])  # (1, 2, C)

    words = lyndon_words(C, 3)
    idx2 = np.asarray([w[0] * C + w[1] for w in words if len(w) == 2])
    idx3 = np.asarray([w[0] * C * C + w[1] * C + w[2] for w in words if len(w) == 3])
    got = np.asarray(
        _window_logsig(deltas, 3, {2: idx2, 3: idx3})
    )[0]

    l1, l2, l3 = _bch_two_segments(a, b)
    expected = np.concatenate([l1, l2.reshape(-1)[idx2], l3.reshape(-1)[idx3]])
    np.testing.assert_allclose(got, expected, atol=1e-10)


def test_refinement_invariance():
    """Subdividing a linear segment must not change the signature (Chen)."""
    rng = np.random.default_rng(1)
    C = 2
    delta = rng.normal(size=C)
    one = jnp.asarray(delta[None, None])                     # (1, 1, C)
    many = jnp.asarray(np.tile(delta[None] / 8, (8, 1))[None])  # (1, 8, C)
    idx = {2: np.asarray([1]), 3: np.asarray([C + 1, 2 * C + 3 - 3])}
    words = lyndon_words(C, 3)
    idx2 = np.asarray([w[0] * C + w[1] for w in words if len(w) == 2])
    idx3 = np.asarray([w[0] * C * C + w[1] * C + w[2] for w in words if len(w) == 3])
    widx = {2: idx2, 3: idx3}
    a = np.asarray(_window_logsig(one, 3, widx))
    b = np.asarray(_window_logsig(many, 3, widx))
    np.testing.assert_allclose(a, b, atol=1e-9)
    # A single linear segment has vanishing higher-order log terms.
    np.testing.assert_allclose(a[0, C:], 0.0, atol=1e-10)


def test_logsig_windows_shapes_and_first_row():
    rng = np.random.default_rng(2)
    B, L, C = 3, 13, 2
    x = rng.normal(size=(B, L, C)).astype(np.float64)
    x[0, 4, 1] = np.nan  # missing data handled by linear infill
    out = logsig_windows(jnp.asarray(x), depth=2, window_length=4.0)
    n_win = int(np.ceil((L - 1) / 4.0))
    assert out.shape == (B, n_win + 1, logsignature_channels(C, 2))
    # First row is the initial value padded with zeros (log_ode.py:53-55).
    np.testing.assert_allclose(np.asarray(out)[1:, 0, :C], x[1:, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(out)[:, 0, C:], 0.0, atol=1e-12)


def test_depth1_is_cumulative_increments():
    """Depth-1 logsig windows are just the path sampled at window ends."""
    rng = np.random.default_rng(3)
    B, L, C = 2, 9, 3
    x = rng.normal(size=(B, L, C))
    out = np.asarray(logsig_windows(jnp.asarray(x), depth=1, window_length=2.0))
    # cumsum(x0, increments over windows) = x at window boundaries.
    np.testing.assert_allclose(out[:, 1:], x[:, 2::2], atol=1e-6)


def test_deprecated_version_returns_times_and_scales():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, 7, 2))
    vals, times = logsignature_windows(jnp.asarray(x), depth=2, window_length=3.0)
    assert times.shape == (3,)
    np.testing.assert_allclose(np.asarray(times), [0.0, 3.0, 6.0])
