"""Log-ODE transform tests: BCH closed-form oracles, refinement invariance,
channel counting (reference test_log_ode.py's role, without the signatory
dependency)."""

import pytest
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


@pytest.mark.smoke
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
    np.testing.assert_allclose(np.asarray(out)[:, 0, :C], x[:, 0], atol=1e-6)
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


def test_lyndon_count_matches_necklace_formula():
    """#Lyndon words of length n over C letters = (1/n) sum_{d|n} mu(d) C^{n/d}."""
    from online_neural_cdes_tpu.ops.logsig import lyndon_words

    def mobius(n):
        if n == 1:
            return 1
        p, m, cnt = 2, n, 0
        while p * p <= m:
            if m % p == 0:
                m //= p
                if m % p == 0:
                    return 0
                cnt += 1
            p += 1
        if m > 1:
            cnt += 1
        return -1 if cnt % 2 else 1

    def necklace(C, n):
        divs = [d for d in range(1, n + 1) if n % d == 0]
        return sum(mobius(d) * C ** (n // d) for d in divs) // n

    for C in (2, 3):
        for depth in (4, 5):
            words = lyndon_words(C, depth)
            for n in range(1, depth + 1):
                got = sum(1 for w in words if len(w) == n)
                assert got == necklace(C, n), (C, n, got)


def test_depth4_log_exp_roundtrip():
    """exp(logsig) must reproduce the Chen-folded signature at depth 4 —
    an independent check of the generic truncated tensor log."""
    from online_neural_cdes_tpu.ops.logsig import (
        _chen,
        _mul_nounit,
        _segment_signature,
        _tensor_log,
    )

    rng = np.random.default_rng(0)
    C, depth = 3, 4
    deltas = jnp.asarray(rng.normal(size=(5, C)) * 0.5, jnp.float64)

    sig = [jnp.zeros((C ** k,), jnp.float64) for k in range(1, depth + 1)]
    for d in deltas:
        sig = _chen(sig, _segment_signature(d, depth, C), depth, C)

    log = _tensor_log(sig, depth, C)

    # exp(L) - 1 = sum_m L^m / m!
    acc = [jnp.array(l) for l in log]
    power = log
    fact = 1.0
    for m in range(2, depth + 1):
        power = _mul_nounit(power, log, depth, C)
        fact *= m
        acc = [a + p / fact for a, p in zip(acc, power)]
    for a, s in zip(acc, sig):
        np.testing.assert_allclose(np.asarray(a), np.asarray(s),
                                   rtol=1e-10, atol=1e-12)


def test_depth4_linear_path_logsig_is_increment_only():
    """A straight-line path's log-signature is its increment: all Lyndon
    coordinates of length >= 2 vanish (at any depth)."""
    from online_neural_cdes_tpu.ops.logsig import (
        logsig_windows,
        logsignature_channels,
    )

    C, L, depth = 3, 9, 4
    t = np.arange(L, dtype=np.float32)
    # Small slopes: depth-4 tensor terms cancel to ~eps only when their
    # magnitudes stay O(1) in f32.
    x = np.stack([0.2 * t, -0.1 * t, 0.05 * t], axis=-1)[None]
    out = np.asarray(logsig_windows(jnp.asarray(x), depth, window_length=8))
    n_ch = logsignature_channels(C, depth)
    assert out.shape[-1] == n_ch
    # Single window over a straight line: level-1 coords = total increment,
    # all higher-order Lyndon coords ~ 0.
    last = out[0, -1]
    np.testing.assert_allclose(last[:C], [1.6, -0.8, 0.4], rtol=1e-5)
    np.testing.assert_allclose(last[C:], 0.0, atol=1e-5)


def test_ragged_batched_transform_matches_per_series():
    """apply_logsig_transform runs ragged corpora as ONE padded batch
    (NaN pad rows forward-fill to zero increments = Chen identity): each
    series' truncated result must equal its standalone transform."""
    import numpy as np

    from online_neural_cdes_tpu.data.loader import apply_logsig_transform

    rng = np.random.default_rng(0)
    series = [rng.normal(size=(L, 3)).astype(np.float32)
              for L in (25, 13, 19, 25, 8)]
    for s in series:
        s[rng.random(s.shape) < 0.2] = np.nan
    batched = apply_logsig_transform(np.array(series, dtype=object), 2, 4)
    for i, s in enumerate(series):
        direct = np.asarray(logsig_windows(s, 2, 4))
        assert batched[i].shape == direct.shape
        np.testing.assert_allclose(batched[i], direct, rtol=1e-5, atol=1e-5)
