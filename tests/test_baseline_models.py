"""Baseline / composite model tests: ODE-RNN, GRU-D + variant prep, plain
GRU, StackedNeuralCDE, AttentionNeuralCDE, sparsemax (the analogue of
reference src/tests/test_ncde.py:44-83 and the GRU-D prep semantics of
src/benchmarks/grud.py:186-281)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from online_neural_cdes_tpu.models import (
    RNN,
    GRUD,
    ODERNN,
    AttentionNeuralCDE,
    StackedNeuralCDE,
    prepare_gru_variant_data,
    sparsemax,
)
from online_neural_cdes_tpu.models.grud import time_since_last_observation
from online_neural_cdes_tpu.ops.interpolation import linear_interpolation_coeffs

B, L, C, H = 4, 7, 3, 8


def _x(seed=0, with_nans=True):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(B, L, C)).astype(np.float32)
    x[:, :, 0] = np.arange(L)
    if with_nans:
        x[0, 2, 1] = np.nan
        x[1, 3:5, 2] = np.nan
    return jnp.asarray(x)


@pytest.mark.parametrize("gru", [True, False])
@pytest.mark.parametrize("return_sequences", [True, False])
def test_odernn_forward(gru, return_sequences):
    model = ODERNN(
        input_dim=C, hidden_dim=H, output_dim=2, gru=gru,
        return_sequences=return_sequences,
    )
    params = model.init(jax.random.PRNGKey(0))
    out = model.apply(params, _x(with_nans=False))
    expected = (B, L, 2) if return_sequences else (B, 2)
    assert out.shape == expected
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.smoke
def test_odernn_dt_quirk_replication():
    """With non-uniform times the reference applies dts[-1] before the first
    observation (odernn.py:76-81); the quirk flag controls that."""
    times = jnp.asarray([0.0, 1.0, 3.0, 7.0])
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 4, C)), jnp.float32)
    m_q = ODERNN(input_dim=C, hidden_dim=H, output_dim=2, replicate_dt_quirk=True)
    m_c = ODERNN(input_dim=C, hidden_dim=H, output_dim=2, replicate_dt_quirk=False)
    p = m_q.init(jax.random.PRNGKey(0))
    out_q = m_q.apply(p, x, times=times)
    out_c = m_c.apply(p, x, times=times)
    assert not np.allclose(np.asarray(out_q), np.asarray(out_c))


def test_time_since_last_observation_recursion():
    x = np.full((1, 4, 2), np.nan, np.float32)
    x[0, :, 0] = [0.0, 1.0, 2.0, 3.0]       # time channel, always observed
    x[0, 0, 1] = 1.0                         # observed at t=0 only until t=3
    x[0, 3, 1] = 2.0
    delta, mask = time_since_last_observation(jnp.asarray(x))
    # Channel 1: delta = [0, 1, 2, 3]: accumulates while unobserved.
    np.testing.assert_allclose(np.asarray(delta)[0, :, 1], [0, 1, 2, 3])
    # Time channel always observed: delta = [0, 1, 1, 1].
    np.testing.assert_allclose(np.asarray(delta)[0, :, 0], [0, 1, 1, 1])
    np.testing.assert_allclose(np.asarray(mask)[0, :, 1], [1, 0, 0, 1])


@pytest.mark.parametrize("variant,channels", [
    ("gru", C), ("gru-intensity", 2 * C), ("gru-dt", 2 * C),
    ("gru-dt-intensity", 3 * C),
])
def test_gru_variant_prep_shapes(variant, channels):
    out = prepare_gru_variant_data(_x(), variant)
    assert out.shape == (B, L, channels)
    assert np.isfinite(np.asarray(out)).all()


def test_grud_forward():
    means = jnp.asarray(np.nanmean(np.asarray(_x()), axis=(0, 1)), jnp.float32)
    inputs = prepare_gru_variant_data(_x(), "gru-d", feature_means=means)
    assert inputs.shape == (B, 4, L, C)
    assert np.isfinite(np.asarray(inputs)).all()
    model = GRUD(input_dim=C, hidden_dim=H, output_dim=2)
    params = model.init(jax.random.PRNGKey(0))
    out = model.apply(params, inputs, means)
    assert out.shape == (B, 2)
    assert np.isfinite(np.asarray(out)).all()
    out_seq = GRUD(input_dim=C, hidden_dim=H, output_dim=2, return_sequences=True).apply(
        params, inputs, means
    )
    assert out_seq.shape == (B, L, 2)


def test_plain_gru_baseline():
    model = RNN(input_dim=C, hidden_dim=H, output_dim=2, return_sequences=True)
    params = model.init(jax.random.PRNGKey(0))
    out = model.apply(params, _x(with_nans=False))
    assert out.shape == (B, L, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_gru_cell_matches_torch():
    """Cell math parity with torch.nn.GRUCell."""
    import torch

    from online_neural_cdes_tpu.models.rnn import gru_cell_apply, gru_cell_init

    params = gru_cell_init(jax.random.PRNGKey(0), C, H)
    cell = torch.nn.GRUCell(C, H)
    with torch.no_grad():
        cell.weight_ih.copy_(torch.tensor(np.asarray(params["ih"]["w"]).T))
        cell.bias_ih.copy_(torch.tensor(np.asarray(params["ih"]["b"])))
        cell.weight_hh.copy_(torch.tensor(np.asarray(params["hh"]["w"]).T))
        cell.bias_hh.copy_(torch.tensor(np.asarray(params["hh"]["b"])))
    rng = np.random.default_rng(2)
    x = rng.normal(size=(B, C)).astype(np.float32)
    h = rng.normal(size=(B, H)).astype(np.float32)
    ours = np.asarray(gru_cell_apply(params, jnp.asarray(x), jnp.asarray(h)))
    theirs = cell(torch.tensor(x), torch.tensor(h)).detach().numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_stacked_ncde_forward():
    model = StackedNeuralCDE(
        input_dim=C, hidden_dims=(H, 6), output_dim=2, adjoint=False,
    )
    params = model.init(jax.random.PRNGKey(0))
    coeffs = linear_interpolation_coeffs(_x())
    out = model.apply(params, coeffs)
    assert out.shape == (B, 2)
    assert np.isfinite(np.asarray(out)).all()

    static = jnp.asarray(np.random.default_rng(3).normal(size=(B, 5)), jnp.float32)
    model_s = StackedNeuralCDE(
        input_dim=C, hidden_dims=(H, 6), output_dim=2, static_dim=5,
        static_in_all_layers=True, adjoint=False,
    )
    params_s = model_s.init(jax.random.PRNGKey(0))
    out_s = model_s.apply(params_s, (static, coeffs))
    assert out_s.shape == (B, 2)


def test_sparsemax_properties():
    rng = np.random.default_rng(4)
    z = jnp.asarray(rng.normal(size=(5, 9)) * 3.0)
    p = sparsemax(z, axis=-1)
    np.testing.assert_allclose(np.asarray(p.sum(-1)), np.ones(5), atol=1e-6)
    assert (np.asarray(p) >= 0).all()
    # Sparser than softmax on spread-out logits.
    assert (np.asarray(p) == 0).any()
    # Matches softmax limit on uniform logits.
    np.testing.assert_allclose(
        np.asarray(sparsemax(jnp.zeros((2, 4)))), np.full((2, 4), 0.25), atol=1e-7
    )


@pytest.mark.parametrize("use_sparsemax", [False, True])
def test_attention_ncde_forward(use_sparsemax):
    model = AttentionNeuralCDE(
        input_dim=C, hidden_dim=H, output_dim=2, adjoint=False,
        sparsemax=use_sparsemax,
    )
    params = model.init(jax.random.PRNGKey(0))
    coeffs = linear_interpolation_coeffs(_x())
    out = model.apply(params, coeffs)
    assert out.shape == (B, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_attention_compaction_tail_is_constant_path():
    from online_neural_cdes_tpu.models.attention import _compact_kept_states

    hidden = jnp.asarray(np.arange(B * L * H, dtype=np.float32).reshape(B, L, H))
    keep = jnp.zeros((B, L), bool).at[:, 1].set(True).at[:, 4].set(True)
    red = _compact_kept_states(hidden, keep)
    assert red.shape == (B, L, H)
    np.testing.assert_array_equal(np.asarray(red[:, 0]), np.asarray(hidden[:, 1]))
    np.testing.assert_array_equal(np.asarray(red[:, 1]), np.asarray(hidden[:, 4]))
    for i in range(2, L):
        np.testing.assert_array_equal(np.asarray(red[:, i]), np.asarray(hidden[:, 4]))
