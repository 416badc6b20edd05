"""Checkpoint round-trip tests (orbax and npz fallback)."""

import jax
import jax.numpy as jnp
import numpy as np

from online_neural_cdes_tpu.models.ncde import NeuralCDE
from online_neural_cdes_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


def _params():
    model = NeuralCDE(input_dim=3, hidden_dim=4, output_dim=2)
    return model, model.init(jax.random.PRNGKey(0))


def test_npz_roundtrip(tmp_path):
    _, params = _params()
    path = save_checkpoint(str(tmp_path / "ckpt"), params, use_orbax=False)
    like = jax.tree.map(jnp.zeros_like, params)
    restored = load_checkpoint(path, like)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        restored, params,
    )


def test_npz_structure_mismatch_raises(tmp_path):
    import pytest

    from online_neural_cdes_tpu.utils.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )

    state = {"w": np.ones((2, 3)), "b": np.zeros((3,))}
    path = save_checkpoint(str(tmp_path / "ckpt"), state, use_orbax=False)
    wrong_like = {"weights": np.ones((2, 3)), "bias": np.zeros((3,))}
    with pytest.raises(ValueError, match="structure"):
        load_checkpoint(path, wrong_like)


def test_orbax_roundtrip(tmp_path):
    _, params = _params()
    path = save_checkpoint(str(tmp_path / "ckpt_orbax"), params)
    like = jax.tree.map(jnp.zeros_like, params)
    restored = load_checkpoint(path, like)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        restored, params,
    )
