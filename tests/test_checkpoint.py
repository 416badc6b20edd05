"""Checkpoint round-trip tests (orbax and npz fallback)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from online_neural_cdes_tpu.models.ncde import NeuralCDE
from online_neural_cdes_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


def _params():
    model = NeuralCDE(input_dim=3, hidden_dim=4, output_dim=2)
    return model, model.init(jax.random.PRNGKey(0))


@pytest.mark.smoke
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


def test_npz_roundtrip_bfloat16(tmp_path):
    """bf16 leaves (the TPU training dtype) must survive the npz fallback:
    previously np.savez stored them as opaque void records that poisoned
    any later jnp.asarray."""
    state = {"w": jnp.arange(6, dtype=jnp.bfloat16).reshape(2, 3) / 7}
    path = save_checkpoint(str(tmp_path / "bf16_ckpt"), state, use_orbax=False)
    restored = load_checkpoint(path, state)
    assert restored["w"].dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(restored["w"], np.float32),
                                  np.asarray(state["w"], np.float32))


def test_explicit_orbax_request_does_not_silently_fall_back(monkeypatch, tmp_path):
    import online_neural_cdes_tpu.utils.checkpoint as ckpt

    monkeypatch.setattr(ckpt, "_try_orbax", lambda: None)
    with pytest.raises(RuntimeError, match="orbax"):
        ckpt.save_checkpoint(str(tmp_path / "x"), {"a": np.zeros(2)}, use_orbax=True)
