"""End-to-end MIMIC-style pipeline through the real harness: synthetic
reduced_format -> task preparation -> ragged bucketed loading -> online
NCDE / GRU-D / ODE-RNN training with NaN-masked losses — the flagship
configuration (BASELINE.json config 5)."""

import numpy as np
import pytest

from online_neural_cdes_tpu.data.mimic import prepare_all, synthesize_reduced_format
from online_neural_cdes_tpu.training.experiment import run_experiment


@pytest.fixture(scope="module")
def mimic_root(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mimic_e2e")
    raw = synthesize_reduced_format(str(tmp / "reduced_format.npz"),
                                    num_patients=60, seed=3)
    prepare_all(raw, out_root=str(tmp / "processed"))
    return str(tmp / "processed")


def _base_config(model_string, interpolation, dataset="Sepsis", **model_kw):
    return {
        "dataset_name": dataset,
        "seed": 0,
        "dataset": {
            "data_loc": f"MIMIC-IV/{dataset}",
            "problem": "online" if dataset in ("Sepsis", "Ventilation") else "oneshot",
            "use_static": True,
            "interpolation": interpolation,
            "batch_size": 32,
        },
        "model": {
            "model_string": model_string,
            "hidden_dim": 8,
            "hidden_hidden_dim": 12,
            "num_layers": 1,
            "adjoint": True,
            "solver": "rk4",
            **model_kw,
        },
        "trainer": {
            "loss_str": "bce",
            "metrics": ["loss", "auc"],
            "val_metric_to_monitor": "auc",
            "max_epochs": 2,
        },
    }


@pytest.mark.smoke
def test_online_ncde_on_sepsis(mimic_root):
    results = run_experiment(_base_config("ncde", "rectilinear"), data_root=mimic_root)
    assert results["epochs_run"] == 2
    assert np.isfinite(results["test.loss"])
    assert results["nfe_per_epoch"] > 0


def test_online_ncde_adjoint_dopri5_on_sepsis(mimic_root):
    cfg = _base_config("ncde", "linear", solver="dopri5")
    results = run_experiment(cfg, data_root=mimic_root)
    assert np.isfinite(results["test.loss"])


def test_grud_on_sepsis(mimic_root):
    cfg = _base_config("gru-d", None)
    results = run_experiment(cfg, data_root=mimic_root)
    assert np.isfinite(results["test.loss"])


def test_odernn_on_mortality(mimic_root):
    cfg = _base_config("odernn", None, dataset="Mortality")
    cfg["model"]["adjoint"] = False
    cfg["trainer"]["max_epochs"] = 1
    results = run_experiment(cfg, data_root=mimic_root)
    assert np.isfinite(results["test.loss"])


@pytest.mark.parametrize("model_string", ["ncde-stacked", "ncde-attention"])
def test_composite_models_on_mortality(mimic_root, model_string):
    cfg = _base_config(model_string, "linear", dataset="Mortality")
    cfg["trainer"]["max_epochs"] = 1
    results = run_experiment(cfg, data_root=mimic_root)
    assert np.isfinite(results["test.loss"])


def test_logsig_on_ragged_mortality(mimic_root):
    """The logsig transform's ragged (object-array) branch: MIMIC-style
    variable-length stays ragged through per-series window transforms, and
    the one-shot Mortality task trains end to end on the compressed
    controls."""
    import os

    from online_neural_cdes_tpu.data.loader import Batches, load_numpy_data
    from online_neural_cdes_tpu.ops.logsig import logsignature_channels

    path = os.path.join(mimic_root, "MIMIC-IV/Mortality",
                        "improved-neural-cdes_data.npz")
    splits = load_numpy_data(path, "logsig-2-6", use_static=True,
                             problem="oneshot")
    train = splits[0]
    raw_c = np.load(path, allow_pickle=True)["temporal_data_raw"][0].shape[-1]
    n_ch = logsignature_channels(raw_c, 2)
    assert train.input_dim == n_ch
    if isinstance(train.temporal, list):
        lens = {len(t) for t in train.temporal}
        assert len(lens) > 1, "expected ragged window counts"
    (st, tp), lb = next(iter(Batches(train, batch_size=16)))
    assert tp.shape[-1] == n_ch and np.isfinite(tp).all()

    cfg = _base_config("ncde", "logsig-2-6", dataset="Mortality")
    cfg["trainer"]["max_epochs"] = 1
    results = run_experiment(cfg, data_root=mimic_root)
    assert np.isfinite(results["test.loss"])


def test_online_ncde_on_ventilation(mimic_root):
    """The fourth MIMIC task (online, 12h-shifted labels) through the
    harness — completes the 4-task training matrix."""
    cfg = _base_config("ncde", "rectilinear", dataset="Ventilation")
    cfg["trainer"]["max_epochs"] = 1
    results = run_experiment(cfg, data_root=mimic_root)
    assert np.isfinite(results["test.loss"])
    assert results["nfe_per_epoch"] > 0
