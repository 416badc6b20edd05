"""Metric-registry and hyperparameter-search unit tests (reference
ingredients/metrics.py:61-141 metric set; hyperoptimize.py search budget)."""

import numpy as np

from online_neural_cdes_tpu.training.hyperopt import (
    sample_parameterization,
    sobol_parameterizations,
)
from online_neural_cdes_tpu.training.metrics import METRICS, f1, precision


def test_metric_registry_names():
    # Every name usable from dataset.json5 (reference metrics.py:61-141).
    for name in ("acc", "auc", "auprc", "precision", "f1"):
        assert name in METRICS, name


def test_precision_f1_binary_with_nan_mask():
    from sklearn.metrics import f1_score, precision_score

    rng = np.random.default_rng(0)
    logits = rng.normal(size=(6, 10, 1)).astype(np.float32)
    labels = rng.integers(0, 2, size=(6, 10)).astype(np.float32)
    labels[:, 7:] = np.nan  # finished series -> masked
    keep = ~np.isnan(labels.reshape(-1))
    pred_cls = (1 / (1 + np.exp(-logits.reshape(-1)[keep])) > 0.5).astype(np.float32)
    l = labels.reshape(-1)[keep]
    np.testing.assert_allclose(
        precision(logits, labels), precision_score(l, pred_cls, zero_division=0)
    )
    np.testing.assert_allclose(f1(logits, labels), f1_score(l, pred_cls))


def test_precision_f1_multiclass():
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(40, 4)).astype(np.float32)
    labels = rng.integers(0, 4, size=(40,)).astype(np.int64)
    p = precision(logits, labels)
    f = f1(logits, labels)
    assert 0.0 <= p <= 1.0 and 0.0 <= f <= 1.0


SPACE = [
    {"name": "model__hidden_dim", "type": "range", "bounds": [32, 256]},
    {"name": "trainer__lr", "type": "range", "bounds": [1e-4, 1e-1],
     "log_scale": True},
    {"name": "model__kind", "type": "choice", "values": ["a", "b", "c"]},
    {"name": "model__adjoint", "type": "fixed", "value": False},
]


def test_sobol_deterministic_and_typed():
    pts1 = sobol_parameterizations(SPACE, 8, seed=3)
    pts2 = sobol_parameterizations(SPACE, 8, seed=3)
    assert pts1 == pts2
    for p in pts1:
        assert isinstance(p["model__hidden_dim"], int)
        assert 32 <= p["model__hidden_dim"] <= 256
        assert 1e-4 <= p["trainer__lr"] <= 1e-1
        assert p["model__kind"] in ("a", "b", "c")
        assert p["model__adjoint"] is False
    assert sobol_parameterizations(SPACE, 8, seed=4) != pts1


def test_sobol_covers_space_better_than_uniform():
    """Scrambled Sobol with 2^k points stratifies every 1-D projection into
    2^k dyadic bins with exactly one point each — uniform sampling does not
    (its max bin occupancy exceeds 1 with overwhelming probability)."""
    n = 16
    space = [{"name": "x", "type": "range", "bounds": [0.0, 1.0]},
             {"name": "y", "type": "range", "bounds": [0.0, 1.0]}]
    pts = sobol_parameterizations(space, n, seed=0)
    for dim in ("x", "y"):
        bins = np.floor(np.array([p[dim] for p in pts]) * n).astype(int)
        assert sorted(bins.tolist()) == list(range(n)), dim

    rng = np.random.default_rng(0)
    uni = [sample_parameterization(space, rng) for _ in range(n)]
    uni_bins = np.floor(np.array([p["x"] for p in uni]) * n).astype(int)
    assert sorted(uni_bins.tolist()) != list(range(n))


def test_tpe_suggest_concentrates_near_good_cluster():
    """TPE proposals land near the low-score cluster, not the high one."""
    import numpy as np

    from online_neural_cdes_tpu.training.hyperopt import tpe_suggest

    rng = np.random.default_rng(0)
    good = rng.normal(0.2, 0.03, size=(6, 2)).clip(0, 1)
    bad = rng.normal(0.8, 0.03, size=(18, 2)).clip(0, 1)
    obs = np.concatenate([good, bad])
    scores = np.concatenate([np.zeros(6), np.ones(18)])
    proposals = np.stack([
        tpe_suggest(obs, scores, np.random.default_rng(s)) for s in range(8)
    ])
    d_good = np.linalg.norm(proposals - 0.2, axis=1)
    d_bad = np.linalg.norm(proposals - 0.8, axis=1)
    assert (d_good < d_bad).mean() >= 0.9, (d_good, d_bad)


def test_tpe_search_beats_pure_sobol_on_synthetic_objective(monkeypatch):
    """End-to-end run_hyperopt on a synthetic quadratic: the TPE stage
    refines past the best Sobol point within the same 20-trial budget."""
    import numpy as np

    import online_neural_cdes_tpu.training.hyperopt as ho

    target = {"hidden_dim": 150.0, "lr": 3e-3}

    def fake_run_experiment(cfg, **kw):
        h = float(cfg["model"]["hidden_dim"])
        lr = float(cfg["trainer"]["lr"])
        loss = ((h - target["hidden_dim"]) / 224.0) ** 2 + (
            (np.log(lr) - np.log(target["lr"])) / np.log(100.0)
        ) ** 2
        return {"val.loss": float(loss)}

    monkeypatch.setattr(ho, "run_experiment", fake_run_experiment)
    base = {
        "parameterization": [
            {"name": "model__hidden_dim", "type": "range", "bounds": [32, 256]},
            {"name": "trainer__lr", "type": "range", "bounds": [1e-4, 1e-2],
             "log_scale": True},
        ],
        "evaluation_metric": "loss",
        "total_trials": 20,
        "seed": 0,
        "model": {}, "trainer": {},
    }
    wins = 0
    for seed in (0, 1, 2):
        tpe = ho.run_hyperopt({**base, "seed": seed})
        sob = ho.run_hyperopt({**base, "seed": seed, "search": "sobol"})
        if tpe["best_score"] <= sob["best_score"]:
            wins += 1
    assert wins >= 2, wins
