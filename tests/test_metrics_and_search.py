"""Metric-registry and hyperparameter-search unit tests (reference
ingredients/metrics.py:61-141 metric set; hyperoptimize.py search budget)."""

import pytest
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


@pytest.mark.smoke
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
    # Per-seed outcomes are noisy (20-trial budget); require a majority
    # over 6 seeds AND a better mean — robust to the RNG stream layout.
    tpe_scores, sob_scores = [], []
    for seed in range(6):
        tpe_scores.append(ho.run_hyperopt({**base, "seed": seed})["best_score"])
        sob_scores.append(
            ho.run_hyperopt({**base, "seed": seed, "search": "sobol"})["best_score"]
        )
    wins = sum(t <= s for t, s in zip(tpe_scores, sob_scores))
    assert wins >= 4, (wins, tpe_scores, sob_scores)
    assert np.mean(tpe_scores) < np.mean(sob_scores), (tpe_scores, sob_scores)


def test_masked_loss_aligns_trailing_singleton_labels():
    """(B,1) one-shot labels (the MIMIC Mortality/LOS npz contract) must
    give the same loss as (B,) labels — regression for the (B,B)
    cross-pair broadcast that trained toward the label base rate."""
    import jax.numpy as jnp

    from online_neural_cdes_tpu.training.metrics import make_loss, masked_temporal_loss

    rng = np.random.default_rng(0)
    preds = jnp.asarray(rng.normal(size=(8, 1)).astype(np.float32))
    labels = rng.integers(0, 2, size=(8,)).astype(np.float32)
    pw = make_loss("bce")
    flat = float(masked_temporal_loss(pw, preds, jnp.asarray(labels)))
    col = float(masked_temporal_loss(pw, preds, jnp.asarray(labels[:, None])))
    assert abs(flat - col) < 1e-6
    # and the value is the genuine per-sample mean, not a (B,B) mean
    p = np.asarray(preds)[:, 0]
    ref = float(np.mean(np.maximum(p, 0) - p * labels + np.log1p(np.exp(-np.abs(p)))))
    assert abs(col - ref) < 1e-5


def test_integer_bounds_decode_to_ints_under_log_scale():
    from online_neural_cdes_tpu.training.hyperopt import sample_parameterization

    space = [{"name": "model__hidden_dim", "type": "range",
              "bounds": [32, 256], "log_scale": True}]
    rng = np.random.default_rng(0)
    for _ in range(20):
        val = sample_parameterization(space, rng)["model__hidden_dim"]
        assert isinstance(val, int) and 32 <= val <= 256, val


def test_hyperopt_resumes_from_trial_ledger(monkeypatch, tmp_path):
    """A crashed search must not restart from trial 0: trials are recorded
    as they complete, and a re-run replays the recorded history
    bit-identically without re-running experiments."""
    import online_neural_cdes_tpu.training.hyperopt as ho
    from online_neural_cdes_tpu.training.ledger import Ledger

    calls = {"n": 0}

    def fake_run_experiment(cfg, **kw):
        calls["n"] += 1
        h = float(cfg["model"]["hidden_dim"])
        return {"val.loss": (h - 150.0) ** 2}

    monkeypatch.setattr(ho, "run_experiment", fake_run_experiment)
    cfg = {
        "parameterization": [
            {"name": "model__hidden_dim", "type": "range", "bounds": [32, 256]},
        ],
        "evaluation_metric": "loss",
        "total_trials": 8,
        "seed": 0,
        "model": {}, "trainer": {},
    }
    ledger = Ledger(str(tmp_path / "ledger.jsonl"))
    first = ho.run_hyperopt(dict(cfg), ledger=ledger, run_name="hyperopt")
    assert calls["n"] == 8
    second = ho.run_hyperopt(dict(cfg), ledger=ledger, run_name="hyperopt")
    assert calls["n"] == 8, "resumed search must not re-run recorded trials"
    assert second["best_score"] == first["best_score"]
    assert second["best_parameters"] == first["best_parameters"]


def test_hyperopt_gap_in_records_rerun_only_missing(monkeypatch, tmp_path):
    """A missing trial record (lost mid-crash) re-runs ONLY that trial:
    every other record whose unit_row still matches what the search would
    regenerate from the same history replays (ADVICE r3 — the old
    prefix-only rule discarded all records after the gap, re-training
    each at full cost)."""
    import json

    import online_neural_cdes_tpu.training.hyperopt as ho
    from online_neural_cdes_tpu.training.ledger import Ledger

    calls = {"n": 0}

    def fake_run_experiment(cfg, **kw):
        calls["n"] += 1
        return {"val.loss": (float(cfg["model"]["hidden_dim"]) - 150.0) ** 2}

    monkeypatch.setattr(ho, "run_experiment", fake_run_experiment)
    cfg = {
        "parameterization": [
            {"name": "model__hidden_dim", "type": "range", "bounds": [32, 256]},
        ],
        "evaluation_metric": "loss",
        "total_trials": 6,
        "seed": 0,
        "model": {}, "trainer": {},
    }
    path = tmp_path / "ledger.jsonl"
    ledger = Ledger(str(path))
    first = ho.run_hyperopt(dict(cfg), ledger=ledger, run_name="hyperopt")
    assert calls["n"] == 6

    # Drop trial 2's record to simulate a lost write.
    lines = [json.loads(l) for l in open(path)]
    keep = [e for e in lines if e["config"].get("trial") != 2]
    with open(path, "w") as fh:
        for e in keep:
            fh.write(json.dumps(e) + "\n")

    second = ho.run_hyperopt(dict(cfg), ledger=ledger, run_name="hyperopt")
    # Only trial 2 re-runs: its regenerated result is deterministic, so the
    # history trials 3-5 were recorded against is unchanged and their rows
    # validate.
    assert calls["n"] == 6 + 1
    assert second["best_score"] == first["best_score"]
    assert second["best_parameters"] == first["best_parameters"]


def test_hyperopt_stale_history_reruns_dependent_trials(monkeypatch, tmp_path):
    """A record whose unit_row no longer matches the row the search would
    propose (its generating history diverged) is stale and re-evaluated.
    Tampering with a startup trial's SCORE leaves startup rows valid (they
    are score-independent Sobol points) but invalidates the TPE trial that
    conditioned on it."""
    import json

    import online_neural_cdes_tpu.training.hyperopt as ho
    from online_neural_cdes_tpu.training.ledger import Ledger

    calls = {"n": 0}

    def fake_run_experiment(cfg, **kw):
        calls["n"] += 1
        return {"val.loss": (float(cfg["model"]["hidden_dim"]) - 150.0) ** 2}

    monkeypatch.setattr(ho, "run_experiment", fake_run_experiment)
    cfg = {
        "parameterization": [
            {"name": "model__hidden_dim", "type": "range", "bounds": [32, 256]},
        ],
        "evaluation_metric": "loss",
        "total_trials": 6,  # n_startup = 5, so trial 5 is the TPE trial
        "seed": 0,
        "model": {}, "trainer": {},
    }
    path = tmp_path / "ledger.jsonl"
    ledger = Ledger(str(path))
    ho.run_hyperopt(dict(cfg), ledger=ledger, run_name="hyperopt")
    assert calls["n"] == 6

    # Corrupt trial 2's score: the TPE candidate at trial 5 was generated
    # against the true score, so its recorded row no longer validates.
    lines = [json.loads(l) for l in open(path)]
    for e in lines:
        if e["config"].get("trial") == 2:
            e["results"]["score"] = 0.0
    with open(path, "w") as fh:
        for e in lines:
            fh.write(json.dumps(e) + "\n")

    ho.run_hyperopt(dict(cfg), ledger=ledger, run_name="hyperopt")
    # Startup trials 0-4 replay (rows score-independent); trial 5 re-runs.
    assert calls["n"] == 6 + 1


def test_tpe_beats_sobol_on_training_objective(tmp_path):
    """Seeded regression pin of the hyperopt head-to-head on a REAL
    training objective (the full 20-trial x 5-rep protocol lives in
    scripts/hyperopt_headtohead.py; its table is in docs/RESULTS.md):
    NCDE shape dims + log-scale lr searched on the toy Brownian-motion
    online task at a reduced budget.  TPE's refinement stage must not
    lose to pure Sobol on this seeded benchmark (mean best val.auc over
    the seeds) — the 'same capability as Ax' claim needs at least its
    own ablation to hold on a training objective."""
    from online_neural_cdes_tpu.data.builders import build_toy_bm
    from online_neural_cdes_tpu.training.hyperopt import run_hyperopt

    root = str(tmp_path / "h2h")
    build_toy_bm(root, num_paths=256, n_points=8, seed=0)

    def cfg(seed, search=None):
        c = {
            "dataset_name": "ToyBM", "seed": seed, "total_trials": 8,
            "evaluation_metric": "auc", "minimize": False,
            "parameterization": [
                {"name": "model__hidden_dim", "type": "range",
                 "bounds": [4, 16]},
                {"name": "trainer__lr", "type": "range",
                 "bounds": [1e-4, 1e-1], "log_scale": True},
            ],
            "dataset": {"data_loc": "Toy/BM", "problem": "online",
                        "use_static": True, "interpolation": "linear",
                        "batch_size": 128},
            "model": {"model_string": "ncde", "hidden_hidden_dim": 8,
                      "num_layers": 1, "adjoint": False, "solver": "rk4"},
            "trainer": {"loss_str": "bce", "metrics": ["loss", "auc"],
                        "val_metric_to_monitor": "auc", "max_epochs": 3},
        }
        if search:
            c["search"] = search
        return c

    tpe = [-run_hyperopt(cfg(s), data_root=root)["best_score"]
           for s in (0, 1)]
    sob = [-run_hyperopt(cfg(s, "sobol"), data_root=root)["best_score"]
           for s in (0, 1)]
    assert np.mean(tpe) >= np.mean(sob), (tpe, sob)
