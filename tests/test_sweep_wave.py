"""Sweep-level co-scheduling + liveness (VERDICT r4 asks #1 and #5).

- Same-shape config groups (the reference's seeds-per-final-config
  protocol, reference configurations.json5 seed lists) must run through
  ONE vmapped wave (training/wave.run_trials_vmapped) instead of serially,
  with ledger dedup/resume semantics identical to the serial path.
- A crashed or hung config must be recorded as a ``failed`` ledger
  sentinel and the suite must continue — the crash-containment the
  reference got free from process-per-GPU (experiments/runs.py:64-73).
"""

import json
import os
import shutil

import numpy as np
import pytest

from online_neural_cdes_tpu.training import sweep
from online_neural_cdes_tpu.training.ledger import Ledger


@pytest.fixture(scope="module")
def toy_dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("processed"))
    from online_neural_cdes_tpu.data.builders import build_toy_bm

    build_toy_bm(root=root, num_paths=160, n_points=8, seed=0)
    return root


TOY_MODEL = {
    "model_string": ["ncde"],
    "hidden_dim": [8],
    "hidden_hidden_dim": [16],
    "num_layers": [2],
    "adjoint": [True],
    "solver": ["rk4"],
}


def _write_config_dir(tmp_path, suites: dict) -> str:
    """A config dir with the package's dataset.json5 and custom suites
    (plain JSON is valid json5)."""
    from online_neural_cdes_tpu.training.config import DEFAULT_CONFIG_DIR

    config_dir = str(tmp_path / "configurations")
    os.makedirs(config_dir, exist_ok=True)
    shutil.copy(
        os.path.join(DEFAULT_CONFIG_DIR, "dataset.json5"),
        os.path.join(config_dir, "dataset.json5"),
    )
    with open(os.path.join(config_dir, "configurations.json5"), "w") as fh:
        json.dump(suites, fh)
    return config_dir


def test_sweep_co_schedules_seed_replicas(toy_dataset, tmp_path, monkeypatch):
    """3 seed replicas of one config run as ONE vmapped wave; every member
    lands in the ledger individually and dedup skips all on re-run."""
    from online_neural_cdes_tpu.training import wave

    config_dir = _write_config_dir(tmp_path, {
        "toy3": {
            "hyperparameters": ["set"],
            "seed": [0, 1, 2],
            "dataset_name": ["ToyBM"],
            "dataset": {"interpolation": ["rectilinear"], "batch_size": [128]},
            "model": TOY_MODEL,
            "trainer": {"max_epochs": [3]},
        },
    })

    calls = []
    real_wave = wave.run_trials_vmapped

    def counting_wave(cfgs, **kw):
        calls.append(len(cfgs))
        return real_wave(cfgs, **kw)

    monkeypatch.setattr(wave, "run_trials_vmapped", counting_wave)

    ledger_path = str(tmp_path / "ledger.jsonl")
    completed = sweep.run(
        "toy3", ledger_path=ledger_path, data_root=toy_dataset,
        config_dir=config_dir,
    )
    assert calls == [3], "3 seed replicas must co-train as one wave"
    assert len(completed) == 3
    seeds = sorted(cfg["seed"] for cfg, _ in completed)
    assert seeds == [0, 1, 2]
    for _, results in completed:
        assert results["epochs_run"] == 3
        assert np.isfinite(results["test.loss"])
        assert "test.auc" in results and "time_per_epoch" in results

    # Ledger: one completed entry per replica; re-run skips everything.
    ledger = Ledger(ledger_path)
    done = ledger.query(lambda e: e.get("status") == "completed")
    assert len(done) == 3
    again = sweep.run("toy3", ledger_path=ledger_path, data_root=toy_dataset,
                      config_dir=config_dir)
    assert again == []

    # Seed-0's wave result matches its sequential run (the wave contract:
    # each lane's trajectory equals its sequential run's).
    solo = sweep.run(
        "toy3", ledger_path=str(tmp_path / "ledger_solo.jsonl"),
        data_root=toy_dataset, config_dir=config_dir,
        co_schedule=False, num_shards=3, shard_index=0,
    )
    assert len(solo) == 1 and solo[0][0]["seed"] == 0
    wave_seed0 = next(r for cfg, r in completed if cfg["seed"] == 0)
    np.testing.assert_allclose(
        solo[0][1]["test.loss"], wave_seed0["test.loss"], rtol=1e-5
    )


def test_sweep_partial_completion_waves_only_the_rest(
    toy_dataset, tmp_path, monkeypatch
):
    """A replica already completed in the ledger stays skipped; the
    remaining two still co-train as one wave."""
    from online_neural_cdes_tpu.training import wave

    config_dir = _write_config_dir(tmp_path, {
        "toy3": {
            "hyperparameters": ["set"],
            "seed": [0, 1, 2],
            "dataset_name": ["ToyBM"],
            "dataset": {"interpolation": ["rectilinear"], "batch_size": [128]},
            "model": TOY_MODEL,
            "trainer": {"max_epochs": [1]},
        },
    })
    ledger_path = str(tmp_path / "ledger.jsonl")

    # Pre-complete seed 1 by hand.
    from online_neural_cdes_tpu.training.config import parse_configuration_json

    ledger = Ledger(ledger_path)
    configs, db = parse_configuration_json("toy3", config_dir=config_dir)
    cfg_seed1 = next(c for c in configs if c["seed"] == 1)
    ledger.save_result(cfg_seed1, {"test.loss": 0.0}, run_name=db)

    calls = []
    real_wave = wave.run_trials_vmapped
    monkeypatch.setattr(
        wave, "run_trials_vmapped",
        lambda cfgs, **kw: calls.append(len(cfgs)) or real_wave(cfgs, **kw),
    )
    completed = sweep.run("toy3", ledger_path=ledger_path,
                          data_root=toy_dataset, config_dir=config_dir)
    assert calls == [2]
    assert sorted(cfg["seed"] for cfg, _ in completed) == [0, 2]


def test_sweep_crash_isolated(toy_dataset, tmp_path):
    """isolate=True: a config whose dataset is missing crashes its
    subprocess, is recorded as a failed sentinel, and the next config
    completes (reference process-per-GPU containment, runs.py:64-73)."""
    config_dir = _write_config_dir(tmp_path, {
        "mixed": {
            "hyperparameters": ["set"],
            "seed": [0],
            "multi-config": {
                # Mortality's MIMIC npz does not exist under the toy data
                # root: the child dies at load.
                "broken": {
                    "dataset_name": ["Mortality"],
                    "dataset": {"interpolation": ["linear"], "batch_size": [128]},
                    "model": TOY_MODEL,
                    "trainer": {"max_epochs": [1]},
                },
                "ok": {
                    "dataset_name": ["ToyBM"],
                    "dataset": {"interpolation": ["rectilinear"], "batch_size": [128]},
                    "model": TOY_MODEL,
                    "trainer": {"max_epochs": [1]},
                },
            },
        },
    })
    ledger_path = str(tmp_path / "ledger.jsonl")
    completed = sweep.run(
        "mixed", ledger_path=ledger_path, data_root=toy_dataset,
        config_dir=config_dir, isolate=True,
    )
    assert len(completed) == 1
    assert completed[0][0]["dataset_name"] == "ToyBM"
    assert np.isfinite(completed[0][1]["test.loss"])

    ledger = Ledger(ledger_path)
    failed = ledger.query(lambda e: e.get("status") == "failed")
    assert len(failed) == 1
    assert failed[0]["config"]["dataset_name"] == "Mortality"
    assert failed[0]["error"]
    # Failed != completed: the broken config is retried next sweep.
    assert not ledger.check_if_run(failed[0]["config"], run_name="mixed")


def test_sweep_watchdog_times_out_hung_config(toy_dataset, tmp_path):
    """config_timeout_s: a deliberately endless config (max_epochs=100000)
    is killed at its wall-clock budget, recorded failed, and the suite
    proceeds to the next config."""
    config_dir = _write_config_dir(tmp_path, {
        "hangsuite": {
            "hyperparameters": ["set"],
            "seed": [0],
            "multi-config": {
                # hidden_dim 4 differs from "quick"'s shape, so the two
                # configs form separate units (no co-wave).
                "hang": {
                    "dataset_name": ["ToyBM"],
                    "dataset": {"interpolation": ["rectilinear"], "batch_size": [128]},
                    "model": {**TOY_MODEL, "hidden_dim": [4]},
                    "trainer": {"max_epochs": [100000],
                                "early_stop_patience": [100000],
                                "plateau_patience": [100000]},
                },
                "quick": {
                    "dataset_name": ["ToyBM"],
                    "dataset": {"interpolation": ["rectilinear"], "batch_size": [128]},
                    "model": TOY_MODEL,
                    "trainer": {"max_epochs": [1]},
                },
            },
        },
    })
    ledger_path = str(tmp_path / "ledger.jsonl")
    completed = sweep.run(
        "hangsuite", ledger_path=ledger_path, data_root=toy_dataset,
        config_dir=config_dir, config_timeout_s=40.0,
    )
    assert len(completed) == 1
    assert completed[0][0]["model"]["hidden_dim"] == 8

    ledger = Ledger(ledger_path)
    failed = ledger.query(lambda e: e.get("status") == "failed")
    assert len(failed) == 1
    assert failed[0]["config"]["model"]["hidden_dim"] == 4
    assert "config_timeout_s" in failed[0]["error"]


def test_sweep_isolation_rejects_in_process_mesh(tmp_path):
    import jax
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
    with pytest.raises(ValueError, match="subprocess"):
        sweep.run("toy", ledger_path=str(tmp_path / "l.jsonl"),
                  isolate=True, mesh=mesh)


def test_sweep_wave_size_cap(toy_dataset, tmp_path, monkeypatch):
    """Co-scheduled groups chunk at ``max_wave_size`` (default 4): the r5
    concurrency_grid measured flagship-shape aggregate throughput FLAT to
    K=4 and 0.70x at K=8 (per-replica weights give K independent small
    matmuls — RESULTS.md r5 record), so an oversize seed list must split
    into capped waves rather than one giant vmapped program."""
    from online_neural_cdes_tpu.training import wave

    config_dir = _write_config_dir(tmp_path, {
        "toy6": {
            "hyperparameters": ["set"],
            "seed": [0, 1, 2, 3, 4, 5],
            "dataset_name": ["ToyBM"],
            "dataset": {"interpolation": ["rectilinear"], "batch_size": [128]},
            "model": TOY_MODEL,
            "trainer": {"max_epochs": [1]},
        },
    })

    calls = []
    real_wave = wave.run_trials_vmapped

    def counting_wave(cfgs, **kw):
        calls.append(len(cfgs))
        return real_wave(cfgs, **kw)

    monkeypatch.setattr(wave, "run_trials_vmapped", counting_wave)

    completed = sweep.run(
        "toy6", ledger_path=str(tmp_path / "ledger6.jsonl"),
        data_root=toy_dataset, config_dir=config_dir,
    )
    assert calls == [4, 2], calls
    assert sorted(cfg["seed"] for cfg, _ in completed) == [0, 1, 2, 3, 4, 5]


def test_sweep_mesh_runs_serially_with_mesh(toy_dataset, tmp_path, monkeypatch):
    """A sweep given an in-process mesh must NOT route same-shape groups
    through the single-device vmapped wave (that would silently shed the
    data-parallel sharding); every config runs serially over the mesh."""
    import jax
    from jax.sharding import Mesh

    from online_neural_cdes_tpu.training import wave

    def no_wave(*a, **kw):  # pragma: no cover - the assertion is the point
        raise AssertionError("vmapped wave must not run under a mesh")

    monkeypatch.setattr(wave, "run_trials_vmapped", no_wave)

    config_dir = _write_config_dir(tmp_path, {
        "meshtoy": {
            "hyperparameters": ["set"],
            "seed": [0, 1],
            "dataset_name": ["ToyBM"],
            "dataset": {"interpolation": ["rectilinear"], "batch_size": [128]},
            "model": TOY_MODEL,
            "trainer": {"max_epochs": [1]},
        },
    })
    mesh = Mesh(np.array(jax.devices()[:2]), ("data",))
    completed = sweep.run(
        "meshtoy", ledger_path=str(tmp_path / "ledger.jsonl"),
        data_root=toy_dataset, config_dir=config_dir, mesh=mesh,
    )
    assert len(completed) == 2
    for _, results in completed:
        assert np.isfinite(results["test.loss"])


def test_sweep_isolated_results_are_plain_json(toy_dataset, tmp_path):
    """Results crossing the isolation boundary come back as real numbers
    (not ``str()`` reprs) and omit the in-memory ``best_params`` pytree —
    weights persist via trainer.checkpoint_dir, not the result dict."""
    config_dir = _write_config_dir(tmp_path, {
        "iso": {
            "hyperparameters": ["set"],
            "seed": [0],
            "dataset_name": ["ToyBM"],
            "dataset": {"interpolation": ["rectilinear"], "batch_size": [128]},
            "model": TOY_MODEL,
            "trainer": {"max_epochs": [1]},
        },
    })
    completed = sweep.run(
        "iso", ledger_path=str(tmp_path / "ledger.jsonl"),
        data_root=toy_dataset, config_dir=config_dir, isolate=True,
    )
    assert len(completed) == 1
    results = completed[0][1]
    assert "best_params" not in results
    for key in ("test.loss", "test.auc", "time_per_epoch"):
        assert isinstance(results[key], (int, float)), (key, results[key])
