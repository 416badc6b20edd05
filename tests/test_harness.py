"""Harness stack tests: config grids, ledger semantics, dataset builders,
the .ts parser, and the end-to-end sweep smoke path (the analogue of the
reference's TEST_MODE runs through the real harness, SURVEY.md §4)."""
import os
import time

import numpy as np
import pytest

from online_neural_cdes_tpu.training.config import (
    nested_parameter_grid,
    parse_configuration_json,
    parse_dataset_json,
)
from online_neural_cdes_tpu.training.ledger import Ledger, config_hash


def test_nested_parameter_grid():
    grid = {"a": [1, 2], "model": {"h": [3, 4], "deep": {"x": [5]}}}
    configs = nested_parameter_grid(grid)
    assert len(configs) == 4
    assert {c["a"] for c in configs} == {1, 2}
    assert all(c["model"]["deep"]["x"] == 5 for c in configs)


def test_parse_dataset_json():
    cfg = parse_dataset_json("Mortality")
    assert cfg["dataset"]["problem"] == "oneshot"
    assert cfg["trainer"]["loss_str"] == "bce"
    assert cfg["trainer"]["val_metric_to_monitor"] == "auc"
    cfg_online = parse_dataset_json("Sepsis")
    assert cfg_online["model"]["return_sequences"] is True


def test_parse_configuration_suites():
    for suite in ("medical-sota", "interpolation", "sparsity", "toy"):
        configs, db = parse_configuration_json(suite)
        assert len(configs) > 0
        for cfg in configs:
            assert "dataset" in cfg and "model" in cfg and "trainer" in cfg
    # The hyperopt suite expands the multi-config union.
    hyper, _ = parse_configuration_json("hyperopt")
    assert any(c["model"]["model_string"] == "odernn" for c in hyper)
    assert all("parameterization" in c for c in hyper)


def test_ledger_dedup_and_purge(tmp_path):
    ledger = Ledger(str(tmp_path / "ledger.jsonl"))
    cfg_a = {"model": {"h": 1}, "seed": 0}
    cfg_b = {"model": {"h": 2}, "seed": 0}
    assert not ledger.check_if_run(cfg_a, "run")
    ledger.mark_running(cfg_a, "run")
    assert not ledger.check_if_run(cfg_a, "run")  # running != completed
    ledger.save_result(cfg_a, {"test.auc": 0.9}, "run")
    assert ledger.check_if_run(cfg_a, "run")
    assert not ledger.check_if_run(cfg_b, "run")
    # Purge drops the never-completed config only.
    ledger.mark_running(cfg_b, "run")
    dropped = ledger.purge_incomplete_runs("run")
    assert dropped == 1
    assert ledger.check_if_run(cfg_a, "run")
    assert config_hash(cfg_a) != config_hash(cfg_b)


def test_ts_parser(tmp_path):
    content = """#comment
@problemName tiny
@timeStamps false
@classLabel true a b
@data
1.0,2.0,?:4.0,5.0,6.0:a
7.0,8.0:9.0,10.0:b
"""
    path = tmp_path / "tiny.ts"
    path.write_text(content)
    from online_neural_cdes_tpu.data.ts_format import load_ts_file

    series, labels = load_ts_file(str(path))
    assert labels == ["a", "b"]
    assert series[0].shape == (3, 2)
    assert np.isnan(series[0][2, 0])
    assert series[1].shape == (2, 2)
    np.testing.assert_allclose(series[1][:, 1], [9.0, 10.0])


def test_ts_parser_timestamp_tuples(tmp_path):
    """Golden: the @timestamps tuple format (reference tsr.py:125,365-517).
    Dimensions observed at DIFFERENT times align on the case's union
    timestamp grid with NaN holes, the grid itself lands in column 0
    rebased to the case's first observation (float32-safe for epoch-scale
    stamps), and '?' values stay missing."""
    content = """@problemName tinyts
@timestamps true
@classLabel true a b
@data
(0,1.0),(2,2.0),(5,?):(0,10.0),(3,11.0):a
(1,7.0):(1,9.5),(2,10.5):b
"""
    path = tmp_path / "tinyts.ts"
    path.write_text(content)
    from online_neural_cdes_tpu.data.ts_format import load_ts_file

    series, labels = load_ts_file(str(path))
    assert labels == ["a", "b"]
    # Case 0: union grid {0, 2, 3, 5} -> (4, 1 + 2)
    assert series[0].shape == (4, 3)
    np.testing.assert_allclose(series[0][:, 0], [0.0, 2.0, 3.0, 5.0])
    np.testing.assert_allclose(series[0][:2, 1], [1.0, 2.0])
    assert np.isnan(series[0][3, 1])      # the '?' value at t=5
    assert np.isnan(series[0][1, 2])      # dim 2 unobserved at t=2
    np.testing.assert_allclose(series[0][[0, 2], 2], [10.0, 11.0])
    # Case 1: union grid {1, 2}, rebased to the first observation.
    assert series[1].shape == (2, 3)
    np.testing.assert_allclose(series[1][:, 0], [0.0, 1.0])
    assert np.isnan(series[1][1, 1])
    np.testing.assert_allclose(series[1][:, 2], [9.5, 10.5])


def test_ts_parser_epoch_scale_timestamps(tmp_path):
    """Epoch-scale numeric stamps (~1.7e9 s, float32 resolution ~256 s
    there) must stay distinct in the float32 time column: rebasing to the
    case origin keeps second-apart observations exact."""
    t0 = 1_700_000_000
    content = f"""@problemName epochy
@timestamps true
@classLabel false
@data
({t0},1.0),({t0 + 1},2.0),({t0 + 3},3.0)
"""
    path = tmp_path / "epochy.ts"
    path.write_text(content)
    from online_neural_cdes_tpu.data.ts_format import load_ts_file

    series, _ = load_ts_file(str(path))
    np.testing.assert_allclose(series[0][:, 0], [0.0, 1.0, 3.0])
    np.testing.assert_allclose(series[0][:, 1], [1.0, 2.0, 3.0])


def test_ts_parser_date_timestamps(tmp_path):
    """Date timestamps convert to float seconds since the case's first
    observation (an affine reparametrisation — CDE solutions are invariant
    to it); no-label tuple files parse too."""
    content = """@problemName dately
@timestamps true
@classLabel false
@data
(2020-01-01 00:00:00,1.0),(2020-01-01 00:01:00,2.0)
(2020-03-05,4.0),(2020-03-06,5.0)
"""
    path = tmp_path / "dately.ts"
    path.write_text(content)
    from online_neural_cdes_tpu.data.ts_format import load_ts_file

    series, labels = load_ts_file(str(path))
    assert labels == ["", ""]
    np.testing.assert_allclose(series[0][:, 0], [0.0, 60.0])
    np.testing.assert_allclose(series[0][:, 1], [1.0, 2.0])
    np.testing.assert_allclose(series[1][:, 0], [0.0, 86400.0])
    np.testing.assert_allclose(series[1][:, 1], [4.0, 5.0])


def test_ts_parser_timestamped_empty_dimension(tmp_path):
    """Regression: a dimension with NO observations ('::', legal in the
    format and handled by the reference loader) must stay its own all-NaN
    column — a lookaround split requiring ')<colon>(' silently merged its
    neighbours, corrupting values and channel counts across cases."""
    content = """@problemName holey
@timestamps true
@classLabel true a b
@data
(0,1.0),(2,2.0)::(0,3.0):a
(0,4.0):(1,5.0):(1,6.0):b
"""
    path = tmp_path / "holey.ts"
    path.write_text(content)
    from online_neural_cdes_tpu.data.ts_format import load_ts_file

    series, labels = load_ts_file(str(path))
    assert labels == ["a", "b"]
    # Case 0: 3 dimensions (middle empty) on union grid {0, 2} -> (2, 1+3).
    assert series[0].shape == (2, 4)
    np.testing.assert_allclose(series[0][:, 0], [0.0, 2.0])
    np.testing.assert_allclose(series[0][:, 1], [1.0, 2.0])
    assert np.isnan(series[0][:, 2]).all()          # the empty dimension
    np.testing.assert_allclose(series[0][0, 3], 3.0)
    assert np.isnan(series[0][1, 3])
    # Case 1 (no empty dims) agrees on the channel count.
    assert series[1].shape == (2, 4)
    # A trailing empty dimension parses too (label still extracted).
    path2 = tmp_path / "holey2.ts"
    path2.write_text("""@problemName holey2
@timestamps true
@classLabel true a
@data
(0,1.0)::a
""")
    series2, labels2 = load_ts_file(str(path2))
    assert labels2 == ["a"]
    assert series2[0].shape == (1, 3)
    assert np.isnan(series2[0][0, 2])


def test_timing_protocol_helpers():
    """The shared tunnel-RT-subtracted protocol (utils/timing.py — the one
    copy bench.py and the experiment scripts calibrate from): chain length
    scaling respects floor/cap, and the chain measurement subtracts at most
    half the elapsed time and averages over n."""
    from online_neural_cdes_tpu.utils.timing import (
        rt_subtracted_chain_s, scaled_chain_len, tunnel_rt,
    )

    rt = tunnel_rt()
    assert rt >= 0.0
    n = scaled_chain_len(15, cap=60, per_iter_ms_hint=2.0)
    assert 15 <= n <= 60
    assert scaled_chain_len(10, cap=10, per_iter_ms_hint=1e-12) == 10

    calls = []

    def run_chain(k):
        calls.append(k)
        time.sleep(0.01 * k)

    per_iter = rt_subtracted_chain_s(run_chain, n=5, chains=3)
    assert calls == [5, 5, 5]
    # Each iteration sleeps 10 ms; the subtraction is bounded at half the
    # elapsed time, so the result stays within [5 ms, ~elapsed/n].
    assert 0.005 <= per_iter < 0.05


@pytest.fixture(scope="module")
def toy_dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("processed"))
    from online_neural_cdes_tpu.data.builders import build_toy_bm

    build_toy_bm(root=root, num_paths=160, n_points=8, seed=0)
    return root


def test_builder_npz_contract(toy_dataset):
    npz = np.load(
        os.path.join(toy_dataset, "Toy/BM/improved-neural-cdes_data.npz"),
        allow_pickle=True,
    )
    for key in (
        "static_data", "labels", "train_idxs", "val_idxs", "test_idxs",
        "temporal_data_raw", "temporal_data_linear", "temporal_data_rectilinear",
        "temporal_data_cubic", "temporal_data_linear_forward_fill",
        "temporal_data_hermite",
    ):
        assert key in npz.files, key
    assert npz["temporal_data_rectilinear"].shape[1] == 2 * 8 - 1
    assert npz["temporal_data_cubic"].shape[-1] == 4 * 3
    assert npz["temporal_data_hermite"].shape == (160, 8 - 1, 4 * 3)


def test_loader_roundtrip(toy_dataset):
    from online_neural_cdes_tpu.data.loader import Batches, load_numpy_data

    path = os.path.join(toy_dataset, "Toy/BM/improved-neural-cdes_data.npz")
    splits = load_numpy_data(path, "rectilinear", use_static=True, problem="online")
    train = splits[0]
    assert train.static is not None and train.input_dim == 3
    assert train.return_sequences
    batches = list(Batches(train, batch_size=64))
    assert len(batches) == 2
    (static, temporal), labels = batches[0]
    assert temporal.shape[1] == 15 and labels.shape[0] == static.shape[0]

    # rectilinear-intensity appends cumulative count channels.
    splits_i = load_numpy_data(path, "rectilinear-intensity", use_static=True,
                               problem="online")
    assert splits_i[0].temporal.shape[-1] == 3 + 2


@pytest.mark.smoke
def test_end_to_end_sweep_smoke(toy_dataset, tmp_path):
    """The full harness path: suite -> configs -> experiment -> ledger ->
    analysis (reference TEST_MODE smoke semantics)."""
    from online_neural_cdes_tpu.training import analyse, sweep

    ledger_path = str(tmp_path / "ledger.jsonl")
    completed = sweep.run(
        "toy", ledger_path=ledger_path, data_root=toy_dataset,
    )
    assert len(completed) == 1
    cfg, results = completed[0]
    assert results["epochs_run"] == 3
    for key in ("test.loss", "test.auc", "num_params", "time_per_epoch",
                "nfe_per_epoch"):
        assert key in results, (key, sorted(results.keys()))
    assert np.isfinite(results["test.loss"])
    assert results["nfe_per_epoch"] > 0

    # Re-running skips (dedup).
    again = sweep.run("toy", ledger_path=ledger_path, data_root=toy_dataset)
    assert len(again) == 0

    # Analysis produces a seed-averaged table.
    ledger = analyse.Ledger(ledger_path)
    frame = analyse.runs_frame(ledger)
    assert len(frame) == 1
    table = analyse.metric_table(ledger)
    assert table.shape == (1, 1)


def test_hyperopt_smoke(toy_dataset):
    from online_neural_cdes_tpu.training.hyperopt import run_hyperopt

    config = {
        "dataset_name": "ToyBM",
        "seed": 0,
        "total_trials": 2,
        "evaluation_metric": "auc",
        "minimize": False,
        "parameterization": [
            {"name": "model__hidden_dim", "type": "range", "bounds": [4, 8]},
            {"name": "trainer__lr", "type": "range", "bounds": [1e-3, 1e-2],
             "log_scale": True},
        ],
        "dataset": {"data_loc": "Toy/BM", "problem": "online",
                     "use_static": True, "interpolation": "linear",
                     "batch_size": 128},
        "model": {"model_string": "ncde", "hidden_hidden_dim": 8,
                   "num_layers": 1, "adjoint": False, "solver": "rk4"},
        "trainer": {"loss_str": "bce", "metrics": ["loss", "auc"],
                     "val_metric_to_monitor": "auc", "max_epochs": 2},
    }
    results = run_hyperopt(config, data_root=toy_dataset)
    assert "best_parameters" in results
    assert "model" in results["best_parameters"]
    assert 4 <= results["best_parameters"]["model"]["hidden_dim"] <= 8


def test_hermite_dopri5_end_to_end(toy_dataset):
    """BASELINE.json driver config #3's scheme: Hermite-cubic coefficients
    from the npz pipeline driving an adaptive bounded-step NCDE."""
    from online_neural_cdes_tpu.data.loader import Batches, load_numpy_data
    from online_neural_cdes_tpu.training.experiment import run_experiment

    path = os.path.join(toy_dataset, "Toy/BM/improved-neural-cdes_data.npz")
    splits = load_numpy_data(path, "hermite", use_static=True, problem="online")
    train = splits[0]
    assert train.model_interpolation == "hermite"
    assert train.input_dim == 3
    (static, temporal), labels = next(iter(Batches(train, batch_size=64)))
    assert temporal.shape[1] == 8 - 1 and temporal.shape[2] == 4 * 3

    cfg = {
        "dataset_name": "ToyBM",
        "seed": 0,
        "dataset": {"data_loc": "Toy/BM", "problem": "online",
                     "use_static": True, "interpolation": "hermite",
                     "batch_size": 128},
        "model": {"model_string": "ncde", "hidden_dim": 8,
                   "hidden_hidden_dim": 12, "num_layers": 1,
                   "adjoint": False, "solver": "dopri5"},
        "trainer": {"loss_str": "bce", "metrics": ["loss", "auc"],
                     "val_metric_to_monitor": "auc", "max_epochs": 2},
    }
    results = run_experiment(cfg, data_root=toy_dataset)
    assert np.isfinite(results["test.loss"])
    assert results["nfe_per_epoch"] > 0


def test_train_persists_checkpoint(toy_dataset, tmp_path):
    import jax
    import jax.numpy as jnp

    from online_neural_cdes_tpu.training.experiment import run_experiment
    from online_neural_cdes_tpu.utils.checkpoint import load_checkpoint
    from online_neural_cdes_tpu.training.harness import setup_model

    ckpt_dir = str(tmp_path / "ckpts")
    cfg = {
        "dataset_name": "ToyBM",
        "seed": 0,
        "dataset": {"data_loc": "Toy/BM", "problem": "online",
                     "use_static": True, "interpolation": "linear",
                     "batch_size": 128},
        "model": {"model_string": "ncde", "hidden_dim": 8,
                   "hidden_hidden_dim": 12, "num_layers": 1,
                   "adjoint": False, "solver": "rk4"},
        "trainer": {"loss_str": "bce", "metrics": ["loss"],
                     "val_metric_to_monitor": "loss", "max_epochs": 2,
                     "checkpoint_dir": ckpt_dir},
    }
    results = run_experiment(cfg, data_root=toy_dataset)
    assert np.isfinite(results["test.loss"])
    # Restore into a freshly initialised model of the same config.
    bundle = setup_model("ncde", input_dim=3, output_dim=1, static_dim=4,
                          hidden_dim=8, hidden_hidden_dim=12, num_layers=1,
                          adjoint=False, solver="rk4",
                          interpolation="linear", return_sequences=True)
    like = bundle.init(jax.random.PRNGKey(1))
    restored = load_checkpoint(os.path.join(ckpt_dir, "best_params"), like)
    assert jax.tree.all(
        jax.tree.map(lambda a, b: a.shape == b.shape, restored, like)
    )


def test_cli_main(toy_dataset, tmp_path, capsys):
    from online_neural_cdes_tpu.run import main

    ledger = str(tmp_path / "ledger.jsonl")
    main(["toy", "--data-root", toy_dataset, "--ledger", ledger])
    out = capsys.readouterr().out
    assert "completed 1 configs" in out
    main(["toy", "--analyse", "--ledger", ledger])
    out = capsys.readouterr().out
    assert "ncde" in out
    # --tables-out writes the reference .tex set from the same ledger.
    tables_dir = str(tmp_path / "tables")
    main(["toy", "--analyse", "--ledger", ledger, "--tables-out", tables_dir])
    out = capsys.readouterr().out
    assert "medical-sota.tex" in out
    assert os.path.exists(os.path.join(tables_dir, "medical-sota.tex"))


def test_cli_analyse_matches_test_mode_run_name(toy_dataset, tmp_path, capsys):
    """--analyse with --test-mode must look up the prefixed 'test_<name>'
    ledger entries that a test-mode sweep records."""
    from online_neural_cdes_tpu.run import main

    ledger = str(tmp_path / "ledger.jsonl")
    main(["toy", "--test-mode", "--data-root", toy_dataset, "--ledger", ledger])
    capsys.readouterr()
    main(["toy", "--analyse", "--test-mode", "--ledger", ledger])
    out = capsys.readouterr().out
    assert "ncde" in out and "Empty DataFrame" not in out


def test_epoch_step_matches_sequential_train_steps():
    """make_epoch_step (one lax.scan dispatch per epoch) must produce the
    same params/losses as iterating make_train_step over the batches."""
    import jax
    import jax.numpy as jnp
    import optax

    from online_neural_cdes_tpu.models.ncde import NeuralCDE
    from online_neural_cdes_tpu.ops.interpolation import linear_interpolation_coeffs
    from online_neural_cdes_tpu.training.loop import make_epoch_step, make_train_step

    rng = np.random.default_rng(0)
    S, B, L, C = 3, 4, 5, 3
    x = jnp.asarray(rng.normal(size=(S * B, L, C)), jnp.float32)
    y = jnp.asarray((rng.normal(size=(S * B, 1)) > 0).astype(np.float32))
    coeffs = linear_interpolation_coeffs(x)
    model = NeuralCDE(input_dim=C, hidden_dim=6, output_dim=1,
                      hidden_hidden_dim=8, num_layers=1, adjoint=False,
                      solver="rk4")
    params0 = model.init(jax.random.PRNGKey(0))
    opt = optax.adam(1e-2)

    step = make_train_step(model, optimizer=opt, loss="bce", donate=False)
    p_seq = params0
    s_seq = opt.init(params0)
    losses_seq = []
    for i in range(S):
        p_seq, s_seq, v = step(p_seq, s_seq, coeffs[i * B:(i + 1) * B],
                               y[i * B:(i + 1) * B])
        losses_seq.append(float(v))

    epoch = make_epoch_step(model, optimizer=opt, loss="bce", donate=False)
    cs = coeffs.reshape(S, B, *coeffs.shape[1:])
    ls = y.reshape(S, B, *y.shape[1:])
    p_ep, s_ep, losses_ep = epoch(params0, opt.init(params0), cs, ls)

    np.testing.assert_allclose(np.asarray(losses_ep), np.asarray(losses_seq),
                               rtol=1e-6, atol=1e-7)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7),
        p_ep, p_seq,
    )


def test_epoch_step_dynamic_lr_on_mesh():
    """Dynamic-lr epoch step compiles and runs under a data-sharded mesh."""
    import jax
    import jax.numpy as jnp

    from online_neural_cdes_tpu.models.ncde import NeuralCDE
    from online_neural_cdes_tpu.ops.interpolation import linear_interpolation_coeffs
    from online_neural_cdes_tpu.parallel.mesh import make_mesh
    from online_neural_cdes_tpu.training.loop import init_adam_state, make_epoch_step

    rng = np.random.default_rng(1)
    S, B, L, C = 2, 8, 5, 3
    x = jnp.asarray(rng.normal(size=(S * B, L, C)), jnp.float32)
    y = jnp.asarray((rng.normal(size=(S * B, 1)) > 0).astype(np.float32))
    coeffs = linear_interpolation_coeffs(x)
    model = NeuralCDE(input_dim=C, hidden_dim=6, output_dim=1,
                      hidden_hidden_dim=8, num_layers=1, adjoint=False,
                      solver="rk4")
    params = model.init(jax.random.PRNGKey(0))
    mesh = make_mesh()
    epoch = make_epoch_step(model, loss="bce", mesh=mesh, donate=False)
    cs = coeffs.reshape(S, B, *coeffs.shape[1:])
    ls = y.reshape(S, B, *y.shape[1:])
    p, s, losses = epoch(params, init_adam_state(params), cs, ls, 1.0)
    assert losses.shape == (S,)
    assert np.isfinite(np.asarray(losses)).all()


def test_resume_is_bit_identical_to_uninterrupted_training(toy_dataset, tmp_path):
    """Step-granularity fault recovery: interrupt after 2 epochs, resume to
    4 — final parameters and history match an uninterrupted 4-epoch run
    exactly (deterministic batches, full trainer state persisted)."""
    import jax

    from online_neural_cdes_tpu.training.experiment import run_experiment

    def cfg(max_epochs, ckpt_dir=None, every=0, resume=False):
        trainer = {"loss_str": "bce", "metrics": ["loss"],
                   "val_metric_to_monitor": "loss", "max_epochs": max_epochs}
        if ckpt_dir:
            trainer.update({"checkpoint_dir": ckpt_dir,
                            "checkpoint_every": every, "resume": resume})
        return {
            "dataset_name": "ToyBM", "seed": 0,
            "dataset": {"data_loc": "Toy/BM", "problem": "online",
                        "use_static": True, "interpolation": "linear",
                        "batch_size": 128},
            "model": {"model_string": "ncde", "hidden_dim": 8,
                      "hidden_hidden_dim": 12, "num_layers": 1,
                      "adjoint": False, "solver": "rk4"},
            "trainer": trainer,
        }

    full = run_experiment(cfg(4), data_root=toy_dataset)

    d = str(tmp_path / "resume_ckpt")
    run_experiment(cfg(2, d, every=1), data_root=toy_dataset)
    resumed = run_experiment(cfg(4, d, every=1, resume=True),
                             data_root=toy_dataset)

    assert resumed["epochs_run"] == full["epochs_run"] == 4
    assert [h["loss"] for h in resumed["history"]] == pytest.approx(
        [h["loss"] for h in full["history"]], rel=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7),
        resumed["best_params"], full["best_params"],
    )


def test_multiconfig_merge_preserves_sub_config_leaves():
    """Suite-level nested dicts (e.g. test-mode trainer.max_epochs) must
    merge leaf-wise into each sub-config, not wholesale replace its
    trainer/model/dataset dicts."""
    from online_neural_cdes_tpu.training.config import parse_configuration_json

    configs, _ = parse_configuration_json("medical-sota", test_mode=True)
    ncde = [c for c in configs if c["model"]["model_string"] == "ncde"]
    assert ncde, "medical-sota must contain ncde configs"
    for c in ncde:
        assert c["trainer"]["max_epochs"] == 10          # suite-level (test mode)
        assert c["trainer"]["lr"] == 5e-4                # sub-config leaf survives


def test_load_suites_resolve_against_hyperopt_search_space(tmp_path):
    """Every config in every 'load' suite must match a run the 'hyperopt'
    suite can actually produce (dataset x interpolation x model x adjoint)
    — otherwise the sweep dies in update_hyperparams before running
    anything."""
    from online_neural_cdes_tpu.training.config import (
        load_json, DEFAULT_CONFIG_DIR, parse_configuration_json,
    )
    
    from online_neural_cdes_tpu.training.ledger import Ledger

    # Build a fake ledger holding one completed hyperopt run per config the
    # search suite would execute.
    search_configs, _ = parse_configuration_json("hyperopt")
    ledger = Ledger(str(tmp_path / "ledger.jsonl"))
    for cfg in search_configs:
        ledger.save_result(
            cfg, {"best_score": 0.1}, run_name="hyperopt",
            info={"best_parameters": {"model": {"hidden_dim": 64}}},
        )

    suites = load_json(os.path.join(DEFAULT_CONFIG_DIR, "configurations.json5"))
    load_suites = [k for k, v in suites.items() if v.get("hyperparameters") == ["load"]]
    assert load_suites, "expected at least one 'load' suite"
    for name in load_suites:
        configs, _ = parse_configuration_json(name, ledger=ledger)  # must not raise
        assert configs
        for c in configs:
            assert c["model"].get("hidden_dim") == 64  # injection happened


def test_attention_rejects_online_problems():
    from online_neural_cdes_tpu.training.harness import setup_model

    with pytest.raises(ValueError, match="one-shot"):
        setup_model("ncde-attention", input_dim=3, output_dim=1,
                    return_sequences=True)


def test_odernn_uses_gru_intensity_preparation():
    """Reference parity (setup_model.py:107-120): ODERNN consumes doubled
    channels — mean-imputed values plus observation masks."""
    from online_neural_cdes_tpu.data.loader import LoadedData
    from online_neural_cdes_tpu.training.harness import setup_model

    rng = np.random.default_rng(0)
    x = rng.normal(size=(6, 5, 3)).astype(np.float32)
    x[:, :, 0] = np.arange(5)
    x[1, 2, 1] = np.nan
    data = LoadedData(static=None, temporal=x, labels=np.zeros((6,), np.float32),
                      input_dim=3, output_dim=1, static_dim=None,
                      model_interpolation=None, return_sequences=False)
    bundle = setup_model("odernn", input_dim=3, output_dim=1, hidden_dim=8,
                         hidden_hidden_dim=8, num_layers=1, train_data=data)
    prepared = bundle.prepare_batch(x)
    assert prepared.shape == (6, 5, 6)          # values + mask channels
    assert bundle.model.input_dim == 6
    import jax

    out = bundle.apply_fn(bundle.init(jax.random.PRNGKey(0)), prepared)
    assert np.isfinite(np.asarray(out)).all()


# ---------------------------------------------------------------------------
# Log-ODE end-to-end (reference torchcde log_ode.py:110-133 fired through the
# loader/config/experiment stack — the length-for-width trade in anger)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def oneshot_dataset(tmp_path_factory):
    """A long-sequence ONE-SHOT classification npz (log-ODE's problem class:
    per-window rows cannot align with online per-step labels)."""
    import os

    from online_neural_cdes_tpu.data.common import (
        add_time, process_all_interpolations, save_processed,
    )

    rng = np.random.default_rng(3)
    n, length = 90, 48
    inc = rng.normal(size=(n, length - 1, 2)) / np.sqrt(length - 1)
    values = np.concatenate([np.zeros((n, 1, 2)), np.cumsum(inc, 1)], 1)
    drop = rng.uniform(size=values[..., 1].shape) < 0.2
    values[..., 1][drop] = np.nan
    temporal = add_time(values).astype(np.float32)
    labels = (values[:, -1, 0] > 0).astype(np.float32)
    root = str(tmp_path_factory.mktemp("oneshot"))
    processed = process_all_interpolations(None, temporal, labels.astype(np.int64))
    save_processed(processed, labels, os.path.join(root, "Toy/OneShot"))
    return root


def test_logsig_interpolation_key_parses():
    from online_neural_cdes_tpu.data.loader import (
        parse_interpolation_string, parse_logsig_string,
    )

    assert parse_interpolation_string("logsig-2-8") == ("raw", "logsig-2-8")
    assert parse_logsig_string("logsig-3-4") == (3, 4.0)
    with pytest.raises(ValueError, match="logsig"):
        parse_interpolation_string("logsig-2")
    with pytest.raises(ValueError, match="invalid"):
        parse_interpolation_string("logsig-0-8")


def test_logsig_loader_transforms_raw_series(oneshot_dataset):
    import os

    from online_neural_cdes_tpu.data.loader import load_numpy_data
    from online_neural_cdes_tpu.ops.logsig import logsignature_channels

    path = os.path.join(oneshot_dataset, "Toy/OneShot/improved-neural-cdes_data.npz")
    splits = load_numpy_data(path, "logsig-2-8", use_static=False, problem="oneshot")
    train = splits[0]
    # 48 observations -> ceil(47/8)=6 windows + the initial row; channels =
    # Lyndon words over 3 letters at depth 2 (3 + 3) = 6.
    assert train.model_interpolation == "linear"
    assert train.temporal.shape[1] == 7
    assert train.input_dim == logsignature_channels(3, 2) == 6
    assert np.isfinite(train.temporal).all()


def test_logsig_rejects_online_problems(oneshot_dataset):
    import os

    from online_neural_cdes_tpu.data.loader import load_numpy_data

    path = os.path.join(oneshot_dataset, "Toy/OneShot/improved-neural-cdes_data.npz")
    with pytest.raises(ValueError, match="online"):
        load_numpy_data(path, "logsig-2-8", use_static=False, problem="online")


def test_logsig_end_to_end_experiment(oneshot_dataset):
    """The 'logsig-rk4' sweep leg's scheme through the full experiment
    stack: transform -> linear-control NCDE -> train -> finite metrics."""
    from online_neural_cdes_tpu.training.experiment import run_experiment

    cfg = {
        "dataset_name": "ToyOneShot",
        "seed": 0,
        "dataset": {"data_loc": "Toy/OneShot", "problem": "oneshot",
                     "use_static": False, "interpolation": "logsig-2-8",
                     "batch_size": 64},
        "model": {"model_string": "ncde", "hidden_dim": 8,
                   "hidden_hidden_dim": 12, "num_layers": 1,
                   "adjoint": False, "solver": "rk4"},
        "trainer": {"loss_str": "bce", "metrics": ["loss", "auc"],
                     "val_metric_to_monitor": "auc", "max_epochs": 2},
    }
    results = run_experiment(cfg, data_root=oneshot_dataset)
    assert np.isfinite(results["test.loss"])
    assert results["nfe_per_epoch"] > 0
    # The compressed control is 7 knots vs 48 raw observations: NFE per
    # epoch reflects the length-for-width trade (6 intervals * 4 stages).
    assert results["nfe_per_epoch"] <= 24 * 2    # 2 train batches


def test_logsig_leg_in_suites():
    """The search suite covers logsig-2-8 on all four benchmarks, so the
    'interpolation' load-suite's logsig-rk4 leg resolves (the
    load-vs-search consistency of every leg is asserted by
    test_load_suites_resolve_against_hyperopt_search_space)."""
    import os

    from online_neural_cdes_tpu.training.config import (
        DEFAULT_CONFIG_DIR, load_json, parse_configuration_json,
    )

    search, _ = parse_configuration_json("hyperopt")
    legs = [c for c in search
            if c["dataset"].get("interpolation") == "logsig-2-8"]
    assert len(legs) == 4, "logsig-2-8 search leg expected on all benchmarks"

    suites = load_json(os.path.join(DEFAULT_CONFIG_DIR, "configurations.json5"))
    assert "logsig-rk4" in suites["interpolation"]["multi-config"]


# ---------------------------------------------------------------------------
# Wave-parallel hyperopt (vmapped multi-trial training, training/wave.py)
# ---------------------------------------------------------------------------

def test_vmappable_groups_partition():
    from online_neural_cdes_tpu.training.wave import vmappable_groups

    points = [
        {"model__hidden_dim": 8, "trainer__lr": 1e-3},
        {"model__hidden_dim": 8, "trainer__lr": 1e-2},
        {"model__hidden_dim": 16, "trainer__lr": 1e-3},
        {"model__hidden_dim": 8, "trainer__lr": 3e-3},
    ]
    groups = sorted(vmappable_groups(points), key=len, reverse=True)
    assert sorted(groups[0]) == [0, 1, 3]     # same shape, lr-only wave
    assert groups[1] == [2]


@pytest.fixture(scope="module")
def _wave_cfg(toy_dataset):
    return {
        "dataset_name": "ToyBM",
        "seed": 0,
        "total_trials": 4,
        "wave_size": 4,
        "search": "sobol",
        "evaluation_metric": "loss",
        "minimize": True,
        "parameterization": [
            {"name": "trainer__lr", "type": "range", "bounds": [1e-4, 1e-1],
             "log_scale": True},
        ],
        "dataset": {"data_loc": "Toy/BM", "problem": "online",
                     "use_static": True, "interpolation": "linear",
                     "batch_size": 128},
        "model": {"model_string": "ncde", "hidden_dim": 8,
                   "hidden_hidden_dim": 8, "num_layers": 1,
                   "adjoint": False, "solver": "rk4"},
        "trainer": {"loss_str": "bce", "metrics": ["loss"],
                     "val_metric_to_monitor": "loss", "max_epochs": 3},
    }


def test_wave_vmapped_matches_sequential_and_is_faster(toy_dataset, _wave_cfg,
                                                       tmp_path):
    """VERDICT r2 #4: a >=4-candidate wave evaluated as one vmapped program
    must (a) select the same best trial as the sequential evaluation of
    the identical candidate sequence, with per-trial scores equal to
    tolerance, and (b) run >=2x faster in wall clock (one trace/compile/
    dispatch stream instead of one per trial).  Timed at an 8-candidate
    wave: a fresh process shows ~4x, and that margin is what keeps the
    wall-clock assertion stable under full-suite load (a 4-candidate wave
    measures ~2x and flakes below the threshold under contention)."""
    import time

    import jax

    from online_neural_cdes_tpu.training.hyperopt import run_hyperopt

    # The sequential path re-traces and re-compiles per trial (each trial's
    # lr is a baked closure constant); the vmapped path compiles ONE
    # program whose per-trial lrs are runtime data.  That amortisation is
    # the measured win — the persistent disk cache would mask it on warm
    # suite re-runs, so it is disabled for the timed region.
    cfg = {**_wave_cfg, "total_trials": 8, "wave_size": 8}
    from online_neural_cdes_tpu.training.ledger import Ledger

    cache_dir = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", None)
    try:
        jax.clear_caches()
        lv = Ledger(str(tmp_path / "wv.jsonl"))
        t0 = time.perf_counter()
        vmapped = run_hyperopt({**cfg, "wave_vmap": True},
                               data_root=toy_dataset, ledger=lv,
                               run_name="wv")
        t_vmap = time.perf_counter() - t0
        jax.clear_caches()
        ls = Ledger(str(tmp_path / "ws.jsonl"))
        t0 = time.perf_counter()
        sequential = run_hyperopt({**cfg, "wave_vmap": False},
                                  data_root=toy_dataset, ledger=ls,
                                  run_name="ws")
        t_seq = time.perf_counter() - t0
    finally:
        jax.config.update("jax_compilation_cache_dir", cache_dir)

    assert vmapped["best_parameters"] == sequential["best_parameters"]
    np.testing.assert_allclose(vmapped["best_score"],
                               sequential["best_score"], rtol=1e-4)
    # Every trial's recorded score agrees, not just the winner's.
    def scores(ledger, name):
        return {int(e["config"]["trial"]): e["results"]["score"]
                for e in ledger.query(
                    lambda e: e.get("run_name") == f"{name}::trials")}

    sv, ss = scores(lv, "wv"), scores(ls, "ws")
    assert sorted(sv) == sorted(ss) == list(range(8))
    for t in sv:
        np.testing.assert_allclose(sv[t], ss[t], rtol=1e-4, atol=1e-6)
    speedup = t_seq / t_vmap
    if speedup < 2.0:
        # Wall-clock assertions are load-sensitive; re-measure once before
        # declaring a regression (a fresh process shows ~4x).
        jax.config.update("jax_compilation_cache_dir", None)
        try:
            jax.clear_caches()
            t0 = time.perf_counter()
            run_hyperopt({**cfg, "wave_vmap": True}, data_root=toy_dataset)
            t_vmap = time.perf_counter() - t0
            jax.clear_caches()
            t0 = time.perf_counter()
            run_hyperopt({**cfg, "wave_vmap": False}, data_root=toy_dataset)
            t_seq = time.perf_counter() - t0
        finally:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
        speedup = t_seq / t_vmap
    assert speedup >= 2.0, f"wave speedup {speedup:.2f}x (seq {t_seq:.1f}s, vmap {t_vmap:.1f}s)"


def test_wave_vmapped_nonshape_scalars_match_sequential(toy_dataset, _wave_cfg):
    """NEXT.md r3 #5: candidates differing in non-shape trainer scalars
    BEYOND lr — readout boost (final_lr_multiplier, a second runtime scalar
    of the step), plateau/early-stop knobs and the epoch budget (per-trial
    host bookkeeping rows) — join one vmapped wave, and every trial's
    trajectory matches its own sequential run: scores, epoch bookkeeping,
    history length and the per-epoch plateau-decay trail."""
    from online_neural_cdes_tpu.training.experiment import run_experiment
    from online_neural_cdes_tpu.training.wave import (
        run_trials_vmapped, vmappable_groups,
    )

    base = {k: v for k, v in _wave_cfg.items()
            if k not in ("total_trials", "wave_size", "search",
                         "parameterization")}
    trainers = [
        {"lr": 1e-3, "final_lr_multiplier": 10.0, "max_epochs": 4},
        {"lr": 1e-2, "final_lr_multiplier": 1.0, "max_epochs": 4},
        # Large lr + zero plateau patience: any non-improving epoch decays
        # the lr_scale trail, which must then match the sequential trail.
        {"lr": 2e-1, "final_lr_multiplier": 10.0, "plateau_patience": 0,
         "plateau_factor": 0.5, "max_epochs": 3},
    ]
    cfgs = [{**base, "trainer": {**base["trainer"], **tr}} for tr in trainers]

    points = [
        {"model__hidden_dim": 8,
         **{f"trainer__{k}": v for k, v in tr.items()}}
        for tr in trainers
    ]
    assert vmappable_groups(points) == [[0, 1, 2]]

    wave_results = run_trials_vmapped(cfgs, data_root=toy_dataset)
    for cfg, res in zip(cfgs, wave_results):
        seq = run_experiment(cfg, data_root=toy_dataset)
        np.testing.assert_allclose(res["val.loss"], seq["val.loss"],
                                   rtol=1e-4, atol=1e-6)
        assert res["epochs_run"] == seq["epochs_run"]
        assert res["best_epoch"] == seq["best_epoch"]
        # NFE stats at sequential parity (fixed-grid: parameter-independent
        # probe; review r3 — wave records previously carried None).
        assert res["nfe_per_epoch"] == seq["nfe_per_epoch"]
        assert res["nfe"] == seq["nfe"]
        assert len(res["history"]) == len(seq["history"])
        for hw, hs in zip(res["history"], seq["history"]):
            assert hw["lr_scale"] == pytest.approx(hs["lr_scale"])
            assert hw["loss"] == pytest.approx(hs["loss"], rel=1e-4, abs=1e-6)

    # Cost attribution under heterogeneous epoch budgets: one wave epoch
    # costs wall/k per lane, and a trial accrues only its own active
    # epochs — the 3-epoch trial must not be billed the wave's 4 (nor its
    # time_per_epoch inflated by lockstep epochs it sat out).
    shares = {res["time_per_epoch"] for res in wave_results}
    assert len(shares) == 1
    for res in wave_results:
        assert res["elapsed_time"] == pytest.approx(
            res["time_per_epoch"] * res["epochs_run"])
    assert wave_results[2]["epochs_run"] == 3
    assert wave_results[2]["elapsed_time"] < wave_results[0]["elapsed_time"]


def test_wave_search_resumes_from_ledger(monkeypatch, tmp_path):
    """Wave-structured searches keep the crash-resume contract: recorded
    trials replay; nothing re-runs on a second invocation."""
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
        "total_trials": 8,
        "wave_size": 3,
        "seed": 0,
        "model": {}, "trainer": {},
    }
    ledger = Ledger(str(tmp_path / "ledger.jsonl"))
    first = ho.run_hyperopt(dict(cfg), ledger=ledger, run_name="hyperopt")
    assert calls["n"] == 8
    second = ho.run_hyperopt(dict(cfg), ledger=ledger, run_name="hyperopt")
    assert calls["n"] == 8, "resumed wave search must not re-run trials"
    assert second["best_score"] == first["best_score"]
    assert second["best_parameters"] == first["best_parameters"]


def test_wave_size_one_identical_to_previous_sequential(monkeypatch):
    """wave_size=1 must reproduce the original sequential search exactly
    (same candidate rows, same best) — the default path is unchanged."""
    import online_neural_cdes_tpu.training.hyperopt as ho

    seen = []

    def fake_run_experiment(cfg, **kw):
        h = float(cfg["model"]["hidden_dim"])
        seen.append(h)
        return {"val.loss": (h - 150.0) ** 2}

    monkeypatch.setattr(ho, "run_experiment", fake_run_experiment)
    cfg = {
        "parameterization": [
            {"name": "model__hidden_dim", "type": "range", "bounds": [32, 256]},
        ],
        "evaluation_metric": "loss",
        "total_trials": 10,
        "seed": 0,
        "model": {}, "trainer": {},
    }
    a = ho.run_hyperopt(dict(cfg))
    first_seen = list(seen)
    seen.clear()
    b = ho.run_hyperopt({**cfg, "wave_size": 1})
    assert seen == first_seen
    assert a["best_score"] == b["best_score"]


def test_logsig_keeps_static_features(tmp_path):
    """logsig transforms the temporal series only; static features ride
    through untouched and the (static, temporal) batch contract holds."""
    import os

    from online_neural_cdes_tpu.data.common import (
        add_time, process_all_interpolations, save_processed,
    )
    from online_neural_cdes_tpu.data.loader import Batches, load_numpy_data

    rng = np.random.default_rng(5)
    n, length = 40, 24
    values = rng.normal(size=(n, length, 2)).astype(np.float32)
    temporal = add_time(values).astype(np.float32)
    static = rng.normal(size=(n, 5)).astype(np.float32)
    labels = (values[:, -1, 0] > 0).astype(np.float32)
    root = str(tmp_path)
    processed = process_all_interpolations(static, temporal,
                                           labels.astype(np.int64))
    save_processed(processed, labels, os.path.join(root, "T/S"))

    splits = load_numpy_data(
        os.path.join(root, "T/S/improved-neural-cdes_data.npz"),
        "logsig-2-4", use_static=True, problem="oneshot")
    train = splits[0]
    assert train.static is not None and train.static_dim == 5
    assert train.temporal.shape[1] == 24 // 4 + 1
    (st, tp), lb = next(iter(Batches(train, batch_size=16)))
    assert st.shape[1] == 5 and tp.shape[0] == st.shape[0] == lb.shape[0]


def test_train_captures_profiler_trace(toy_dataset, tmp_path):
    """train(profile_dir=...) captures a jax.profiler trace of the second
    epoch (SURVEY §5 tracing: the TPU-native observability surface)."""
    from online_neural_cdes_tpu.training.experiment import run_experiment

    trace_dir = str(tmp_path / "trace")
    cfg = {
        "dataset_name": "ToyBM",
        "seed": 0,
        "dataset": {"data_loc": "Toy/BM", "problem": "online",
                     "use_static": True, "interpolation": "linear",
                     "batch_size": 128},
        "model": {"model_string": "ncde", "hidden_dim": 8,
                   "hidden_hidden_dim": 8, "num_layers": 1,
                   "adjoint": False, "solver": "rk4"},
        "trainer": {"loss_str": "bce", "metrics": ["loss"],
                     "val_metric_to_monitor": "loss", "max_epochs": 2,
                     "profile_dir": trace_dir},
    }
    results = run_experiment(cfg, data_root=toy_dataset)
    assert np.isfinite(results["test.loss"])
    import glob

    traces = glob.glob(os.path.join(trace_dir, "**", "*"), recursive=True)
    assert any(os.path.isfile(t) for t in traces), traces


def test_wave_search_resumes_mid_wave(monkeypatch, tmp_path):
    """A crash MID-WAVE must resume bit-identically: recorded wave members
    replay, the missing ones regenerate from the same wave-start history
    (wave candidates condition on completed waves only)."""
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
        "total_trials": 9,
        "wave_size": 3,
        "seed": 0,
        "model": {}, "trainer": {},
    }
    path = str(tmp_path / "ledger.jsonl")
    full = ho.run_hyperopt(dict(cfg), ledger=Ledger(path), run_name="h")
    assert calls["n"] == 9

    # Simulate a crash after trial 7 (mid third wave): drop the last
    # trial's record from the ledger file.
    lines = [l for l in open(path).read().splitlines() if l.strip()]
    kept = [l for l in lines
            if not (json.loads(l).get("config", {}).get("trial") == 8)]
    assert len(kept) == len(lines) - 1
    with open(path + ".new", "w") as fh:
        fh.write("\n".join(kept) + "\n")
    import os

    os.replace(path + ".new", path)

    calls["n"] = 0
    resumed = ho.run_hyperopt(dict(cfg), ledger=Ledger(path), run_name="h")
    assert calls["n"] == 1, "only the lost mid-wave trial re-runs"
    assert resumed["best_score"] == full["best_score"]
    assert resumed["best_parameters"] == full["best_parameters"]


def test_fuzz_wave_sizes_reproduce_sequential_best(monkeypatch):
    """Every wave size yields the best trial its own sequential evaluation
    would (wave structure is part of the search definition; parallel
    evaluation must not change outcomes) — fake objective, no training."""
    import online_neural_cdes_tpu.training.hyperopt as ho

    def fake_run_experiment(cfg, **kw):
        h = float(cfg["model"]["hidden_dim"])
        lr = float(cfg["trainer"].get("lr", 1e-3))
        return {"val.loss": (h - 140.0) ** 2 + (np.log(lr) + 6.0) ** 2}

    monkeypatch.setattr(ho, "run_experiment", fake_run_experiment)
    cfg = {
        "parameterization": [
            {"name": "model__hidden_dim", "type": "range", "bounds": [32, 256]},
            {"name": "trainer__lr", "type": "range", "bounds": [1e-4, 1e-1],
             "log_scale": True},
        ],
        "evaluation_metric": "loss",
        "total_trials": 10,
        "seed": 3,
        "model": {}, "trainer": {},
    }
    for wave in (2, 3, 5, 10):
        a = ho.run_hyperopt({**cfg, "wave_size": wave, "wave_vmap": True})
        b = ho.run_hyperopt({**cfg, "wave_size": wave, "wave_vmap": False})
        assert a["best_score"] == b["best_score"], wave
        assert a["best_parameters"] == b["best_parameters"], wave


def test_wave_persists_each_trial_before_the_wave_ends(monkeypatch, tmp_path):
    """Review r3: a crash mid-wave must lose only the evaluation in
    flight — every trial that finished before the crash is already on the
    ledger (the wave_size=1 search's per-trial durability holds inside
    waves), and the resumed search re-runs exactly the lost tail."""
    import online_neural_cdes_tpu.training.hyperopt as ho
    from online_neural_cdes_tpu.training.ledger import Ledger

    def score_of(cfg):
        return {"val.loss": (float(cfg["model"]["hidden_dim"]) - 150.0) ** 2}

    calls = {"n": 0}

    def crashing(cfg, **kw):
        calls["n"] += 1
        if calls["n"] == 6:  # trial index 5, mid second wave of three
            raise KeyboardInterrupt
        return score_of(cfg)

    monkeypatch.setattr(ho, "run_experiment", crashing)
    cfg = {
        "parameterization": [
            {"name": "model__hidden_dim", "type": "range", "bounds": [32, 256]},
        ],
        "evaluation_metric": "loss",
        "total_trials": 9,
        "wave_size": 3,
        "seed": 0,
        "model": {}, "trainer": {},
    }
    path = str(tmp_path / "ledger.jsonl")
    with pytest.raises(KeyboardInterrupt):
        ho.run_hyperopt(dict(cfg), ledger=Ledger(path), run_name="h")
    done = sorted(
        int(e["config"]["trial"]) for e in Ledger(path).query(
            lambda e: e.get("run_name") == "h::trials")
    )
    assert done == [0, 1, 2, 3, 4], done

    calls["n"] = 0
    monkeypatch.setattr(
        ho, "run_experiment", lambda cfg, **kw: (calls.__setitem__(
            "n", calls["n"] + 1) or score_of(cfg)))
    resumed = ho.run_hyperopt(dict(cfg), ledger=Ledger(path), run_name="h")
    assert calls["n"] == 4, "only the lost trial and the unrun tail re-run"
    assert np.isfinite(resumed["best_score"])


def test_wave_rejects_incompatible_trainer_options(toy_dataset, _wave_cfg):
    """Per-trial runtime facilities (checkpoint/resume/prefetch/profiling)
    are sequential-path features; a vmapped wave must refuse them loudly
    (hyperopt then falls back to the sequential path, which honours
    them)."""
    from online_neural_cdes_tpu.training.wave import run_trials_vmapped

    cfgs = [
        {k: v for k, v in _wave_cfg.items()
         if k not in ("total_trials", "wave_size", "search",
                      "parameterization")}
        for _ in range(2)
    ]
    for i, cfg in enumerate(cfgs):
        cfg["trainer"] = {**cfg["trainer"], "lr": 1e-3 * (i + 1),
                          "checkpoint_every": 2, "checkpoint_dir": "/tmp/x"}
    with pytest.raises(ValueError, match="wave-incompatible"):
        run_trials_vmapped(cfgs, data_root=toy_dataset)


def test_wave_adaptive_nfe_tracks_sequential(toy_dataset, _wave_cfg):
    """Adaptive-solver waves re-probe NFE with each trial's own trained
    params per epoch (the sequential harness's accumulation contract) —
    records carry real numbers, close to the sequential run's."""
    from online_neural_cdes_tpu.training.experiment import run_experiment
    from online_neural_cdes_tpu.training.wave import run_trials_vmapped

    base = {k: v for k, v in _wave_cfg.items()
            if k not in ("total_trials", "wave_size", "search",
                         "parameterization")}
    base["model"] = {**base["model"], "solver": "dopri5"}
    base["trainer"] = {**base["trainer"], "max_epochs": 2}
    cfgs = [{**base, "trainer": {**base["trainer"], "lr": lr}}
            for lr in (1e-3, 1e-2)]
    wave = run_trials_vmapped(cfgs, data_root=toy_dataset)
    for cfg, res in zip(cfgs, wave):
        assert res["nfe_per_epoch"] is not None and res["nfe_per_epoch"] > 0
        seq = run_experiment(cfg, data_root=toy_dataset)
        assert seq["nfe"] > 0
        assert abs(res["nfe"] - seq["nfe"]) / seq["nfe"] < 0.05, (
            res["nfe"], seq["nfe"])


def test_train_rejects_none_final_lr_multiplier():
    """`trainer.final_lr_multiplier: null` in a config must fail with a
    clear message at the harness boundary, not a 5-vs-6-argument TypeError
    deep in the epoch loop (None is the vmapped-wave sentinel; ADVICE r3)."""
    import pytest

    from online_neural_cdes_tpu.training.harness import train

    with pytest.raises(ValueError, match="vmapped wave"):
        train(None, None, None, None, final_lr_multiplier=None)


def _seed_ledger_rows(ledger, run_name, rows):
    """Write synthetic completed runs shaped like harness.train results."""
    for i, (cfg_extra, results) in enumerate(rows):
        cfg = {"seed": cfg_extra.pop("seed", i % 2), **cfg_extra}
        ledger.save_result(cfg, results, run_name=run_name)


def test_sparsity_and_gating_tables(tmp_path):
    """sparsity_tables reproduces the reference's four table kinds
    (reference experiments/analyse.py:98-205) from synthetic ledger rows."""
    from online_neural_cdes_tpu.training import analyse

    ledger = analyse.Ledger(str(tmp_path / "ledger.jsonl"))
    rows = []
    # matmul-sparsity sweep: original + sparse at presented/unpresented
    # levels. The (matmul, original, no-sparsity) gating-grid run doubles as
    # the dense anchor, exactly as in the reference sweep.
    for dataset in ("Mortality", "SpeechCommands"):
        for seed in (0, 1):
            for vf in ("sparse", "low-rank"):
                for sp in (0.5, 0.9, 0.6):   # 0.6 is swept but not presented
                    rows.append((
                        {"seed": seed, "dataset_name": dataset,
                         "dataset": {"evaluation_metric": "auc"},
                         "model": {"model_string": "ncde", "vector_field": vf,
                                   "vector_field_type": "matmul",
                                   "sparsity": sp}},
                        {"test.auc": 0.85, "num_params": int(1000 * (1 - sp))},
                    ))
            # gating grid: no sparsity, all contraction x gating combos.
            for vft in ("matmul", "evaluate", "derivative"):
                for gating in ("original", "minimal", "gru"):
                    dense_anchor = vft == "matmul" and gating == "original"
                    rows.append((
                        {"seed": seed, "dataset_name": dataset,
                         "dataset": {"evaluation_metric": "auc"},
                         "model": {"model_string": "ncde",
                                   "vector_field": gating,
                                   "vector_field_type": vft}},
                        {"test.auc": 0.90 + 0.01 * seed if dense_anchor
                         else 0.88, "num_params": 1000},
                    ))
    _seed_ledger_rows(ledger, "sparsity", rows)

    tables = analyse.sparsity_tables(ledger, "sparsity")
    sp_irr = tables["sparsity_irregular"]
    # Rows: original + 2 fields x 2 presented sparsities; 0.6 filtered out.
    assert len(sp_irr) == 5
    assert 0.6 not in sp_irr.index.get_level_values(1)
    # Parameter fraction normalised by the dense original's count.
    frac = sp_irr[("Mortality", "Parameter fraction")]
    assert frac.iloc[0] == 1.0 and frac.min() < 0.2
    # Mean +/- std over the two seeds for the original row.
    assert "0.905" in sp_irr[("Mortality", "Test metric")].iloc[0]
    # Dataset split respected.
    assert all(c[0] == "Mortality" for c in sp_irr.columns)
    assert all(c[0] == "SpeechCommands"
               for c in tables["sparsity_regular"].columns)

    gating = tables["gating_irregular"]
    assert len(gating) == 9  # 3 contractions x 3 gatings
    assert r"$f(z) \dby X$" in gating.index.get_level_values(0)
    assert "GRU" in gating.index.get_level_values(1)


def test_medical_sota_table_and_writer(tmp_path):
    """medical_sota_table orders/renames rows like the reference
    (analyse.py:208-250); write_analysis_tables emits the .tex set."""
    from online_neural_cdes_tpu.training import analyse

    ledger = analyse.Ledger(str(tmp_path / "ledger.jsonl"))
    rows = []
    for dataset in ("Mortality", "LOS"):
        for model, interp in (
            ("odernn", None), ("gru", None), ("gru-d", None),
            ("ncde", "rectilinear"), ("ncde", "rectilinear-intensity"),
        ):
            cfg = {"dataset_name": dataset,
                   "dataset": {"evaluation_metric": "auc",
                               "interpolation": interp},
                   "model": {"model_string": model}}
            rows.append((cfg, {"test.auc": 0.8, "num_params": 10,
                               "nfe_per_epoch": 1200.0}))
    _seed_ledger_rows(ledger, "sota", rows)

    # Matching-region sensitivity runs (reference eps_frame) live in their
    # own suite, like the reference's interpolation-v2 collection.
    eps_rows = []
    for dataset in ("Mortality", "LOS"):
        for eps in (0.1, 1.0):
            cfg = {"dataset_name": dataset,
                   "dataset": {"evaluation_metric": "auc",
                               "interpolation": "linear_cubic_smoothing"},
                   "model": {"model_string": "ncde",
                             "interpolation_eps": eps}}
            eps_rows.append((cfg, {"test.auc": 0.82, "num_params": 10,
                                   "nfe_per_epoch": 900.0}))
    _seed_ledger_rows(ledger, "interp", eps_rows)

    eps_table = analyse.interpolation_eps_table(ledger, "interp")
    assert eps_table.shape == (2, 2)  # 2 eps values x 2 datasets
    assert set(eps_table.index.get_level_values(1)) == {0.1, 1.0}

    table = analyse.medical_sota_table(ledger, "sota")
    # Reference row order: GRU first, NCDE variants last (analyse.py:223-242).
    assert list(table.index) == [
        "GRU", "GRU-D", "ODE-RNN", "NCDE (rectilinear)",
        "NCDE (rectilinear-intensity)",
    ]
    assert set(table.columns) == {"Mortality", "LOS"}
    latex = analyse.medical_sota_table(ledger, "sota", latex=True)
    assert "NCDE (rectilinear)" in latex

    out = tmp_path / "results"
    written = analyse.write_analysis_tables(ledger, str(out), "sota")
    names = {str(p).replace(str(out) + "/", "") for p in written}
    assert "medical-sota.tex" in names
    assert "interpolation/metric_nfe_irregular.tex" in names
    written_eps = analyse.write_analysis_tables(
        ledger, str(tmp_path / "results_interp"), "interp"
    )
    eps_names = {os.path.basename(p) for p in written_eps}
    assert "eps_frame_irregular.tex" in eps_names
    for p in written:
        assert open(p).read().startswith("\\begin{tabular}")


def test_seed_averaged_per_dataset_rounding():
    """The eval metric formats with the reference's per-dataset precision
    (ROUNDING, reference analyse.py:62-70,364-373): Beijing RMSE at 1
    decimal, classification metrics at 3."""
    import pandas as pd

    from online_neural_cdes_tpu.training import analyse

    frame = pd.DataFrame([
        {"dataset_name": "BeijingPM10", "model": "ncde", "seed": 0,
         "test_metric": 62.337},
        {"dataset_name": "BeijingPM10", "model": "ncde", "seed": 1,
         "test_metric": 63.021},
        {"dataset_name": "Mortality", "model": "ncde", "seed": 0,
         "test_metric": 0.8123},
        {"dataset_name": "Mortality", "model": "ncde", "seed": 1,
         "test_metric": 0.8251},
    ])
    t = analyse.seed_averaged(frame)
    assert t.loc["ncde", "BeijingPM10"] == r"62.7 $\pm$ 0.3"
    assert t.loc["ncde", "Mortality"] == r"0.819 $\pm$ 0.006"


def test_compute_dtype_mixed_precision_step(toy_dataset):
    """trainer.compute_dtype='bfloat16' (AMP-style): master weights and
    optimizer state stay f32 while the fwd+bwd runs at bf16 storage —
    losses track the f32 step to reduced-precision tolerance and still
    decrease, and an end-to-end experiment stays finite."""
    import jax
    import jax.numpy as jnp

    from online_neural_cdes_tpu.models.ncde import NeuralCDE
    from online_neural_cdes_tpu.ops.interpolation import (
        linear_interpolation_coeffs,
    )
    from online_neural_cdes_tpu.training.loop import (
        init_adam_state, make_train_step,
    )

    rng = np.random.default_rng(0)
    B, L, C, H = 16, 10, 3, 8
    x = rng.normal(size=(B, L, C)).astype(np.float32)
    x[:, :, 0] = np.arange(L)
    coeffs = linear_interpolation_coeffs(jnp.asarray(x), rectilinear=0)
    labels = jnp.asarray(rng.integers(0, 2, size=(B, L)).astype(np.float32))
    model = NeuralCDE(input_dim=C, hidden_dim=H, output_dim=1,
                      hidden_hidden_dim=H, num_layers=1,
                      interpolation="rectilinear", return_sequences=True,
                      adjoint=True, solver="rk4")
    params0 = model.init(jax.random.PRNGKey(0))

    losses = {}
    for cdt in (None, "bfloat16"):
        step = make_train_step(model.apply, lr=1e-2, donate=False,
                               compute_dtype=cdt)
        params, opt_state = params0, init_adam_state(params0)
        vals = []
        for _ in range(8):
            params, opt_state, v = step(params, opt_state, coeffs, labels,
                                        1.0)
            vals.append(float(v))
        # Master weights stay f32 whatever the compute dtype.
        assert {str(l.dtype) for l in jax.tree.leaves(params)} == {"float32"}
        assert vals[-1] < vals[0]
        losses[cdt] = vals
    np.testing.assert_allclose(losses["bfloat16"], losses[None],
                               rtol=0.05, atol=0.02)

    # End-to-end through the config path.
    from online_neural_cdes_tpu.training.experiment import run_experiment
    from online_neural_cdes_tpu.training.config import parse_configuration_json

    cfg = parse_configuration_json("toy")[0][0]
    cfg["trainer"]["compute_dtype"] = "bfloat16"
    cfg["trainer"]["max_epochs"] = 2
    results = run_experiment(cfg, data_root=toy_dataset)
    assert np.isfinite(results["test.loss"])


def test_wave_honours_compute_dtype(toy_dataset, _wave_cfg):
    """trainer.compute_dtype rides the wave's shared traced program (it is
    trial-invariant): vmapped per-trial results match the sequential path
    running the same mixed-precision config."""
    from online_neural_cdes_tpu.training.experiment import run_experiment
    from online_neural_cdes_tpu.training.wave import run_trials_vmapped

    base = {k: v for k, v in _wave_cfg.items()
            if k not in ("total_trials", "wave_size", "search",
                         "parameterization")}
    cfgs = []
    for i in range(2):
        cfg = {**base, "trainer": {**base["trainer"], "lr": 1e-3 * (i + 1),
                                   "compute_dtype": "bfloat16"}}
        cfgs.append(cfg)
    wave = run_trials_vmapped(cfgs, data_root=toy_dataset)
    for cfg, res in zip(cfgs, wave):
        seq = run_experiment(cfg, data_root=toy_dataset)
        # Same bf16 arithmetic on both paths -> close final metrics.
        assert np.isfinite(res["test.loss"])
        np.testing.assert_allclose(res["test.loss"], seq["test.loss"],
                                   rtol=0.05, atol=0.02)


def test_epoch_fused_trainer_matches_default(toy_dataset):
    """trainer.epoch_fused=True (one lax.scan dispatch per epoch over the
    pre-stacked batches) reproduces the default per-step trainer exactly —
    same update order, same final metrics — including a ragged tail batch
    that falls back to the per-step path."""
    from online_neural_cdes_tpu.training.config import parse_configuration_json
    from online_neural_cdes_tpu.training.experiment import run_experiment

    base = parse_configuration_json("toy")[0][0]
    base["trainer"]["max_epochs"] = 3
    for bs in (32, 40):  # 96 train paths: 3 uniform batches / 2+ragged 16
        cfg_a = {**base, "dataset": {**base["dataset"], "batch_size": bs}}
        cfg_b = {**cfg_a, "trainer": {**cfg_a["trainer"],
                                      "epoch_fused": True}}
        res_a = run_experiment(cfg_a, data_root=toy_dataset)
        res_b = run_experiment(cfg_b, data_root=toy_dataset)
        np.testing.assert_allclose(res_b["test.loss"], res_a["test.loss"],
                                   rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(res_b["test.auc"], res_a["test.auc"],
                                   rtol=1e-6, atol=1e-7)


def test_epoch_fused_rejects_prefetch(toy_dataset):
    import pytest

    from online_neural_cdes_tpu.training.harness import train

    with pytest.raises(ValueError, match="mutually exclusive"):
        train(None, None, None, None, epoch_fused=True, prefetch=2)


def test_grad_accumulation_matches_full_batch_step():
    """accum_steps=N (microbatched sum-form losses, one update) reproduces
    the full-batch step — same loss and same params after an update — for
    bce and rmse (the sqrt chain rule), including NaN-masked labels."""
    import jax
    import jax.numpy as jnp

    from online_neural_cdes_tpu.models.ncde import NeuralCDE
    from online_neural_cdes_tpu.ops.interpolation import (
        linear_interpolation_coeffs,
    )
    from online_neural_cdes_tpu.training.loop import (
        init_adam_state, make_train_step,
    )

    rng = np.random.default_rng(0)
    B, L, C, H = 16, 8, 3, 6
    x = rng.normal(size=(B, L, C)).astype(np.float32)
    x[:, :, 0] = np.arange(L)
    coeffs = linear_interpolation_coeffs(jnp.asarray(x), rectilinear=0)
    labels = rng.integers(0, 2, size=(B, L)).astype(np.float32)
    labels[3, 2] = np.nan  # masked entry inside a microbatch
    labels = jnp.asarray(labels)
    model = NeuralCDE(input_dim=C, hidden_dim=H, output_dim=1,
                      hidden_hidden_dim=H, num_layers=1,
                      interpolation="rectilinear", return_sequences=True,
                      adjoint=True, solver="rk4")
    params0 = model.init(jax.random.PRNGKey(0))

    for loss in ("bce", "rmse"):
        full = make_train_step(model.apply, loss=loss, lr=1e-2, donate=False)
        accum = make_train_step(model.apply, loss=loss, lr=1e-2,
                                donate=False, accum_steps=4)
        p_f, _, v_f = full(params0, init_adam_state(params0), coeffs,
                           labels, 1.0)
        p_a, _, v_a = accum(params0, init_adam_state(params0), coeffs,
                            labels, 1.0)
        np.testing.assert_allclose(float(v_a), float(v_f),
                                   rtol=1e-6, atol=1e-7)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
            p_a, p_f,
        )

    # Indivisible batch fails with the fix at trace time.
    import pytest
    bad = make_train_step(model.apply, loss="bce", lr=1e-2, donate=False,
                          accum_steps=5)
    with pytest.raises(ValueError, match="divide"):
        bad(params0, init_adam_state(params0), coeffs, labels, 1.0)


def test_cli_data_parallel_sweep(toy_dataset, tmp_path, capsys):
    """--data-parallel N trains the suite over an N-device mesh through
    the CLI (the virtual CPU mesh stands in for a slice)."""
    from online_neural_cdes_tpu.run import main

    ledger = str(tmp_path / "ledger.jsonl")
    main(["toy", "--data-root", toy_dataset, "--ledger", ledger,
          "--data-parallel", "2"])
    out = capsys.readouterr().out
    assert "completed 1 configs" in out
