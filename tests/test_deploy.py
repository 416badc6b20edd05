"""Checkpoint -> serving-artifact CLI tests: rebuild a trained config
through the experiment path, export, and serve raw corpus rows identically
to the harness forward on the stored coefficients."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from online_neural_cdes_tpu.deploy import (
    build_predictor_from_config, main, serving_coeff_fn,
)
from online_neural_cdes_tpu.serving_export import load_predictor
from online_neural_cdes_tpu.training.experiment import load_and_setup
from online_neural_cdes_tpu.utils.checkpoint import save_checkpoint


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """Dense one-shot corpus, length 48 (a multiple of the test bucket
    multiple, so serving a full-length row involves no padding and must
    reproduce the stored-coefficient forward exactly)."""
    from online_neural_cdes_tpu.data.common import (
        add_time, process_all_interpolations, save_processed,
    )

    rng = np.random.default_rng(11)
    n, length = 40, 48
    values = np.cumsum(rng.normal(size=(n, length, 2)), axis=1) * 0.2
    drop = rng.uniform(size=values[..., 1].shape) < 0.15
    values[..., 1][drop] = np.nan
    temporal = add_time(values).astype(np.float32)
    labels = (np.nanmean(values[:, :, 0], axis=1) > 0).astype(np.int64)
    root = str(tmp_path_factory.mktemp("cli_corpus"))
    processed = process_all_interpolations(None, temporal, labels)
    save_processed(processed, labels.astype(np.float32),
                   os.path.join(root, "Toy/CLI"))
    return root


def _config(interpolation, model_string="ncde"):
    return {
        "dataset_name": "toy-cli",
        "seed": 0,
        "dataset": {
            "data_loc": "Toy/CLI",
            "problem": "oneshot",
            "use_static": False,
            "interpolation": interpolation,
            "batch_size": 16,
        },
        "model": {
            "model_string": model_string,
            "hidden_dim": 8,
            "hidden_hidden_dim": 8,
            "num_layers": 1,
            "adjoint": False,
            "solver": "rk4",
        },
    }


@pytest.mark.parametrize("interpolation", ["linear", "rectilinear"])
def test_cli_exports_and_serves_corpus_rows(tmp_path, corpus, interpolation):
    """End-to-end: init params -> checkpoint -> CLI main() -> load artifact
    -> serving a raw corpus row equals the harness forward on the npz's
    precomputed coefficients for that row."""
    config = _config(interpolation)
    bundle, splits = load_and_setup(config, corpus)
    params = bundle.init(jax.random.PRNGKey(3))
    ckpt = save_checkpoint(str(tmp_path / "best_params"), params,
                           use_orbax=False)
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps(config))

    out = str(tmp_path / "artifact")
    main([
        "--config", str(cfg_path), "--checkpoint", ckpt, "--out", out,
        "--data-root", corpus, "--batch-buckets", "4",
        "--length-multiple", "8", "--platforms", "cpu",
    ])

    npz = np.load(
        os.path.join(corpus, "Toy/CLI/improved-neural-cdes_data.npz"),
        allow_pickle=True,
    )
    idx = npz["test_idxs"][:3]
    raw = npz["temporal_data_raw"][idx]
    coeffs = npz[f"temporal_data_{interpolation}"][idx]

    served = load_predictor(out).predict([r for r in raw])
    direct = np.asarray(
        bundle.apply_fn(params, jnp.asarray(coeffs, jnp.float32))
    )
    for i in range(len(idx)):
        np.testing.assert_allclose(served[i], direct[i],
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("model_string", ["ncde-stacked", "ncde-attention"])
def test_composite_ncde_variants_serve_through_builder(
        tmp_path, corpus, model_string):
    """The composite NCDE variants deploy through the same builder: raw
    corpus rows serve equal to the bundle forward on the stored
    coefficients (they consume linear coefficients like the plain NCDE)."""
    config = _config("linear", model_string=model_string)
    bundle, _ = load_and_setup(config, corpus)
    params = bundle.init(jax.random.PRNGKey(12))
    ckpt = save_checkpoint(str(tmp_path / "ckpt"), params, use_orbax=False)
    predictor, info = build_predictor_from_config(
        config, ckpt, data_root=corpus, batch_buckets=(4,),
        length_multiple=8,
    )
    assert info["model_string"] == model_string
    npz = np.load(
        os.path.join(corpus, "Toy/CLI/improved-neural-cdes_data.npz"),
        allow_pickle=True,
    )
    idx = npz["test_idxs"][:2]
    raw = npz["temporal_data_raw"][idx]
    served = predictor.predict([r for r in raw])
    direct = np.asarray(bundle.apply_fn(
        params, jnp.asarray(npz["temporal_data_linear"][idx], jnp.float32)
    ))
    for i in range(len(idx)):
        np.testing.assert_allclose(served[i], direct[i],
                                   rtol=1e-5, atol=1e-6)


def test_cli_logsig_config_serves_raw_rows(tmp_path, corpus):
    """A log-ODE config exports with the window transform inside the
    artifact: served raw rows equal the forward on the loader's
    transformed windows."""
    config = _config("logsig-2-8")
    bundle, splits = load_and_setup(config, corpus)
    params = bundle.init(jax.random.PRNGKey(4))
    predictor, info = build_predictor_from_config(
        config, save_checkpoint(str(tmp_path / "ckpt"), params,
                                use_orbax=False),
        data_root=corpus, batch_buckets=(4,), length_multiple=8,
    )
    assert info["channels"] == 3  # raw request channels, not logsig width

    npz = np.load(
        os.path.join(corpus, "Toy/CLI/improved-neural-cdes_data.npz"),
        allow_pickle=True,
    )
    idx = npz["test_idxs"][:2]
    raw = npz["temporal_data_raw"][idx]
    served = predictor.predict([r for r in raw])
    # The loader's own transform of the same rows is the oracle.
    test_data = splits[2]
    pos = {int(j): k for k, j in enumerate(npz["test_idxs"])}
    direct_rows = np.stack([test_data.temporal[pos[int(j)]] for j in idx])
    direct = np.asarray(
        bundle.apply_fn(params, jnp.asarray(direct_rows, jnp.float32))
    )
    for i in range(len(idx)):
        np.testing.assert_allclose(served[i], direct[i],
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.smoke
def test_cli_update_params_only_rolls_checkpoint(tmp_path, corpus):
    """A retrained checkpoint deploys with --update-params-only: the
    existing artifact (and its nested stepper artifact) gets the new
    weights atomically, and serves the retrained outputs."""
    from online_neural_cdes_tpu.serving_export import load_predictor

    config = _config("rectilinear")
    bundle, _ = load_and_setup(config, corpus)
    params_v1 = bundle.init(jax.random.PRNGKey(20))
    params_v2 = bundle.init(jax.random.PRNGKey(21))
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps(config))
    out = str(tmp_path / "artifact")
    ckpt1 = save_checkpoint(str(tmp_path / "ckpt1"), params_v1,
                            use_orbax=False)
    main([
        "--config", str(cfg_path), "--checkpoint", ckpt1, "--out", out,
        "--data-root", corpus, "--batch-buckets", "4",
        "--length-multiple", "8", "--platforms", "cpu",
        "--stepper", "--stream-batch-sizes", "2",
    ])
    ckpt2 = save_checkpoint(str(tmp_path / "ckpt2"), params_v2,
                            use_orbax=False)
    main([
        "--config", str(cfg_path), "--checkpoint", ckpt2, "--out", out,
        "--data-root", corpus, "--update-params-only",
    ])
    npz = np.load(
        os.path.join(corpus, "Toy/CLI/improved-neural-cdes_data.npz"),
        allow_pickle=True,
    )
    idx = npz["test_idxs"][:2]
    raw = npz["temporal_data_raw"][idx]
    served = load_predictor(out).predict([r for r in raw])
    direct = np.asarray(bundle.apply_fn(
        params_v2,
        jnp.asarray(npz["temporal_data_rectilinear"][idx], jnp.float32),
    ))
    for i in range(len(idx)):
        np.testing.assert_allclose(served[i], direct[i],
                                   rtol=1e-5, atol=1e-6)


def test_cli_stepper_flag_exports_streaming_artifact(tmp_path, corpus):
    """--stepper adds a streaming artifact at <out>/stepper whose ticks
    match a live OnlineNCDEStepper built from the same checkpoint."""
    from online_neural_cdes_tpu.serving import OnlineNCDEStepper
    from online_neural_cdes_tpu.serving_export import load_stepper

    config = _config("rectilinear")
    bundle, _ = load_and_setup(config, corpus)
    params = bundle.init(jax.random.PRNGKey(6))
    ckpt = save_checkpoint(str(tmp_path / "best_params"), params,
                           use_orbax=False)
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps(config))
    out = str(tmp_path / "artifact")
    main([
        "--config", str(cfg_path), "--checkpoint", ckpt, "--out", out,
        "--data-root", corpus, "--batch-buckets", "4",
        "--length-multiple", "8", "--platforms", "cpu",
        "--stepper", "--stream-batch-sizes", "2",
    ])

    npz = np.load(
        os.path.join(corpus, "Toy/CLI/improved-neural-cdes_data.npz"),
        allow_pickle=True,
    )
    x = np.asarray(npz["temporal_data_raw"][npz["test_idxs"][:2]],
                   np.float32)
    live = OnlineNCDEStepper(bundle.model, params)
    loaded = load_stepper(os.path.join(out, "stepper"))
    s_live, s_art = live.init(x[:, 0]), loaded.init(x[:, 0])
    for k in range(1, 5):
        s_live, y_live = live.step(s_live, x[:, k])
        s_art, y_art = loaded.step(s_art, x[:, k])
        np.testing.assert_array_equal(np.asarray(y_live), np.asarray(y_art))


def test_stepper_build_rejects_non_ncde(tmp_path, corpus):
    config = _config("linear", model_string="gru-d")
    config["model"]["return_sequences"] = True
    bundle, _ = load_and_setup(config, corpus)
    params = bundle.init(jax.random.PRNGKey(7))
    ckpt = save_checkpoint(str(tmp_path / "ckpt"), params, use_orbax=False)
    from online_neural_cdes_tpu.deploy import (
        build_stepper_from_config,
    )
    with pytest.raises(ValueError, match="plain NCDE"):
        build_stepper_from_config(config, ckpt, data_root=corpus)


def test_recurrent_oneshot_config_rejected(tmp_path, corpus):
    """A recurrent one-shot config cannot serve (padding would keep
    mutating the final state) — the CLI surfaces predictor_from_bundle's
    loud recipe instead of exporting a wrong artifact."""
    config = _config(None, model_string="gru-dt")
    bundle, _ = load_and_setup(config, corpus)
    params = bundle.init(jax.random.PRNGKey(5))
    ckpt = save_checkpoint(str(tmp_path / "ckpt"), params, use_orbax=False)
    with pytest.raises(ValueError, match="return_sequences"):
        build_predictor_from_config(config, ckpt, data_root=corpus)


@pytest.fixture(scope="module")
def static_corpus(tmp_path_factory):
    """A corpus WITH static features (the MIMIC-shaped scenario)."""
    from online_neural_cdes_tpu.data.common import (
        add_time, process_all_interpolations, save_processed,
    )

    rng = np.random.default_rng(13)
    n, length, S = 30, 16, 3
    values = np.cumsum(rng.normal(size=(n, length, 2)), axis=1) * 0.2
    temporal = add_time(values).astype(np.float32)
    static = rng.normal(size=(n, S)).astype(np.float32)
    labels = (values[:, -1, 0] > 0).astype(np.int64)
    root = str(tmp_path_factory.mktemp("static_corpus"))
    processed = process_all_interpolations(static, temporal, labels)
    save_processed(processed, labels.astype(np.float32),
                   os.path.join(root, "Toy/Static"))
    return root


def test_cli_static_featured_config_serves(tmp_path, static_corpus):
    """The MIMIC-shaped scenario: a static-featured NCDE config exports
    with static in the artifact signature and serves (static, raw-rows)
    requests equal to the bundle forward on the stored data."""
    from online_neural_cdes_tpu.serving_export import load_predictor

    root = static_corpus
    S = 3
    config = _config("linear")
    config["dataset"]["data_loc"] = "Toy/Static"
    config["dataset"]["use_static"] = True
    bundle, splits = load_and_setup(config, root)
    assert splits[0].static_dim == S
    params = bundle.init(jax.random.PRNGKey(14))
    ckpt = save_checkpoint(str(tmp_path / "ckpt"), params, use_orbax=False)
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps(config))
    out = str(tmp_path / "artifact")
    main([
        "--config", str(cfg_path), "--checkpoint", ckpt, "--out", out,
        "--data-root", root, "--batch-buckets", "4",
        "--length-multiple", "16", "--platforms", "cpu",
    ])

    npz = np.load(
        os.path.join(root, "Toy/Static/improved-neural-cdes_data.npz"),
        allow_pickle=True,
    )
    idx = npz["test_idxs"][:3]
    raw = npz["temporal_data_raw"][idx]
    st = npz["static_data"][idx].astype(np.float32)
    served = load_predictor(out).predict([r for r in raw], static=st)
    direct = np.asarray(bundle.apply_fn(
        params,
        (jnp.asarray(st),
         jnp.asarray(npz["temporal_data_linear"][idx], jnp.float32)),
    ))
    for i in range(len(idx)):
        np.testing.assert_allclose(served[i], direct[i],
                                   rtol=1e-5, atol=1e-6)


def test_cli_static_stepper_exports_and_streams(tmp_path, static_corpus):
    """--stepper on a static-featured rectilinear config: the streaming
    artifact binds per-stream statics at load and its ticks match a live
    stepper carrying the same statics."""
    from online_neural_cdes_tpu.serving import OnlineNCDEStepper
    from online_neural_cdes_tpu.serving_export import load_stepper

    root = static_corpus
    config = _config("rectilinear")
    config["dataset"]["data_loc"] = "Toy/Static"
    config["dataset"]["use_static"] = True
    bundle, _ = load_and_setup(config, root)
    params = bundle.init(jax.random.PRNGKey(15))
    ckpt = save_checkpoint(str(tmp_path / "ckpt"), params, use_orbax=False)
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps(config))
    out = str(tmp_path / "artifact")
    main([
        "--config", str(cfg_path), "--checkpoint", ckpt, "--out", out,
        "--data-root", root, "--batch-buckets", "4",
        "--length-multiple", "16", "--platforms", "cpu",
        "--stepper", "--stream-batch-sizes", "3",
    ])

    npz = np.load(
        os.path.join(root, "Toy/Static/improved-neural-cdes_data.npz"),
        allow_pickle=True,
    )
    idx = npz["test_idxs"][:3]
    x = np.asarray(npz["temporal_data_raw"][idx], np.float32)
    st = jnp.asarray(npz["static_data"][idx], jnp.float32)
    live = OnlineNCDEStepper(bundle.model, params, static=st)
    loaded = load_stepper(os.path.join(out, "stepper"), static=st)
    s_live, s_art = live.init(x[:, 0]), loaded.init(x[:, 0])
    for k in range(1, 5):
        s_live, y_live = live.step(s_live, x[:, k])
        s_art, y_art = loaded.step(s_art, x[:, k])
        np.testing.assert_array_equal(np.asarray(y_live), np.asarray(y_art))


def test_intensity_coeff_fn_rejected_with_recipe():
    with pytest.raises(ValueError, match="rectilinear-intensity"):
        serving_coeff_fn("rectilinear-intensity")


@pytest.mark.parametrize("key", ["cubic", "hermite"])
def test_global_spline_keys_rejected_with_recipe(key):
    """Cubic/hermite coefficient builds are not pad-inert (global solve /
    derivative-carrying pad pieces), so padded serving would silently skew
    vs the training forward — rejected with the full-length recipe."""
    with pytest.raises(ValueError, match="length padding"):
        serving_coeff_fn(key)


def test_missing_interpolation_key_rejected_clearly():
    with pytest.raises(ValueError, match="no dataset interpolation key"):
        serving_coeff_fn(None)


def test_explicit_coeff_fn_overrides_unsupported_keys(tmp_path, corpus):
    """A caller with a client-side transform can serve any key: the
    explicit coeff_fn suppresses serving_coeff_fn entirely (it must not
    even be evaluated, or its rejection would fire for nothing)."""
    from online_neural_cdes_tpu.ops.interpolation import (
        hermite_cubic_coefficients_with_backward_differences as herm,
    )

    config = _config("hermite")
    bundle, _ = load_and_setup(config, corpus)
    params = bundle.init(jax.random.PRNGKey(8))
    ckpt = save_checkpoint(str(tmp_path / "ckpt"), params, use_orbax=False)

    def herm_fn(x):  # the preprocessing's first-row NaN fill + builder
        first = jnp.where(jnp.isnan(x[:, :1]), 0.0, x[:, :1])
        return herm(jnp.concatenate([first, x[:, 1:]], axis=1))

    predictor, info = build_predictor_from_config(
        config, ckpt, data_root=corpus, coeff_fn=herm_fn,
        batch_buckets=(4,), length_multiple=48,
    )
    # Full-length requests (the recipe's condition): exact vs the stored
    # coefficients.
    npz = np.load(
        os.path.join(corpus, "Toy/CLI/improved-neural-cdes_data.npz"),
        allow_pickle=True,
    )
    idx = npz["test_idxs"][:2]
    raw = npz["temporal_data_raw"][idx]
    served = predictor.predict([r for r in raw])
    direct = np.asarray(bundle.apply_fn(
        params, jnp.asarray(npz["temporal_data_hermite"][idx], jnp.float32)
    ))
    for i in range(len(idx)):
        np.testing.assert_allclose(served[i], direct[i],
                                   rtol=1e-5, atol=1e-6)


def test_recurrent_interpolation_escape_hatch_serves(tmp_path, corpus):
    """The rejection's own recipe works: an explicit coeff_fn composing
    the training-time interpolation into the bundle's preparation serves a
    recurrent interpolated config — the guard must not fire when the
    caller provides it."""
    config = _config("linear", model_string="gru-d")
    config["model"]["return_sequences"] = True
    config["dataset"]["problem"] = "online"
    bundle, splits = load_and_setup(config, corpus)
    params = bundle.init(jax.random.PRNGKey(10))
    ckpt = save_checkpoint(str(tmp_path / "ckpt"), params, use_orbax=False)

    coeff = serving_coeff_fn("linear")  # the corpus's stored-row transform

    def prepared_fn(x):
        return bundle.prepare_batch(coeff(x))

    predictor, _ = build_predictor_from_config(
        config, ckpt, data_root=corpus, coeff_fn=prepared_fn,
        batch_buckets=(4,), length_multiple=48,
    )
    npz = np.load(
        os.path.join(corpus, "Toy/CLI/improved-neural-cdes_data.npz"),
        allow_pickle=True,
    )
    idx = npz["test_idxs"][:2]
    raw = npz["temporal_data_raw"][idx]
    served = predictor.predict([r for r in raw])
    direct = np.asarray(bundle.apply_fn(
        params,
        bundle.prepare_batch(
            jnp.asarray(npz["temporal_data_linear"][idx], jnp.float32)
        ),
    ))
    for i in range(len(idx)):
        np.testing.assert_allclose(served[i], direct[i],
                                   rtol=1e-5, atol=1e-6)


def test_recurrent_config_with_interpolation_rejected(tmp_path, corpus):
    """A recurrent model trained on interpolated rows cannot serve raw
    rows (mask/delta skew) — rejected with the interpolation: null
    recipe."""
    config = _config("linear", model_string="gru-d")
    config["dataset"]["problem"] = "online"
    bundle, _ = load_and_setup(config, corpus)
    params = bundle.init(jax.random.PRNGKey(9))
    ckpt = save_checkpoint(str(tmp_path / "ckpt"), params, use_orbax=False)
    with pytest.raises(ValueError, match="interpolation: null"):
        build_predictor_from_config(config, ckpt, data_root=corpus)


def test_cli_params_dtype_bf16_export(tmp_path, corpus):
    """--params-dtype bfloat16 exports a reduced-precision artifact that
    serves within bf16 tolerance of the f32 one."""
    config = _config("linear")
    bundle, _ = load_and_setup(config, corpus)
    params = bundle.init(jax.random.PRNGKey(3))
    ckpt = save_checkpoint(str(tmp_path / "best_params"), params,
                           use_orbax=False)
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps(config))

    out32, out16 = str(tmp_path / "a32"), str(tmp_path / "a16")
    base = ["--config", str(cfg_path), "--checkpoint", ckpt,
            "--data-root", corpus, "--batch-buckets", "4",
            "--length-multiple", "8", "--platforms", "cpu"]
    main(base + ["--out", out32])
    main(base + ["--out", out16, "--params-dtype", "bfloat16"])

    manifest = json.load(open(os.path.join(out16, "manifest.json")))
    assert all(d == "bfloat16" for d in manifest["leaf_dtypes"]
               if "float" in d), manifest["leaf_dtypes"]

    npz = np.load(
        os.path.join(corpus, "Toy/CLI/improved-neural-cdes_data.npz"),
        allow_pickle=True,
    )
    raw = npz["temporal_data_raw"][npz["test_idxs"][:3]]
    a = load_predictor(out32).predict([r for r in raw])
    b = load_predictor(out16).predict([r for r in raw])
    for x, y in zip(a, b):
        np.testing.assert_allclose(x, y, rtol=0.05, atol=0.05)


def test_cli_verify_gate(tmp_path, corpus, capsys):
    """--verify reloads the freshly exported artifact and asserts it
    serves identically to the live predictor before the CLI returns."""
    config = _config("linear")
    bundle, _ = load_and_setup(config, corpus)
    params = bundle.init(jax.random.PRNGKey(3))
    ckpt = save_checkpoint(str(tmp_path / "best_params"), params,
                           use_orbax=False)
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps(config))

    main(["--config", str(cfg_path), "--checkpoint", ckpt,
          "--out", str(tmp_path / "a"), "--data-root", corpus,
          "--batch-buckets", "4", "--length-multiple", "8",
          "--platforms", "cpu", "--verify"])
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["verified"] == "bit-exact"

    # --verify also gates checkpoint rolls (--update-params-only).
    main(["--config", str(cfg_path), "--checkpoint", ckpt,
          "--out", str(tmp_path / "a"), "--data-root", corpus,
          "--update-params-only", "--verify"])
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["leaves_updated"] > 0
    assert summary["verified"] == "bit-exact"


def test_bf16_metric_gate_passes_and_fails_by_threshold(tmp_path, corpus,
                                                        capsys):
    """Reduced-precision exports under --verify pass a TASK-METRIC gate on
    the config's val split (a raw output deviation is not a quality
    statement): a healthy bf16 export scores within --metric-tol of the
    live f32 predictor, and an artifact whose weights drifted (a bad
    checkpoint roll) fails by threshold before it can serve."""
    from online_neural_cdes_tpu.deploy import _rebuild, _task_metric_gate
    from online_neural_cdes_tpu.serving_export import update_params

    config = _config("linear")
    bundle, _ = load_and_setup(config, corpus)
    params = bundle.init(jax.random.PRNGKey(3))
    ckpt = save_checkpoint(str(tmp_path / "best_params"), params,
                           use_orbax=False)
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps(config))

    out16 = str(tmp_path / "a16")
    main(["--config", str(cfg_path), "--checkpoint", ckpt, "--out", out16,
          "--data-root", corpus, "--batch-buckets", "4",
          "--length-multiple", "8", "--platforms", "cpu", "--params-dtype",
          "bfloat16", "--verify"])
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    gate = summary["metric_gate"]
    assert set(gate["metrics"]) == {"auc", "acc"}, gate
    for vals in gate["metrics"].values():
        assert vals["abs_delta"] <= gate["tol"], gate

    # Failing-by-threshold path: roll DIFFERENT weights into the artifact
    # behind the live predictor's back; the val-split metrics depart and
    # the gate must refuse.
    update_params(out16, jax.tree.map(lambda a: a * 5.0, params))
    rebuilt = _rebuild(config, ckpt, corpus)
    predictor, _ = build_predictor_from_config(
        config, ckpt, _rebuilt=rebuilt, batch_buckets=(4,),
        length_multiple=8)
    with pytest.raises(ValueError, match="task-metric gate"):
        _task_metric_gate(predictor, out16, rebuilt[5], config, 0.01)


def _export_bf16(tmp_path, config, root, seed=3):
    """Shared scaffolding for the metric-gate label-contract tests: init ->
    checkpoint -> bf16 artifact, returning (out_dir, predictor, rebuilt)."""
    from online_neural_cdes_tpu.deploy import _rebuild

    bundle, _ = load_and_setup(config, root)
    params = bundle.init(jax.random.PRNGKey(seed))
    ckpt = save_checkpoint(str(tmp_path / "ckpt"), params, use_orbax=False)
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps(config))
    out16 = str(tmp_path / "a16")
    main(["--config", str(cfg_path), "--checkpoint", ckpt, "--out", out16,
          "--data-root", root, "--batch-buckets", "4",
          "--length-multiple", "8", "--platforms", "cpu",
          "--params-dtype", "bfloat16"])
    rebuilt = _rebuild(config, ckpt, root)
    predictor, _ = build_predictor_from_config(
        config, ckpt, _rebuilt=rebuilt, batch_buckets=(4,),
        length_multiple=8)
    return out16, predictor, rebuilt


def test_metric_gate_regression_n1_labels(tmp_path):
    """The gate scores the MIMIC LOS/Mortality label contract — continuous
    (N, 1) stored labels — through the inferred rmse without a shape crash
    (the trailing singleton must align with the squeezed predictions)."""
    from online_neural_cdes_tpu.data.common import (
        add_time, process_all_interpolations, save_processed,
    )
    from online_neural_cdes_tpu.deploy import _task_metric_gate

    rng = np.random.default_rng(5)
    values = (np.cumsum(rng.normal(size=(30, 24, 2)), axis=1) * 0.3)
    temporal = add_time(values).astype(np.float32)
    labels = (values[:, -1, 0] + 0.1 * rng.normal(size=30)).reshape(-1, 1)
    root = str(tmp_path / "root")
    processed = process_all_interpolations(None, temporal, None)
    save_processed(processed, labels.astype(np.float32),
                   os.path.join(root, "Toy/REG"))

    config = _config("linear")
    config["dataset"]["data_loc"] = "Toy/REG"
    out16, predictor, rebuilt = _export_bf16(tmp_path, config, root)

    gate = _task_metric_gate(predictor, out16, rebuilt[5], config, tol=10.0)
    assert set(gate["metrics"]) == {"rmse"}, gate
    assert np.isfinite(gate["metrics"]["rmse"]["live_f32"])


def test_metric_gate_ragged_object_labels(tmp_path):
    """Online tasks whose stored labels are an object array of ragged
    (L_i, 1) rows (the MIMIC Ventilation/Sepsis save contract,
    data/common.py object branch) gate without a crash: the ragged rows
    densify onto a NaN-padded grid and label rows shorter than the request
    outputs NaN-pad up to the output time axis."""
    from online_neural_cdes_tpu.data.common import (
        add_time, process_all_interpolations, save_processed,
    )
    from online_neural_cdes_tpu.deploy import _task_metric_gate

    rng = np.random.default_rng(7)
    values = (np.cumsum(rng.normal(size=(30, 24, 2)), axis=1) * 0.3)
    temporal = add_time(values).astype(np.float32)
    # Ragged per-row label lengths, all strictly shorter than the series.
    labels = [
        rng.integers(0, 2, size=(int(L), 1)).astype(np.float32)
        for L in rng.integers(15, 23, size=30)
    ]
    root = str(tmp_path / "root")
    processed = process_all_interpolations(None, temporal, None)
    save_processed(processed, labels, os.path.join(root, "Toy/RAG"))

    config = _config("linear")
    config["dataset"]["data_loc"] = "Toy/RAG"
    config["dataset"]["problem"] = "online"
    out16, predictor, rebuilt = _export_bf16(tmp_path, config, root)

    gate = _task_metric_gate(predictor, out16, rebuilt[5], config, tol=0.5)
    assert set(gate["metrics"]) == {"auc", "acc"}, gate
    for vals in gate["metrics"].values():
        assert np.isfinite(vals["artifact"]), gate


def test_metric_gate_refuses_unknown_metric(tmp_path, corpus):
    """A configured metric name the gate cannot score must refuse loudly
    rather than skip (a skipped metric would pass the gate vacuously)."""
    from online_neural_cdes_tpu.deploy import _task_metric_gate

    config = _config("linear")
    config["trainer"] = {"metrics": ["loss", "not-a-metric"]}
    out16, predictor, rebuilt = _export_bf16(tmp_path, config, corpus)
    with pytest.raises(ValueError, match="unknown metric"):
        _task_metric_gate(predictor, out16, rebuilt[5], config, tol=0.5)


def test_gate_metrics_follow_training_contract():
    """The gate's metric choice follows the config (the TRAINING contract)
    before the label space: an explicit loss_str decides even when the
    label values would suggest otherwise — integer-valued regression
    targets (counts/scores) under loss_str: rmse must gate on rmse, not on
    thresholded-sigmoid 'accuracy' (which would be ~0 delta for any
    artifact and make the gate vacuous)."""
    from online_neural_cdes_tpu.deploy import _gate_metrics

    int_regression = np.asarray([3.0, 7.0, 2.0, 9.0])  # integers, not classes
    assert _gate_metrics({"trainer": {"loss_str": "rmse"}},
                         int_regression) == ["rmse"]
    assert _gate_metrics({"trainer": {"loss_str": "mse"}},
                         int_regression) == ["rmse"]
    assert _gate_metrics({"trainer": {"loss_str": "ce"}},
                         np.asarray([0.0, 3.0, 2.0])) == ["acc"]
    assert _gate_metrics({"trainer": {"loss_str": "bce"}},
                         np.asarray([0.0, 1.0])) == ["auc", "acc"]
    # Explicit trainer.metrics wins over everything.
    assert _gate_metrics(
        {"trainer": {"metrics": ["loss", "auprc"], "loss_str": "rmse"}},
        int_regression) == ["auprc"]
    # No trainer section at all: label-space inference (the legacy path).
    assert _gate_metrics({}, np.asarray([0.0, 1.0])) == ["auc", "acc"]
    assert _gate_metrics({}, np.asarray([0.25, 1.75])) == ["rmse"]


def test_metric_gate_recurrent_model_with_static_corpus(tmp_path):
    """A recurrent baseline served from a corpus that STORES static
    features: the model does not consume static (accept_static=False,
    serving.py), so the gate must not feed the val split's static block to
    predict — doing so raised and aborted the verify of a healthy
    artifact."""
    from online_neural_cdes_tpu.data.common import (
        add_time, process_all_interpolations, save_processed,
    )
    from online_neural_cdes_tpu.deploy import _task_metric_gate

    rng = np.random.default_rng(23)
    n, length = 30, 16
    values = np.cumsum(rng.normal(size=(n, length, 2)), axis=1) * 0.2
    temporal = add_time(values).astype(np.float32)
    static = rng.normal(size=(n, 3)).astype(np.float32)
    labels = (values[:, :, 0] > 0).astype(np.float32)[..., None]  # online
    root = str(tmp_path / "root")
    processed = process_all_interpolations(static, temporal, None)
    save_processed(processed, labels, os.path.join(root, "Toy/RS"))

    config = _config(None, model_string="gru")
    config["dataset"]["data_loc"] = "Toy/RS"
    config["dataset"]["problem"] = "online"
    config["dataset"]["use_static"] = True
    out16, predictor, rebuilt = _export_bf16(tmp_path, config, root)
    assert not predictor.accept_static
    gate = _task_metric_gate(predictor, out16, rebuilt[5], config, tol=0.5)
    assert set(gate["metrics"]) == {"auc", "acc"}, gate


def test_metric_gate_single_class_val_split(tmp_path):
    """A val split sklearn's AUC cannot score (single class) must not
    abort the export with a raw traceback: the undefined metric is
    recorded skipped (undefined for live AND artifact alike) and the gate
    scores the remaining metrics — unless NOTHING is scoreable, which
    refuses loudly (a vacuous gate)."""
    from online_neural_cdes_tpu.data.common import (
        add_time, process_all_interpolations, save_processed,
    )
    from online_neural_cdes_tpu.deploy import _task_metric_gate

    rng = np.random.default_rng(29)
    values = np.cumsum(rng.normal(size=(30, 16, 2)), axis=1) * 0.2
    temporal = add_time(values).astype(np.float32)
    labels = np.ones(30, np.float32)  # one class everywhere
    root = str(tmp_path / "root")
    processed = process_all_interpolations(None, temporal, labels)
    save_processed(processed, labels, os.path.join(root, "Toy/ONE"))

    config = _config("linear")
    config["dataset"]["data_loc"] = "Toy/ONE"
    config["trainer"] = {"metrics": ["loss", "auc", "acc"]}
    out16, predictor, rebuilt = _export_bf16(tmp_path, config, root)
    gate = _task_metric_gate(predictor, out16, rebuilt[5], config, tol=0.5)
    assert gate["metrics"]["auc"] == {"skipped": "undefined on val split"}
    assert np.isfinite(gate["metrics"]["acc"]["abs_delta"])

    # All metrics undefined -> the gate refuses rather than passing empty.
    config_auc_only = dict(config, trainer={"metrics": ["auc"]})
    with pytest.raises(ValueError, match="vacuous"):
        _task_metric_gate(predictor, out16, rebuilt[5], config_auc_only,
                          tol=0.5)
