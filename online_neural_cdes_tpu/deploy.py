"""Checkpoint -> serving-artifact exporter (CLI + library).

Bridges the training harness to deployment: given an experiment config
(the same dict :func:`training.experiment.run_experiment` trains from) and
a ``best_params`` checkpoint written by ``train(checkpoint_dir=...)``,
rebuild the model bundle through the exact code path that trained it,
attach the serving-side coefficient build for the config's interpolation
key, and write a self-contained AOT artifact (``serving_export.py``) a
server loads without the framework's model code.

    python -m online_neural_cdes_tpu.deploy \\
        --config runs/mimic.json5 --checkpoint runs/ckpt/best_params \\
        --out artifacts/mimic --max-length 200 --batch-buckets 1,8,64

The reference has no serving or deployment path (training-harness
evaluation only); this closes the train->deploy loop for the TPU build.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "serving_coeff_fn",
    "build_predictor_from_config",
    "build_stepper_from_config",
    "main",
]


def serving_coeff_fn(interpolation: Optional[str]):
    """The jit-traceable raw-series -> model-inputs transform for a
    dataset interpolation key: what ``data/common.py::interpolate`` does to
    the stored corpus (first-row NaN zeroing + the key's coefficient
    builder, common.py:95-123), staged so the serving artifact computes it
    on device per request.  Requests must be in the corpus's input space —
    normalised values with the prepended time channel
    (``temporal_data_raw``'s space).

    Keys whose coefficient build cannot reproduce the training-time
    forward under the predictor's length padding are rejected loudly with
    a recipe (see the error messages) rather than served silently skewed.
    """
    from online_neural_cdes_tpu.data.common import _coeff_fn
    from online_neural_cdes_tpu.data.loader import (
        parse_interpolation_string, parse_logsig_string,
    )

    data_key, model_interp = parse_interpolation_string(interpolation)

    if model_interp is not None and model_interp.startswith("logsig"):
        from online_neural_cdes_tpu.ops.interpolation import (
            linear_interpolation_coeffs,
        )
        from online_neural_cdes_tpu.ops.logsig import logsig_windows

        depth, window = parse_logsig_string(model_interp)

        def logsig_fn(x):
            # The transform forward-fills NaNs itself; pad rows become
            # zero increments (Chen identity), so bucket padding cannot
            # change a request's windows (tested in test_serving.py).
            return linear_interpolation_coeffs(
                logsig_windows(x, depth, window)
            )

        return logsig_fn

    if model_interp == "rectilinear-intensity":
        raise ValueError(
            "rectilinear-intensity serving needs the cumulative-measurement "
            "channels appended host-side (data/loader.py::"
            "add_rectilinear_intensity); precompute them in the client and "
            "export with interpolation='rectilinear' over the augmented "
            "channels instead."
        )

    if data_key in ("cubic", "hermite"):
        # A forward-filled length pad is NOT inert for these builds: the
        # natural cubic's tridiagonal solve is global (pad knots change
        # the real region's coefficients), and the hermite pad pieces
        # inherit the last real backward-difference derivative, so the
        # state keeps moving across the pad — one-shot outputs would be
        # silently skewed vs the training-time forward.  Linear/
        # rectilinear pads have dX = 0 and are exact (tested).
        raise ValueError(
            f"{data_key} serving under length padding deviates from the "
            "training-time coefficient build (global/derivative-carrying "
            "spline). Either serve full-length requests only by passing "
            "an explicit coeff_fn= (the builder from data.common._coeff_fn"
            f"({data_key!r})) and exporting with --length-multiple equal "
            "to the corpus length, or train with a pad-inert key "
            "(linear / rectilinear / logsig-*)."
        )

    if data_key == "raw":
        raise ValueError(
            "the config has no dataset interpolation key (raw-space "
            "data); NCDE serving needs one of linear / rectilinear / "
            "linear_forward_fill / logsig-* — or pass an explicit "
            "coeff_fn= for a custom request transform."
        )

    builder = _coeff_fn(data_key)

    def coeff_fn(x):
        # interpolate()'s causal initial-NaN->0 fill, traced.
        first = jnp.where(jnp.isnan(x[:, :1]), 0.0, x[:, :1])
        return builder(jnp.concatenate([first, x[:, 1:]], axis=1))

    return coeff_fn


def _rebuild(config: dict, checkpoint: str, data_root: Optional[str]):
    """config + checkpoint -> (bundle, splits, params) plus the raw-request
    corpus metadata, through the experiment module's own setup path.  The
    final slot is a ZERO-ARG CALLABLE producing (val_rows, val_static,
    val_labels) for the reduced-precision task-metric gate."""
    from online_neural_cdes_tpu.training.experiment import (
        DEFAULT_DATA_ROOT, load_and_setup, npz_path_for,
    )
    from online_neural_cdes_tpu.utils.checkpoint import load_checkpoint

    data_root = data_root or DEFAULT_DATA_ROOT
    bundle, splits = load_and_setup(config, data_root)
    like = bundle.init(jax.random.PRNGKey(0))
    params = load_checkpoint(checkpoint, like)

    ds = dict(config.get("dataset", {}))
    npz = np.load(
        npz_path_for(ds["data_loc"], data_root,
                     bool(config.get("test_mode", False))),
        allow_pickle=True,
    )
    raw = npz["temporal_data_raw"]
    channels = int(np.asarray(raw[0]).shape[-1])
    max_length = int(max(len(np.asarray(r)) for r in raw))

    def val_eval():
        # VAL-split raw rows + labels, for the reduced-precision task-metric
        # gate: the artifact is scored on the config's own validation data.
        # Lazy: only --verify exports of reduced-precision artifacts pay the
        # float32 copy of the split; predictor/stepper builds never do.
        val_idxs = np.asarray(npz["val_idxs"])
        val_rows = [np.asarray(raw[i], np.float32) for i in val_idxs]
        val_static = (
            npz["static_data"].astype(np.float32)[val_idxs]
            if "static_data" in npz.files and ds.get("use_static", True)
            else None
        )
        val_labels = np.asarray(npz["labels"])[val_idxs]
        return val_rows, val_static, val_labels

    return bundle, splits, params, channels, max_length, val_eval


def build_predictor_from_config(
    config: dict,
    checkpoint: str,
    data_root: Optional[str] = None,
    _rebuilt=None,
    **serving_kw,
):
    """Rebuild the trained model from ``config`` + ``checkpoint`` and wrap
    it as a raw-request :class:`~online_neural_cdes_tpu.serving.Predictor`.

    Returns ``(predictor, info)`` where ``info`` carries the artifact
    export defaults derived from the corpus: raw ``channels``,
    ``max_length`` (longest training series), and ``static_dim``."""
    from online_neural_cdes_tpu.serving import predictor_from_bundle

    bundle, splits, params, channels, max_length, _ = (
        _rebuilt or _rebuild(config, checkpoint, data_root)
    )

    ds = dict(config.get("dataset", {}))
    is_ncde = bundle.model_string in ("ncde", "ncde-stacked", "ncde-attention")
    if is_ncde:
        # NCDE bundles train on precomputed coefficients (prepare_batch is
        # the identity); serving takes raw rows, so the coefficient build
        # moves into the predictor/artifact.
        if "coeff_fn" not in serving_kw:
            serving_kw["coeff_fn"] = serving_coeff_fn(ds.get("interpolation"))
        model = bundle.model
        serving_kw.setdefault(
            "rectilinear_rows",
            bool(getattr(model, "return_sequences", False))
            and getattr(model, "interpolation", None) == "rectilinear"
            and not getattr(model, "return_filtered_rectilinear", True),
        )
    elif "coeff_fn" not in serving_kw and ds.get("interpolation") is not None:
        # Recurrent bundles trained on interpolated rows would serve raw
        # rows through prepare_batch — a different featurisation (masks/
        # deltas) than the checkpoint learned.  The framework's own
        # baseline configs use interpolation: null (configurations.json5),
        # where raw training rows == raw requests.
        raise ValueError(
            f"{bundle.model_string!r} was trained on interpolation="
            f"{ds.get('interpolation')!r} rows, but serving feeds raw "
            "request rows to its preparation — the masks/deltas would "
            "differ from training. Use an interpolation: null config (the "
            "baselines' own contract) or pass an explicit coeff_fn=."
        )
    predictor = predictor_from_bundle(bundle, params, **serving_kw)

    train_data = splits[0]
    static_dim = (
        train_data.static_dim if predictor.accept_static else None
    )
    info = {
        "channels": channels,
        "max_length": max_length,
        "static_dim": static_dim,
        "model_string": bundle.model_string,
    }
    return predictor, info


def build_stepper_from_config(
    config: dict,
    checkpoint: str,
    data_root: Optional[str] = None,
    _rebuilt=None,
):
    """Rebuild the trained model as a streaming
    :class:`~online_neural_cdes_tpu.serving.OnlineNCDEStepper` (plain NCDE,
    rectilinear interpolation, fixed-grid solver — the stepper's own
    guards reject anything else loudly).  Returns ``(stepper, info)``."""
    from online_neural_cdes_tpu.serving import OnlineNCDEStepper

    bundle, splits, params, channels, _, _ = (
        _rebuilt or _rebuild(config, checkpoint, data_root)
    )
    if bundle.model_string != "ncde":
        raise ValueError(
            "streaming export supports the plain NCDE only (got "
            f"{bundle.model_string!r}); stacked/attention/recurrent models "
            "have no incremental-exact step."
        )
    static_dim = splits[0].static_dim
    # A placeholder static binds the stepper's static head for export;
    # the serving process passes real per-stream statics to load_stepper.
    static = (
        None if static_dim is None
        else jnp.zeros((1, static_dim), jnp.float32)
    )
    stepper = OnlineNCDEStepper(bundle.model, params, static=static)
    return stepper, {"channels": channels, "static_dim": static_dim}



def _verify_against_live(predictor, out_dir, channels, max_len, static_dim,
                         reduced_dtype):
    """Load-and-compare gate: synthetic rows (time channel first, the
    corpus input space) through the reloaded StableHLO vs the live
    predictor.  Reduced-precision artifacts compare within tolerance, f32
    bit-exactly.  Returns the 'verified' summary string."""
    from online_neural_cdes_tpu.serving_export import load_predictor

    rng = np.random.default_rng(0)
    lengths = sorted({min(4, max_len), max(1, max_len // 2), max_len})
    rows = []
    for L in lengths:
        r = rng.normal(size=(L, channels)).astype(np.float32)
        r[:, 0] = np.arange(L)
        rows.append(r)
    static = (
        rng.normal(size=(len(rows), static_dim)).astype(np.float32)
        if static_dim else None
    )
    live_outs = predictor.predict(rows, static=static)
    art_outs = load_predictor(out_dir).predict(rows, static=static)
    for a, b in zip(art_outs, live_outs):
        if reduced_dtype is None:
            np.testing.assert_array_equal(a, b)
        else:
            np.testing.assert_allclose(a, b, rtol=0.05, atol=0.05)
    return ("bit-exact" if reduced_dtype is None
            else f"within {reduced_dtype} tolerance")


def _stack_row_outputs(outs, target_len=None):
    """Per-request output list -> one (N, ...) array; sequence outputs
    NaN-pad to ``target_len`` (the stored label length, so the flattened
    pred/label positions align — the metrics are NaN-masked, and a
    request's pad region has no finite stored label either)."""
    outs = [np.asarray(o) for o in outs]
    if target_len is None and all(o.shape == outs[0].shape for o in outs):
        return np.stack(outs)
    max_len = max([o.shape[0] for o in outs] + [target_len or 0])
    padded = np.full((len(outs), max_len) + outs[0].shape[1:], np.nan,
                     np.float64)
    for i, o in enumerate(outs):
        padded[i, : o.shape[0]] = o
    return padded


def _dense_labels(labels) -> np.ndarray:
    """Stored labels -> one NaN-padded float64 array.  Online tasks with
    per-row label lengths (the MIMIC Ventilation/Sepsis contract,
    data/common.py's object-dtype save branch) arrive as an object array of
    ragged (L_i, ...) rows; densify them the same way the gate stacks the
    per-request outputs so positions align under the NaN mask."""
    labels = np.asarray(labels)
    if labels.dtype == object:
        return _stack_row_outputs(
            [np.asarray(r, np.float64) for r in labels]
        )
    return np.asarray(labels, np.float64)


def _gate_metrics(config, labels):
    """Which task metrics score a reduced-precision artifact, in priority
    order: the config's own trainer metrics; else the metrics implied by
    the config's EXPLICIT loss (the training contract — this is what keeps
    integer-valued regression targets from being misread as classification:
    every TSER-style config carries ``loss_str: rmse`` via dataset.json5);
    else inferred from the label space (configs with no trainer section at
    all)."""
    trainer_cfg = config.get("trainer", {}) or {}
    names = [m for m in trainer_cfg.get("metrics", []) if m != "loss"]
    if names:
        return names
    loss = trainer_cfg.get("loss_str")
    if loss in ("mse", "rmse"):
        return ["rmse"]
    if loss == "ce":
        return ["acc"]
    if loss == "bce":
        return ["auc", "acc"]
    dense = _dense_labels(labels)
    finite = dense[np.isfinite(dense)]
    if finite.size and np.allclose(finite, np.round(finite)):
        classes = np.unique(finite)
        return ["auc", "acc"] if len(classes) <= 2 else ["acc"]
    return ["rmse"]


def _task_metric_gate(predictor, out_dir, val_eval, config, tol):
    """Task-metric quality gate for reduced-precision artifacts (a raw
    'max rel dev' on outputs is not a quality statement — 2.7% on a logit
    near a decision boundary is not obviously benign): score the reloaded
    artifact AND the live f32 predictor on the config's VAL split with the
    config's own metrics, and fail the export when any metric departs the
    live value by more than ``tol``.  Returns the per-metric summary."""
    from online_neural_cdes_tpu.serving_export import load_predictor
    from online_neural_cdes_tpu.training.metrics import METRICS

    rows, static, raw_labels = val_eval() if callable(val_eval) else val_eval
    if static is not None and not getattr(predictor, "accept_static", True):
        # The corpus stores static features but this model does not consume
        # them (recurrent baselines, serving.py accept_static=False); feeding
        # them would raise inside predict and abort a healthy verify.
        static = None
    labels = _dense_labels(raw_labels)
    # Sequence labels (online tasks) carry a time axis the per-request
    # outputs must pad to; one-shot labels ((N,) or the MIMIC (N, 1)
    # contract) do not.
    is_sequence = labels.ndim >= 2 and labels.shape[1] > 1
    target_len = labels.shape[1] if is_sequence else None
    live = _stack_row_outputs(predictor.predict(rows, static=static),
                              target_len)
    art = _stack_row_outputs(load_predictor(out_dir).predict(
        rows, static=static), target_len)
    if is_sequence and live.ndim >= 2 and live.shape[1] > labels.shape[1]:
        # Requests longer than their stored (ragged) label rows: NaN-pad the
        # label time axis to the output grid — pad positions carry no finite
        # label and the metrics are NaN-masked.
        pad_shape = (labels.shape[0], live.shape[1] - labels.shape[1])
        labels = np.concatenate(
            [labels, np.full(pad_shape + labels.shape[2:], np.nan)], axis=1
        )

    def _rmse_like(sqrt):
        def fn(preds, labs):
            preds = np.asarray(preds, np.float64)
            labs = np.asarray(labs, np.float64)
            # Align trailing singleton axes on either side ((N,1) stored
            # labels vs (N,) preds and vice versa), then NaN-mask.
            while preds.ndim > labs.ndim and preds.shape[-1] == 1:
                preds = preds[..., 0]
            while labs.ndim > preds.ndim and labs.shape[-1] == 1:
                labs = labs[..., 0]
            preds, labs = preds.reshape(-1), labs.reshape(-1)
            if preds.shape != labs.shape:
                raise ValueError(
                    f"gate metric: {preds.shape} predictions vs "
                    f"{labs.shape} labels after squeezing"
                )
            mask = np.isfinite(labs)
            m = np.mean((preds[mask] - labs[mask]) ** 2)
            return float(np.sqrt(m) if sqrt else m)
        return fn

    extra = {"rmse": _rmse_like(sqrt=True), "mse": _rmse_like(sqrt=False)}
    summary = {"tol": tol, "metrics": {}}
    failures = []
    names = _gate_metrics(config, labels)
    unknown = [n for n in names if n not in METRICS and n not in extra]
    if unknown:
        # A skipped metric would pass the gate vacuously — refuse instead.
        raise ValueError(
            f"task-metric gate: unknown metric(s) {unknown} in the config's "
            f"trainer.metrics; known: {sorted(METRICS) + sorted(extra)}"
        )
    def _guarded(fn, preds):
        # Mirror harness._evaluate: sklearn raises ValueError when a metric
        # is undefined on the split (e.g. single-class val AUC) — map that
        # to nan instead of aborting the export with a raw traceback.
        try:
            return float(fn(preds, labels))
        except ValueError:
            return float("nan")

    scored = 0
    for name in names:
        fn = METRICS.get(name) or extra[name]
        m_live = _guarded(fn, live)
        m_art = _guarded(fn, art)
        if not np.isfinite(m_live) and not np.isfinite(m_art):
            # Undefined on this val split for live AND artifact alike
            # (same data, same reason): nothing to gate on — record it and
            # score the remaining metrics rather than failing a healthy
            # export or passing a broken one vacuously.
            summary["metrics"][name] = {"skipped": "undefined on val split"}
            continue
        scored += 1
        delta = abs(m_art - m_live)
        summary["metrics"][name] = {
            "live_f32": round(m_live, 6),
            "artifact": round(m_art, 6),
            "abs_delta": round(delta, 6),
        }
        if not np.isfinite(delta) or delta > tol:
            failures.append(f"{name}: |{m_art:.6f} - {m_live:.6f}| "
                            f"= {delta:.6f} > tol {tol}")
    if scored == 0:
        raise ValueError(
            "task-metric gate: every gate metric "
            f"({', '.join(names)}) is undefined on the config's val split "
            "— the gate would be vacuous; export f32 or provide a val "
            "split the config's metrics can score"
        )
    if failures:
        raise ValueError(
            "reduced-precision artifact fails the task-metric gate on the "
            f"config's val split: {'; '.join(failures)} — raise "
            "--metric-tol only with cause, or export f32"
        )
    return summary


def main(argv=None) -> str:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", required=True,
                    help="experiment config: a json/json5 file holding the "
                         "run_experiment dict")
    ap.add_argument("--checkpoint", required=True,
                    help="best_params checkpoint from train(checkpoint_dir=)")
    ap.add_argument("--out", required=True, help="artifact directory")
    ap.add_argument("--data-root", default=None)
    ap.add_argument("--batch-buckets", default="1,8,64",
                    help="comma-separated request-batch buckets")
    ap.add_argument("--length-multiple", type=int, default=16)
    ap.add_argument("--max-length", type=int, default=None,
                    help="longest request to cover (default: corpus max)")
    ap.add_argument("--platforms", default="tpu,cpu")
    ap.add_argument("--stepper", action="store_true",
                    help="also export a streaming-stepper artifact to "
                         "<out>/stepper (plain rectilinear NCDE configs)")
    ap.add_argument("--stream-batch-sizes", default="64",
                    help="comma-separated stream-batch sizes for --stepper")
    ap.add_argument("--stream-block-sizes", default="",
                    help="comma-separated catch-up block lengths K for "
                         "--stepper: each exports a step_block module "
                         "advancing K observations in one dispatch "
                         "(load_stepper().step_many chunks a backlog "
                         "into them)")
    ap.add_argument("--params-dtype", default=None,
                    help="store parameters in this floating dtype (e.g. "
                         "bfloat16 — halves the weight payload and serve-"
                         "time weight HBM traffic; outputs match f32 to "
                         "reduced-precision tolerance)")
    ap.add_argument("--verify", action="store_true",
                    help="after exporting, reload the artifact in-process "
                         "and assert it serves synthetic rows identically "
                         "to the live predictor (adds 'verified' to the "
                         "summary); reduced-precision exports additionally "
                         "pass the task-metric gate on the config's val "
                         "split (see --metric-tol)")
    ap.add_argument("--metric-tol", type=float, default=0.01,
                    help="task-metric gate for reduced-precision artifacts "
                         "under --verify: max allowed |metric(artifact) - "
                         "metric(live f32)| on the config's val split for "
                         "each of the config's metrics (default 0.01)")
    ap.add_argument("--update-params-only", action="store_true",
                    help="roll the checkpoint into the EXISTING artifact "
                         "at --out (atomic params.npz rewrite; architecture "
                         "validated against the manifest) instead of "
                         "re-exporting")
    args = ap.parse_args(argv)

    from online_neural_cdes_tpu.serving_export import (
        export_predictor, export_stepper, update_params,
    )
    from online_neural_cdes_tpu.training.config import load_json

    config = load_json(args.config)
    rebuilt = _rebuild(config, args.checkpoint, args.data_root)

    if args.update_params_only:
        _, _, params, _, _, _ = rebuilt
        n = update_params(args.out, params)
        stepper_dir = os.path.join(args.out, "stepper")
        summary = {"artifact": args.out, "leaves_updated": n}
        if os.path.isdir(stepper_dir):
            summary["stepper_leaves_updated"] = update_params(
                stepper_dir, params
            )
        if args.verify:
            # Gate the rolled checkpoint too: rebuild a live predictor on
            # the artifact's own bucket grid and compare.
            manifest = json.load(
                open(os.path.join(args.out, "manifest.json")))
            predictor, info = build_predictor_from_config(
                config,
                args.checkpoint,
                _rebuilt=rebuilt,
                batch_buckets=tuple(manifest["batch_buckets"]),
                length_multiple=manifest["length_multiple"],
            )
            reduced = next(
                (d for d in manifest["leaf_dtypes"] if d != "float32"),
                None,
            )
            summary["verified"] = _verify_against_live(
                predictor, args.out, manifest["channels"],
                manifest["max_length"], manifest["static_dim"], reduced,
            )
            if reduced is not None:
                summary["metric_gate"] = _task_metric_gate(
                    predictor, args.out, rebuilt[5], config,
                    args.metric_tol,
                )
        print(json.dumps(summary))
        return args.out
    predictor, info = build_predictor_from_config(
        config,
        args.checkpoint,
        _rebuilt=rebuilt,
        batch_buckets=tuple(int(b) for b in args.batch_buckets.split(",")),
        length_multiple=args.length_multiple,
    )
    n = export_predictor(
        predictor,
        args.out,
        channels=info["channels"],
        max_length=args.max_length or info["max_length"],
        static_dim=info["static_dim"],
        platforms=tuple(args.platforms.split(",")),
        params_dtype=args.params_dtype,
    )
    summary = {
        "artifact": args.out,
        "model": info["model_string"],
        "shapes_exported": n,
        "channels": info["channels"],
        "max_length": args.max_length or info["max_length"],
    }
    if args.verify:
        summary["verified"] = _verify_against_live(
            predictor, args.out, info["channels"],
            args.max_length or info["max_length"], info["static_dim"],
            args.params_dtype,
        )
        if args.params_dtype is not None:
            summary["metric_gate"] = _task_metric_gate(
                predictor, args.out, rebuilt[5], config, args.metric_tol,
            )
    if args.stepper:
        stepper, sinfo = build_stepper_from_config(
            config, args.checkpoint, _rebuilt=rebuilt
        )
        stepper_out = os.path.join(args.out, "stepper")
        summary["stepper_modules"] = export_stepper(
            stepper,
            stepper_out,
            batch_sizes=tuple(
                int(b) for b in args.stream_batch_sizes.split(",")
            ),
            channels=sinfo["channels"],
            platforms=tuple(args.platforms.split(",")),
            params_dtype=args.params_dtype,
            block_sizes=tuple(
                int(k) for k in args.stream_block_sizes.split(",") if k
            ),
        )
        summary["stepper_artifact"] = stepper_out
    print(json.dumps(summary))
    return args.out


if __name__ == "__main__":
    main()
