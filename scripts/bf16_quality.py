"""bf16 quality measurement (VERDICT r4 #4): what reduced precision does
to TASK metrics, not just raw outputs.

Two bf16 surfaces, each compared against its f32 twin on the toy
Brownian-motion online task (trained to convergence, same seed/init):

1. ``trainer.compute_dtype='bfloat16'`` — mixed-precision training
   (master weights f32, fwd+bwd storage bf16): final val/test AUC + acc
   deltas vs the f32-trained run.
2. ``params_dtype='bfloat16'`` serving artifacts — the deploy metric
   gate's own numbers: val-split AUC/acc of the bf16 artifact vs the
   live f32 predictor holding the SAME trained weights.

Usage:
    python scripts/bf16_quality.py [--backend cpu|tpu] \
        [--out results/bf16_quality_<backend>.json]

CPU runs give the numerics verdict (XLA bf16 rounding semantics match);
a TPU run additionally exercises the Pallas fused-kernel path and is the
production statement — run both when the tunnel is healthy.
"""

import argparse
import json
import os
import sys
import tempfile

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if args.backend == "cpu":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/bf16q_jax_cache")
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

    import numpy as np

    from online_neural_cdes_tpu.data.builders import build_toy_bm
    from online_neural_cdes_tpu.training.experiment import run_experiment

    root = tempfile.mkdtemp(prefix="bf16q_")
    build_toy_bm(root, num_paths=1024, n_points=10, seed=0)

    def config(compute_dtype):
        return {
            "dataset_name": "ToyBM", "seed": 0,
            "dataset": {"data_loc": "Toy/BM", "problem": "online",
                        "use_static": True, "interpolation": "linear",
                        "batch_size": 256},
            "model": {"model_string": "ncde", "hidden_dim": 24,
                      "hidden_hidden_dim": 24, "num_layers": 2,
                      "adjoint": False, "solver": "rk4"},
            "trainer": {"loss_str": "bce", "metrics": ["loss", "auc", "acc"],
                        "val_metric_to_monitor": "auc",
                        "max_epochs": args.epochs, "lr": 5e-3,
                        "compute_dtype": compute_dtype},
        }

    record = {"backend": args.backend, "epochs": args.epochs}

    # --- 1. mixed-precision TRAINING -----------------------------------
    runs = {}
    f32_res = None
    for key, dtype in (("f32", None), ("bf16_compute", "bfloat16")):
        res = run_experiment(config(dtype), data_root=root)
        if key == "f32":
            f32_res = res  # reused below: the artifact leg serves these weights
        runs[key] = {m: round(float(res[m]), 4)
                     for m in ("val.auc", "val.acc", "test.auc", "test.acc")}
        print(key, runs[key], flush=True)
    record["training"] = {
        **runs,
        "deltas": {
            m: round(runs["bf16_compute"][m] - runs["f32"][m], 4)
            for m in runs["f32"]
        },
    }

    # --- 2. bf16 serving ARTIFACT (the deploy metric gate's numbers) ---
    from online_neural_cdes_tpu.deploy import (
        _rebuild, _task_metric_gate, build_predictor_from_config,
    )
    from online_neural_cdes_tpu.serving_export import export_predictor
    from online_neural_cdes_tpu.utils.checkpoint import save_checkpoint

    cfg = config(None)
    ckpt_dir = tempfile.mkdtemp(prefix="bf16q_ckpt_")
    # run_experiment returns harness.train's results dict verbatim — the
    # f32 run's best_params are already in hand, no third training run.
    params = f32_res["best_params"]
    ckpt = save_checkpoint(os.path.join(ckpt_dir, "best_params"), params,
                           use_orbax=False)

    rebuilt = _rebuild(cfg, ckpt, root)
    predictor, info = build_predictor_from_config(
        cfg, ckpt, _rebuilt=rebuilt, batch_buckets=(64,),
        length_multiple=16)
    art16 = tempfile.mkdtemp(prefix="bf16q_art_")
    export_predictor(predictor, art16, channels=info["channels"],
                     max_length=info["max_length"],
                     static_dim=info["static_dim"],
                     platforms=(jax.default_backend(),),
                     params_dtype="bfloat16")
    gate = _task_metric_gate(predictor, art16, rebuilt[5], cfg, tol=0.05)
    record["artifact_bf16"] = gate
    print("artifact gate:", json.dumps(gate), flush=True)

    out = args.out or f"results/bf16_quality_{args.backend}.json"
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as fh:
        json.dump(record, fh, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
