"""Vmapped multi-trial training: evaluate a WAVE of hyperopt candidates
that share one model shape as a single SPMD program.

The reference evaluates Ax trials strictly sequentially (one full training
per candidate, experiments/hyperoptimize.py:86-94).  On TPU, candidates
whose hyperparameters do not change parameter SHAPES or the traced program
(e.g. the ``trainer__lr`` dimension of the gru-family/odernn search
spaces, configurations.json5) can instead train side by side: the trial
axis is ``vmap``-ed over the jitted train step — K models advance per
dispatch, one compiled program, K× fewer host round-trips.  Per-trial
learning rates and readout boosts ride the step's runtime ``lr_scale`` /
``final_mult`` arguments (training/loop.py), and the scheduler knobs
(plateau patience/factor, early-stop patience, max_epochs —
:data:`WAVEABLE_TRAINER_KEYS`) are per-trial rows of the host bookkeeping
arrays, so the plateau scheduler, early stopping and best-checkpoint
bookkeeping run vectorised on host exactly as the sequential harness does
(training/harness.py:train) — each trial's parameter trajectory is the
same function of the data as its sequential run, so the search outcome is
preserved (tested to tolerance).

Beyond hyperopt trials, the sweep runner co-schedules SAME-SHAPE CONFIGS
through this path (:func:`config_wave_groups`): the canonical case is the
reference's 3-seeds-per-final-config protocol (configurations.json5 seeds,
reference runs.py one process per GPU) — seeds change only the param init,
not the traced program, so K seed replicas train as one vmapped program
with per-trial inits.  Measured scope of the win (RESULTS.md r5
concurrency_grid): the dispatch/host-round-trip amortisation is real
(≥2× on small/medium programs), but at the flagship shape aggregate MXU
throughput is FLAT in K — per-replica weights make the vmapped stage K
independent small matmuls, so each replica's latency floor multiplies
instead of filling the idle pipeline; sweep.run caps groups at
``max_wave_size=4`` accordingly.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["run_trials_vmapped", "vmappable_groups", "config_wave_groups",
           "WAVEABLE_TRAINER_KEYS"]

# Trainer scalars the vmapped wave can vary PER TRIAL without changing the
# compiled program: ``lr`` and ``final_lr_multiplier`` ride the step's
# runtime arguments (training/loop.py, final_lr_multiplier=None); the
# scheduler knobs live entirely in the host loop's per-trial bookkeeping
# arrays.  Everything else (shape dims, solver/field choices, dataset keys)
# changes the traced program and keeps candidates in separate groups.
WAVEABLE_TRAINER_KEYS = frozenset({
    "trainer__lr",
    "trainer__final_lr_multiplier",
    "trainer__plateau_patience",
    "trainer__plateau_factor",
    "trainer__early_stop_patience",
    "trainer__max_epochs",
})


def _shape_signature(point: dict) -> tuple:
    """Shape/program signature of a dunder-encoded candidate: everything
    except the per-trial waveable trainer scalars."""
    return tuple(sorted(
        (k, v) for k, v in point.items() if k not in WAVEABLE_TRAINER_KEYS
    ))


def vmappable_groups(points: List[dict]):
    """Partition wave candidates into groups evaluable as one vmapped
    program (same shape/program signature, differing only in
    :data:`WAVEABLE_TRAINER_KEYS`) and singletons.  Returns a list of lists
    of indices into ``points``."""
    groups: dict = {}
    for i, p in enumerate(points):
        groups.setdefault(_shape_signature(p), []).append(i)
    return list(groups.values())


# Per-run facilities the vmapped loop does not implement; a config using
# any of them routes down the sequential path (which honours them) instead
# of silently dropping fault tolerance / profiling / memory staging.
WAVE_UNSUPPORTED_TRAINER_KEYS = frozenset({
    "checkpoint_dir", "checkpoint_every", "resume", "prefetch",
    "profile_dir", "accum_steps",
})


def config_wave_groups(configs: List[dict]):
    """Partition FULL experiment configs (the sweep runner's units,
    training/experiment.py layout) into co-trainable groups: identical
    except ``seed`` and the waveable trainer scalars, with no
    wave-unsupported trainer options.  Returns a list of lists of indices
    into ``configs``; singletons and unsupported configs come back as
    1-element groups (the caller runs those sequentially).

    The canonical target is the reference's seeds-per-final-config
    protocol (reference configurations.json5 seed lists): K seed replicas
    of one config share the traced program exactly — only the PRNGKey of
    the init differs — so they train as one vmapped dispatch.
    """
    import json

    waveable = {key.split("__", 1)[1] for key in WAVEABLE_TRAINER_KEYS}
    groups: dict = {}
    for i, cfg in enumerate(configs):
        trainer = cfg.get("trainer", {}) or {}
        if any(trainer.get(key) for key in WAVE_UNSUPPORTED_TRAINER_KEYS):
            groups[("__solo__", i)] = [i]
            continue
        base = {k: v for k, v in cfg.items() if k not in ("trainer", "seed")}
        tr = {k: v for k, v in trainer.items() if k not in waveable}
        sig = json.dumps({"base": base, "trainer": tr},
                         sort_keys=True, default=str)
        groups.setdefault(sig, []).append(i)
    return list(groups.values())


def _stack_params(params, k: int):
    return jax.tree.map(lambda x: jnp.broadcast_to(x, (k,) + x.shape), params)


def _select_rows(mask_np, new, old):
    """Per-trial best-params update: rows of ``new`` where mask else ``old``
    (mask is a host (K,) bool array)."""
    mask = jnp.asarray(mask_np)

    def leaf(n, o):
        m = mask.reshape((-1,) + (1,) * (n.ndim - 1))
        return jnp.where(m, n, o)

    return jax.tree.map(leaf, new, old)


def run_trials_vmapped(
    trial_cfgs: List[dict],
    data_root: str = "data/processed",
    verbose: bool = False,
) -> List[dict]:
    """Train every config in ``trial_cfgs`` simultaneously via a vmapped
    step and return one results dict per trial (the keys hyperopt reads:
    ``val.<metric>`` plus the split metrics / cost stats).

    Contract: the configs must be identical except ``seed`` and the
    waveable trainer scalars (``trainer.lr``,
    ``trainer.final_lr_multiplier`` and the host-side scheduler knobs —
    :data:`WAVEABLE_TRAINER_KEYS`); the caller groups by shape signature
    (:func:`vmappable_groups` for hyperopt points,
    :func:`config_wave_groups` for sweep configs).  Raises on mismatch.
    Per-trial seeds change only the init PRNGKey — each trial's parameter
    trajectory equals its sequential run's (tested)."""
    import time

    from online_neural_cdes_tpu.data.loader import Batches, load_numpy_data
    from online_neural_cdes_tpu.training.experiment import npz_path_for
    from online_neural_cdes_tpu.training.harness import _concat_ragged_time, setup_model
    from online_neural_cdes_tpu.training.loop import init_adam_state, make_train_step
    from online_neural_cdes_tpu.training.metrics import (
        METRICS, make_loss, masked_temporal_loss,
    )
    from online_neural_cdes_tpu.utils.params import count_params

    waveable = {key.split("__", 1)[1] for key in WAVEABLE_TRAINER_KEYS}
    k = len(trial_cfgs)
    cfg0 = trial_cfgs[0]

    def _per_trial(key, default, dtype):
        return np.asarray([
            dtype(cfg.get("trainer", {}).get(key, default))
            for cfg in trial_cfgs
        ])

    for cfg in trial_cfgs:
        base = {key: val for key, val in cfg.items()
                if key not in ("trainer", "seed")}
        base0 = {key: val for key, val in cfg0.items()
                 if key not in ("trainer", "seed")}
        tr = {key: val for key, val in cfg.get("trainer", {}).items()
              if key not in waveable}
        tr0 = {key: val for key, val in cfg0.get("trainer", {}).items()
               if key not in waveable}
        if base != base0 or tr != tr0:
            raise ValueError(
                "run_trials_vmapped requires configs identical except the "
                f"waveable trainer scalars {sorted(waveable)}"
            )
        # Per-trial runtime facilities the vmapped loop does not implement;
        # raising sends hyperopt down its sequential fallback (which
        # honours them) instead of silently dropping mid-trial fault
        # tolerance or profiling.
        # NOTE: `epoch_fused` is deliberately NOT in this list — it is a
        # pure execution-strategy knob with identical numerics, and the
        # wave loop already amortises dispatch across trials; silently
        # proceeding loses nothing user-visible, unlike the facilities
        # below.
        unsupported = [key for key in WAVE_UNSUPPORTED_TRAINER_KEYS
                       if cfg.get("trainer", {}).get(key)]
        if unsupported:
            raise ValueError(
                f"wave-incompatible trainer options {sorted(unsupported)}: "
                "checkpoint/resume/prefetch/profiling/accumulation run "
                "only on the sequential trial path"
            )
    lrs = _per_trial("lr", 5e-3, float)
    final_mults = _per_trial("final_lr_multiplier", 10.0, float)
    plateau_patience = _per_trial("plateau_patience", 15, int)
    plateau_factor = _per_trial("plateau_factor", 0.1, float)
    early_stop_patience = _per_trial("early_stop_patience", 60, int)
    max_epochs_arr = _per_trial("max_epochs", 1000, int)

    ds = dict(cfg0.get("dataset", {}))
    model_cfg = dict(cfg0.get("model", {}))
    trainer_cfg = dict(cfg0.get("trainer", {}))
    test_mode = bool(cfg0.get("test_mode", False))
    path = npz_path_for(ds["data_loc"], data_root, test_mode)
    splits = load_numpy_data(
        path, ds.get("interpolation"), use_static=ds.get("use_static", True),
        problem=ds.get("problem"), output_dim=cfg0.get("output_dim", 1),
        label_dtype=cfg0.get("label_dtype"),
    )
    train_data, val_data, test_data = splits

    model_string = model_cfg.pop("model_string", "ncde")
    model_cfg.pop("return_sequences", None)
    bundle = setup_model(
        model_string,
        input_dim=train_data.input_dim, output_dim=train_data.output_dim,
        static_dim=train_data.static_dim,
        interpolation=train_data.model_interpolation or "linear",
        return_sequences=train_data.return_sequences,
        train_data=train_data,
        **{kk: v for kk, v in model_cfg.items() if kk in (
            "hidden_dim", "hidden_hidden_dim", "num_layers", "vector_field",
            "vector_field_type", "interpolation_eps", "sparsity", "adjoint",
            "adjoint_method", "solver",
        )},
    )

    loss_str = trainer_cfg.get("loss_str", "bce")
    metric_names = tuple(trainer_cfg.get("metrics", ("loss",)))
    monitor = trainer_cfg.get("val_metric_to_monitor", "loss")
    minimize = ds.get("minimize")
    if minimize is None:
        minimize = monitor in ("loss",)
    sign = 1.0 if minimize else -1.0
    batch_size = int(ds.get("batch_size", 1024))
    seed = int(cfg0.get("seed", 0))

    # Per-trial seeds: hyperopt trials share the experiment seed (init
    # once, broadcast over the trial axis — the reference's behaviour);
    # co-scheduled sweep seed-replicas each init from their own PRNGKey
    # and stack.  The seed touches ONLY the init (harness.train uses it
    # for nothing else), so either way each lane's trajectory equals its
    # sequential run's.
    seeds = [int(cfg.get("seed", seed)) for cfg in trial_cfgs]
    params1 = bundle.init(jax.random.PRNGKey(seeds[0]))
    num_params = int(count_params(params1))
    if all(s == seeds[0] for s in seeds):
        params = _stack_params(params1, k)
    else:
        per_trial_params = [params1] + [
            bundle.init(jax.random.PRNGKey(s)) for s in seeds[1:]
        ]
        params = jax.tree.map(lambda *xs: jnp.stack(xs), *per_trial_params)
    opt_state = _stack_params(init_adam_state(params1), k)

    # Per-trial LR via the runtime lr_scale: base lr 1.0, scale = lr_i x
    # plateau decay_i (identical arithmetic to the sequential step, whose
    # effective LR is lr * lr_scale).  final_lr_multiplier=None makes the
    # readout boost a runtime scalar too, so trials may differ in it.
    base_step = make_train_step(
        bundle.apply_fn, loss=loss_str, lr=1.0,
        final_lr_multiplier=None,
        donate=False,
        # Trial-invariant (configs differ only in waveable scalars), so the
        # mixed-precision compute storage rides the shared traced program —
        # the wave matches the sequential path's trainer.compute_dtype.
        compute_dtype=cfg0.get("trainer", {}).get("compute_dtype"),
    )
    vstep = jax.jit(jax.vmap(base_step, in_axes=(0, 0, None, None, 0, 0)))
    final_mult_dev = jnp.asarray(final_mults, jnp.float32)
    veval = jax.jit(jax.vmap(bundle.apply_fn, in_axes=(0, None)))
    pointwise = make_loss(loss_str)

    train_batches = Batches(train_data, batch_size)
    val_batches = Batches(val_data, batch_size)
    test_batches = Batches(test_data, batch_size)

    def evaluate(p, batches):
        """Per-trial metrics dicts from the stacked params."""
        preds_all, labels_all, losses, counts = [], [], [], []
        for inputs, labels in batches:
            prepared = bundle.prepare_batch(inputs)
            preds = veval(p, prepared)          # (K, B, ...)
            labels_j = jnp.asarray(labels)
            losses.append(jax.vmap(
                lambda pr: masked_temporal_loss(
                    pointwise, pr, labels_j, sqrt=loss_str == "rmse")
            )(preds))
            counts.append(len(labels))
            preds_all.append(np.asarray(preds))
            labels_all.append(np.asarray(labels))
        losses = np.asarray(jnp.stack(losses))   # (n_batches, K)
        labels_cat = _concat_ragged_time(labels_all)
        out = []
        for i in range(k):
            preds_i = _concat_ragged_time([p[i] for p in preds_all])
            labels_i = labels_cat
            res = {"loss": float(np.average(losses[:, i], weights=counts))}
            for name in metric_names:
                if name == "loss":
                    continue
                try:
                    res[name] = METRICS[name](preds_i, labels_i)
                except ValueError:
                    res[name] = float("nan")
            out.append(res)
        return out

    # NFE bookkeeping at sequential-record parity (harness.py:386-390,
    # 503-507): fixed-grid NFE is parameter-independent — probe once with
    # the shared init; adaptive NFE is parameter-dependent — re-probe each
    # epoch with every trial's own trained params (vmapped) and
    # accumulate.  Non-NCDE bundles record None in both modes.
    from online_neural_cdes_tpu.training.harness import (
        _nfe_is_adaptive, _probe_nfe,
    )

    nfe_adaptive = _nfe_is_adaptive(bundle.model)
    nfe_fixed = (
        None if nfe_adaptive else _probe_nfe(bundle, params1, train_batches)
    )
    vprobe_nfe = None
    if nfe_adaptive:
        try:
            probe_inputs, _ = next(iter(train_batches))
            probe_prepared = bundle.prepare_batch(probe_inputs)
            vprobe_nfe = jax.jit(jax.vmap(
                lambda p: bundle.model.apply(
                    p, probe_prepared, return_stats=True)[1]["nfe"]
            ))
        except Exception:
            vprobe_nfe = None
    nfe_total = np.zeros(k, np.float64)

    best_score = np.full(k, np.inf)
    best_params = params
    best_epoch = np.zeros(k, np.int64)
    plateau_count = np.zeros(k, np.int64)
    plateau_best = np.full(k, np.inf)   # val LOSS, torch scheduler track
    stall_count = np.zeros(k, np.int64)
    decay = np.ones(k, np.float64)
    active = np.ones(k, bool)
    epochs_run = np.zeros(k, np.int64)
    histories: List[list] = [[] for _ in range(k)]

    t_start = time.perf_counter()
    n_wave_epochs = 0
    for epoch in range(int(max_epochs_arr.max())):
        # Per-trial epoch budgets: a trial past its own max_epochs freezes
        # (bookkeeping stops; it still rides the stacked program, like
        # early-stopped trials).
        active = active & (epoch < max_epochs_arr)
        if not active.any():
            break
        lr_scale = jnp.asarray(lrs * decay, jnp.float32)
        for inputs, labels in train_batches:
            prepared = bundle.prepare_batch(inputs)
            params, opt_state, loss_val = vstep(
                params, opt_state, prepared, jnp.asarray(labels), lr_scale,
                final_mult_dev,
            )
        jax.block_until_ready(loss_val)
        epochs_run[active] = epoch + 1
        n_wave_epochs = epoch + 1
        if vprobe_nfe is not None:
            try:
                per_trial_nfe = np.asarray(vprobe_nfe(params), np.float64)
                nfe_total += np.where(active, per_trial_nfe, 0.0) * len(
                    train_batches)
            except Exception:
                vprobe_nfe = None

        val_results = evaluate(params, val_batches)
        scores = np.asarray(
            [sign * r[monitor] for r in val_results], np.float64
        )
        for i in range(k):
            if active[i]:
                histories[i].append(
                    {"epoch": epoch, "lr_scale": float(decay[i]),
                     **val_results[i]}
                )
        if verbose:
            print(f"wave epoch {epoch}: scores {scores}")

        # Same per-trial semantics as the sequential harness
        # (training/harness.py:train): best-checkpoint + early stopping
        # on the MONITORED score with ignite's strict improvement
        # (reference trainer.py:417-443); the plateau scheduler on VAL
        # LOSS with torch ReduceLROnPlateau's rel threshold + min_lr
        # clamp (trainer.py:423-429).
        from online_neural_cdes_tpu.training.harness import (
            PLATEAU_MIN_LR, PLATEAU_REL_THRESHOLD,
        )

        val_losses = np.asarray([r["loss"] for r in val_results], np.float64)
        improved = active & (scores < best_score)
        best_params = _select_rows(improved, params, best_params)
        best_score = np.where(improved, scores, best_score)
        best_epoch = np.where(improved, epoch, best_epoch)
        stall_count = np.where(improved, 0, stall_count + active)
        loss_improved = active & (
            val_losses < plateau_best * (1.0 - PLATEAU_REL_THRESHOLD)
        )
        plateau_best = np.where(loss_improved, val_losses, plateau_best)
        plateau_count = np.where(loss_improved, 0, plateau_count + active)
        decayed = active & (plateau_count > plateau_patience)
        decay = np.where(
            decayed, np.maximum(decay * plateau_factor, PLATEAU_MIN_LR / lrs),
            decay,
        )
        plateau_count = np.where(decayed, 0, plateau_count)
        active = active & ~(stall_count >= early_stop_patience)
        if not active.any():
            break
    elapsed = time.perf_counter() - t_start

    split_results = {
        split: evaluate(best_params, batches)
        for split, batches in (
            ("train", train_batches), ("val", val_batches),
            ("test", test_batches),
        )
    }
    # Cost attribution: every wave epoch advances all K lanes in lockstep,
    # so one epoch costs ``wall / k`` per lane, and a trial accrues only
    # the epochs it was itself active (a trial whose max_epochs/early-stop
    # froze it early keeps riding the program — that lockstep waste is the
    # wave's, not the trial's, so ledger cost stats stay comparable with
    # sequential records even when epoch budgets differ across the wave).
    per_epoch_share = elapsed / max(n_wave_epochs, 1) / k
    results = []
    for i in range(k):
        e_i = max(int(epochs_run[i]), 1)
        if nfe_adaptive and nfe_total[i] > 0:
            nfe_i = float(nfe_total[i])
            nfe_per_epoch_i = nfe_i / e_i
        else:
            nfe_per_epoch_i = nfe_fixed
            nfe_i = None if nfe_fixed is None else nfe_fixed * int(epochs_run[i])
        res = {
            "num_params": num_params,
            "elapsed_time": per_epoch_share * e_i,
            "time_per_epoch": per_epoch_share,
            "epochs_run": int(epochs_run[i]),
            "best_epoch": int(best_epoch[i]),
            "nfe_per_epoch": nfe_per_epoch_i,
            "nfe": nfe_i,
            "memory_usage": None,
            "history": histories[i],
        }
        for split, per_trial in split_results.items():
            res.update({f"{split}.{kk}": v for kk, v in per_trial[i].items()})
        results.append(res)
    return results
