"""Experiment harness: model setup, training loop, results compilation.

Capability parity with the reference's sacred/ignite ingredients
(/root/reference/experiments/ingredients/setup_model.py and trainer.py):

- model registry over ``model_string`` in {ncde, ncde-stacked, ncde-attention,
  odernn, gru-d, gru, gru-dt, gru-intensity, gru-dt-intensity}
  (setup_model.py:56-123; stacked/attention are the reference's extra model
  classes wired here first-class)
- per-batch preparation closure (gru-variant tensor prep with train-set
  feature means, setup_model.py:52-54,125-152)
- training loop with ReduceLROnPlateau (patience 15, factor 0.1), early
  stopping (patience 60), best-by-val-metric checkpointing, max 1000
  epochs (trainer.py:48,54-55,406-444)
- per-run statistics: elapsed time, time/epoch, NFE, params, device peak
  memory (trainer.py:447-510,529-541)

The torch-specific machinery (ignite engines, CUDA memory counters, GPU
pinning) is replaced by jitted steps, ``block_until_ready`` timing and
TPU memory_stats.
"""

from __future__ import annotations

import contextlib
import dataclasses
import os
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from online_neural_cdes_tpu.data.loader import Batches, LoadedData
from online_neural_cdes_tpu.models.attention import AttentionNeuralCDE
from online_neural_cdes_tpu.models.grud import GRUD, prepare_gru_variant_data
from online_neural_cdes_tpu.models.ncde import NeuralCDE
from online_neural_cdes_tpu.models.odernn import ODERNN
from online_neural_cdes_tpu.models.rnn import RNN
from online_neural_cdes_tpu.models.stacked import StackedNeuralCDE
from online_neural_cdes_tpu.training.loop import init_adam_state, make_eval_step, make_train_step
from online_neural_cdes_tpu.training.metrics import METRICS, make_loss, masked_temporal_loss
from online_neural_cdes_tpu.utils.params import count_params

__all__ = ["setup_model", "train", "ModelBundle"]

# Reference trainer scheduler constants (trainer.py:423-424): the plateau
# scheduler is torch ReduceLROnPlateau(threshold=1e-6, min_lr=1e-7) in its
# default 'rel'/'min' mode, always monitoring VAL LOSS (trainer.py:426-429)
# — even when early stopping / checkpointing monitor another metric.
PLATEAU_REL_THRESHOLD = 1e-6
PLATEAU_MIN_LR = 1e-7

MODEL_STRINGS = (
    "ncde", "ncde-stacked", "ncde-attention", "odernn",
    "gru-d", "gru", "gru-dt", "gru-intensity", "gru-dt-intensity",
)


@dataclasses.dataclass
class ModelBundle:
    """A model plus its batch-preparation adapter."""

    model: object
    model_string: str
    prepare_batch: Callable      # raw (inputs, labels) -> model inputs
    apply_fn: Callable           # (params, prepared_inputs) -> preds
    feature_means: Optional[np.ndarray] = None

    def init(self, key, dtype=jnp.float32):
        return self.model.init(key, dtype)


def _train_feature_means(train_data: LoadedData) -> np.ndarray:
    """Per-channel nan-means of the raw training series
    (reference setup_model.py:52-54)."""
    temporal = train_data.temporal
    if isinstance(temporal, list):
        flat = np.concatenate([np.asarray(t).reshape(-1, t.shape[-1]) for t in temporal])
    else:
        flat = np.asarray(temporal).reshape(-1, temporal.shape[-1])
    means = np.nanmean(flat, axis=0)
    means[np.isnan(means)] = 0.0
    return means.astype(np.float32)


def setup_model(
    model_string: str,
    input_dim: int,
    output_dim: int,
    static_dim: Optional[int] = None,
    hidden_dim: int = 15,
    hidden_hidden_dim: int = 15,
    num_layers: int = 3,
    vector_field: str = "original",
    vector_field_type: str = "matmul",
    interpolation: str = "linear",
    interpolation_eps: Optional[float] = None,
    sparsity: Optional[float] = None,
    adjoint: bool = True,
    adjoint_method: Optional[str] = None,
    solver: str = "rk4",
    return_sequences: bool = False,
    train_data: Optional[LoadedData] = None,
) -> ModelBundle:
    """Build a model + batch adapter from a config (reference
    setup_model.py:33-152)."""
    if model_string not in MODEL_STRINGS:
        raise ValueError(
            f"unknown model_string {model_string!r}; one of {MODEL_STRINGS}"
        )

    identity = lambda inputs: inputs

    if model_string == "ncde":
        model = NeuralCDE(
            input_dim=input_dim, hidden_dim=hidden_dim, output_dim=output_dim,
            static_dim=static_dim, hidden_hidden_dim=hidden_hidden_dim,
            num_layers=num_layers, vector_field=vector_field,
            vector_field_type=vector_field_type, interpolation=interpolation,
            interpolation_eps=interpolation_eps, sparsity=sparsity,
            adjoint=adjoint, adjoint_method=adjoint_method, solver=solver,
            return_sequences=return_sequences,
        )
        return ModelBundle(model, model_string, identity, model.apply)

    if model_string == "ncde-stacked":
        model = StackedNeuralCDE(
            input_dim=input_dim, hidden_dims=(hidden_dim, hidden_dim),
            output_dim=output_dim, hidden_hidden_dim=hidden_hidden_dim,
            static_dim=static_dim, adjoint=adjoint,
            return_sequences=return_sequences,
        )
        return ModelBundle(model, model_string, identity, model.apply)

    if model_string == "ncde-attention":
        if return_sequences:
            raise ValueError(
                "ncde-attention supports one-shot problems only: the "
                "attention pipeline compresses the path before the final "
                "NCDE, so per-step (online) outputs are undefined "
                "(the reference's AttentionNeuralCDE likewise has no "
                "return_sequences, src/ncde/attention.py:10-141)."
            )
        model = AttentionNeuralCDE(
            input_dim=input_dim, hidden_dim=hidden_dim, output_dim=output_dim,
            static_dim=static_dim, adjoint=adjoint,
        )
        return ModelBundle(model, model_string, identity, model.apply)

    if model_string == "odernn":
        # Reference parity (setup_model.py:107-120): ODERNN consumes the
        # 'gru-intensity' preparation — mean-imputed values plus cumulative
        # observation-mask channels — with input_dim doubled accordingly.
        model = ODERNN(
            input_dim=input_dim * 2, hidden_dim=hidden_dim,
            output_dim=output_dim, hidden_hidden_dim=hidden_hidden_dim,
            num_layers=num_layers, solver=solver, adjoint=adjoint,
            return_sequences=return_sequences,
        )
        means = _train_feature_means(train_data) if train_data is not None else None
        means_j = jnp.asarray(means) if means is not None else None

        def prep(inputs):
            temporal = inputs[1] if isinstance(inputs, tuple) else inputs
            return prepare_gru_variant_data(
                jnp.asarray(temporal), "gru-intensity", feature_means=means_j
            )

        return ModelBundle(model, model_string, prep, model.apply, means)

    # GRU family: per-batch tensor preparation with train-set means.
    means = _train_feature_means(train_data) if train_data is not None else None

    if model_string == "gru-d":
        model = GRUD(
            input_dim=input_dim, hidden_dim=hidden_dim, output_dim=output_dim,
            return_sequences=return_sequences,
        )
        means_j = jnp.asarray(means) if means is not None else jnp.zeros((input_dim,))

        def prep(inputs):
            temporal = inputs[1] if isinstance(inputs, tuple) else inputs
            return prepare_gru_variant_data(
                jnp.asarray(temporal), "gru-d", feature_means=means_j
            )

        def apply_fn(params, prepared):
            return model.apply(params, prepared, means_j)

        return ModelBundle(model, model_string, prep, apply_fn, means)

    # gru / gru-dt / gru-intensity / gru-dt-intensity: channel-concat input.
    multiplier = {"gru": 1, "gru-intensity": 2, "gru-dt": 2, "gru-dt-intensity": 3}[
        model_string
    ]
    model = RNN(
        input_dim=input_dim * multiplier, hidden_dim=hidden_dim,
        output_dim=output_dim, gru=True, return_sequences=return_sequences,
    )
    means_j = jnp.asarray(means) if means is not None else None

    def prep(inputs, _variant=model_string):
        temporal = inputs[1] if isinstance(inputs, tuple) else inputs
        return prepare_gru_variant_data(
            jnp.asarray(temporal), _variant, feature_means=means_j
        )

    return ModelBundle(model, model_string, prep, model.apply, means)


# ---------------------------------------------------------------------------
# Training loop
# ---------------------------------------------------------------------------

def _device_peak_memory_mb() -> Optional[float]:
    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats and "peak_bytes_in_use" in stats:
            return stats["peak_bytes_in_use"] / 2**20
    except Exception:
        pass
    return None


def _concat_ragged_time(chunks):
    """Concatenate per-batch arrays whose TIME axis (axis 1) may differ:
    ragged datasets pad each batch window to its own bucketed length
    (data/loader.py), so sequence outputs are (B, L_w, ...) with L_w
    varying across windows.  Shorter chunks NaN-pad to the longest — NaN
    labels are masked by every metric, and the matching prediction rows
    are never selected."""
    if len(chunks) == 1 or chunks[0].ndim < 2:
        return np.concatenate(chunks)
    max_len = max(c.shape[1] for c in chunks)
    if all(c.shape[1] == max_len for c in chunks):
        return np.concatenate(chunks)
    padded = []
    for c in chunks:
        if c.shape[1] < max_len:
            pad = [(0, 0)] * c.ndim
            pad[1] = (0, max_len - c.shape[1])
            c = np.pad(c, pad, constant_values=np.nan)
        padded.append(c)
    return np.concatenate(padded)


def _pad_to_mesh_multiple(prepared, labels, n_data: int):
    """Pad a ragged tail batch up to the mesh data-axis multiple so the
    sharded train step accepts it: inputs repeat their final row, labels
    pad with NaN — the NaN-masked losses ignore the padding, so the
    gradient (sum over real rows / real count) is unchanged."""
    b = int(labels.shape[0])
    pad = (-b) % n_data
    if pad == 0:
        return prepared, labels
    if not jnp.issubdtype(labels.dtype, jnp.floating):
        labels = labels.astype(jnp.float32)  # NaN-maskable
    prepared = jax.tree.map(
        lambda a: jnp.concatenate(
            [a, jnp.repeat(a[-1:], pad, axis=0)], axis=0),
        prepared,
    )
    labels = jnp.concatenate(
        [labels, jnp.full((pad,) + labels.shape[1:], jnp.nan, labels.dtype)],
        axis=0,
    )
    return prepared, labels


def _evaluate(bundle, params, batches, loss_name, metric_names, mesh=None):
    pointwise = make_loss(loss_name)
    # Cache one eval step per MESH OBJECT (Mesh is hashable): a bundle
    # reused across differently-meshed runs must not serve stale
    # NamedShardings from an earlier mesh.
    cache = getattr(bundle, "_eval_steps", None)
    if cache is None:
        cache = {}
        bundle._eval_steps = cache
    eval_step = cache.get(mesh)
    if eval_step is None:
        eval_step = make_eval_step(bundle.apply_fn, mesh=mesh)
        cache[mesh] = eval_step
    n_data = None
    if mesh is not None:
        from online_neural_cdes_tpu.parallel.mesh import data_axis_size

        n_data = data_axis_size(mesh)
    # Enqueue a WINDOW of batches' forwards + losses before transferring:
    # dispatch is asynchronous, so the device pipelines the window while
    # the host pays one transfer per array at the window end instead of a
    # blocking sync per batch (the dispatch+sync round-trip on a tunneled
    # backend can reach seconds, making per-batch syncs the entire eval
    # cost).  The window bounds device residency: at most ``window``
    # batches of predictions live in HBM at once.
    window = 8
    preds_all, labels_all, losses_dev, counts = [], [], [], []
    pending = []
    for inputs, labels in batches:
        prepared = bundle.prepare_batch(inputs)
        labels_j = jnp.asarray(labels)
        padded = False
        if n_data is not None and labels_j.shape[0] % n_data:
            # Pad ragged tails to the mesh multiple; NaN pad labels are
            # masked out of the loss here AND of the host metrics below
            # (the metric helpers mask NaN rows), so results are exact.
            prepared, labels_j = _pad_to_mesh_multiple(
                prepared, labels_j, n_data
            )
            padded = True
        preds = eval_step(params, prepared)
        losses_dev.append(
            masked_temporal_loss(pointwise, preds, labels_j, sqrt=loss_name == "rmse")
        )
        # Weight by the REAL batch size: each batch's masked loss already
        # averages over its real rows only, pad rows contribute nothing.
        counts.append(len(labels))
        pending.append(preds)
        # Only a padded tail needs the device labels (alignment with the
        # padded predictions); everything else keeps the host array — no
        # per-batch device fetch in this loop.
        labels_all.append(np.asarray(labels_j) if padded
                          else np.asarray(labels))
        if len(pending) >= window:
            preds_all.extend(np.asarray(p) for p in pending)
            pending = []
    preds_all.extend(np.asarray(p) for p in pending)
    losses = [float(v) for v in np.asarray(jnp.stack(losses_dev))]
    preds = _concat_ragged_time(preds_all)
    labels = _concat_ragged_time(labels_all)
    results = {"loss": float(np.average(losses, weights=counts))}
    for name in metric_names:
        if name == "loss":
            continue
        try:
            results[name] = METRICS[name](preds, labels)
        except ValueError:
            results[name] = float("nan")
    return results


def _build_fused_epoch(bundle, train_batches, mesh, loss_str, lr,
                       final_lr_multiplier, compute_dtype, accum_steps=None):
    """Epoch fusion setup (trainer.epoch_fused): one lax.scan dispatch per
    epoch over pre-stacked batches instead of one dispatch per step — on a
    tunneled/remote device per-step dispatch latency dominates small
    models (the bench toy's protocol, loop.make_epoch_step).  Batches
    iterate deterministically, so the stack happens ONCE; only the longest
    same-shape PREFIX fuses (bucketed lengths / the ragged tail batch can
    differ) and the remainder runs through the per-step path in original
    order — the update sequence is identical to the unfused trainer
    (tested).  Trades device memory (the stacked prefix stays resident)
    for dispatch.  Returns (epoch_fn, stacked_inputs, stacked_labels,
    tail); epoch_fn is None when no >=2-batch uniform prefix exists (the
    per-step path is then already one dispatch per batch)."""
    from online_neural_cdes_tpu.training.loop import make_epoch_step

    n_data = None
    if mesh is not None:
        from online_neural_cdes_tpu.parallel.mesh import data_axis_size

        n_data = data_axis_size(mesh)
    prepared_all, labels_all = [], []
    for inputs, labels in train_batches:
        p, lj = bundle.prepare_batch(inputs), jnp.asarray(labels)
        if n_data is not None:
            p, lj = _pad_to_mesh_multiple(p, lj, n_data)
        prepared_all.append(p)
        labels_all.append(lj)

    def _shapes(tree):
        return jax.tree.map(lambda a: jnp.shape(a), tree)

    k = 1
    while (
        k < len(prepared_all)
        and _shapes(prepared_all[k]) == _shapes(prepared_all[0])
        and labels_all[k].shape == labels_all[0].shape
    ):
        k += 1
    if k < 2:
        return None, None, None, list(zip(prepared_all, labels_all))
    stacked_inputs = jax.tree.map(lambda *xs: jnp.stack(xs),
                                  *prepared_all[:k])
    stacked_labels = jnp.stack(labels_all[:k])
    epoch_fn = make_epoch_step(
        bundle.apply_fn, loss=loss_str, lr=lr,
        final_lr_multiplier=final_lr_multiplier, mesh=mesh,
        donate=False, compute_dtype=compute_dtype, accum_steps=accum_steps,
    )
    return (epoch_fn, stacked_inputs, stacked_labels,
            list(zip(prepared_all[k:], labels_all[k:])))


def train(
    bundle: ModelBundle,
    train_data: LoadedData,
    val_data: LoadedData,
    test_data: LoadedData,
    *,
    loss_str: str = "bce",
    metrics: tuple = ("loss",),
    val_metric_to_monitor: str = "loss",
    minimize: Optional[bool] = None,
    lr: float = 5e-3,
    final_lr_multiplier: float = 10.0,
    max_epochs: int = 1000,
    batch_size: int = 1024,
    plateau_patience: int = 15,
    plateau_factor: float = 0.1,
    early_stop_patience: int = 60,
    seed: int = 0,
    mesh=None,
    verbose: bool = False,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 0,
    resume: bool = False,
    prefetch: int = 0,
    profile_dir: Optional[str] = None,
    compute_dtype: Optional[str] = None,
    epoch_fused: bool = False,
    accum_steps: Optional[int] = None,
    init_params: Optional[dict] = None,
) -> dict:
    """Full training run; returns the reference's ``compile_results`` dict
    (trainer.py:472-510): metrics for all splits + cost statistics.

    Step-granularity fault recovery (beyond the reference's rerun-the-config
    resume, runs.py:50-57): with ``checkpoint_dir`` and
    ``checkpoint_every=N``, the FULL trainer state (params, optimiser
    state, best params, scheduler counters, history) is persisted every N
    epochs; ``resume=True`` continues from it exactly — the resumed run is
    bit-identical to an uninterrupted one (tested).

    ``prefetch=N`` (N >= 1) double-buffers the input pipeline: each epoch's
    batches are moved host->device up to N batches ahead of the executing
    step (pre-sharded over the mesh's data axis when ``mesh`` is given), so
    the H2D copy overlaps the previous step's compute instead of sitting on
    the critical path (``data/prefetch.py``).

    ``epoch_fused=True``: ONE device dispatch per epoch — the same-shape
    batch prefix is stacked once and the shared step body ``lax.scan``s
    over it (``loop.make_epoch_step``); differently-shaped batches (the
    ragged tail, bucketed lengths) run through the per-step path in
    original order, so the update sequence is identical to the default
    trainer (tested).  Wins when dispatch latency dominates (small
    models, tunneled/remote devices); costs device memory (the stacked
    prefix stays resident).  Mutually exclusive with ``prefetch``.

    ``profile_dir``: capture a ``jax.profiler`` trace of the SECOND epoch
    (the first compiles) into the directory, viewable in TensorBoard /
    Perfetto (the TPU-native analogue of the reference's CUDA memory/time
    counters, SURVEY §5 tracing)."""
    if final_lr_multiplier is None:
        # None is the vmapped-wave sentinel (make_train_step's 6-argument
        # runtime-scalar signature, training/wave.py); the sequential
        # harness calls the 5-argument form, so a config that explicitly
        # sets `trainer.final_lr_multiplier: null` would otherwise surface
        # as a confusing TypeError deep inside the epoch loop.
        raise ValueError(
            "train(final_lr_multiplier=None): None is reserved for the "
            "vmapped wave path; pass a number (reference default 10.0, "
            "trainer.py:272-302)."
        )
    if epoch_fused and prefetch > 0:
        raise ValueError(
            "epoch_fused and prefetch are mutually exclusive: the fused "
            "epoch transfers the whole split once, there is nothing to "
            "overlap per batch"
        )
    if minimize is None:
        minimize = val_metric_to_monitor in ("loss",)
    sign = 1.0 if minimize else -1.0

    key = jax.random.PRNGKey(seed)
    # init_params: warm starts and weight-copied oracles (the trainer-
    # dynamics parity suite copies the reference model's initial weights
    # here); the seed then seeds nothing else — the trainer is
    # deterministic given data + init.
    params = bundle.init(key) if init_params is None else init_params
    opt_state = init_adam_state(params)
    num_params = count_params(params)

    step = make_train_step(
        bundle.apply_fn, loss=loss_str, lr=lr,
        final_lr_multiplier=final_lr_multiplier, mesh=mesh, donate=False,
        compute_dtype=compute_dtype, accum_steps=accum_steps,
    )
    train_batches = Batches(train_data, batch_size)
    val_batches = Batches(val_data, batch_size)
    test_batches = Batches(test_data, batch_size)
    if len(train_batches) == 0:
        raise ValueError("Training split is empty — nothing to train on.")

    best_score = np.inf
    best_params = params
    best_epoch = 0
    plateau_count = 0
    plateau_best = np.inf   # val LOSS tracked by the plateau scheduler
    stall_count = 0
    lr_scale = 1.0
    history = []
    start_epoch = 0
    nfe_resumed = 0

    ckpt_path = (
        os.path.join(checkpoint_dir, "trainer_state")
        if checkpoint_dir is not None else None
    )
    if resume and ckpt_path is not None and os.path.exists(ckpt_path + ".meta.json"):
        import json

        from online_neural_cdes_tpu.utils.checkpoint import load_checkpoint

        like = {"params": params, "opt_state": opt_state, "best": params}
        restored = load_checkpoint(ckpt_path, like)
        params = restored["params"]
        opt_state = restored["opt_state"]
        best_params = restored["best"]
        with open(ckpt_path + ".meta.json") as fh:
            meta = json.load(fh)
        start_epoch = int(meta["next_epoch"])
        best_score = float(meta["best_score"])
        best_epoch = int(meta["best_epoch"])
        plateau_count = int(meta["plateau_count"])
        plateau_best = float(meta.get("plateau_best", np.inf))
        stall_count = int(meta["stall_count"])
        lr_scale = float(meta["lr_scale"])
        nfe_resumed = int(meta.get("nfe_total", 0))
        history = list(meta.get("history", []))
    # Fixed-grid NFE is parameter-independent: probe once.  Adaptive NFE is
    # state/parameter-dependent: re-probe with the trained params each epoch
    # and accumulate (the reference reads the field's counter during
    # training, trainer.py:464-468).
    nfe_adaptive = _nfe_is_adaptive(bundle.model)
    nfe_per_epoch = (
        None if nfe_adaptive else _probe_nfe(bundle, params, train_batches)
    )
    nfe_total = nfe_resumed

    if prefetch > 0:
        from jax.sharding import NamedSharding, PartitionSpec

        from online_neural_cdes_tpu.data.prefetch import prefetch_to_device

        batch_sharding = (
            None if mesh is None else NamedSharding(mesh, PartitionSpec("data"))
        )

        def _mesh_padded():
            # The prefetcher pre-shards RAW batches over the data axis, so
            # ragged tails must pad before it (same NaN-label masking as
            # the un-prefetched path; prepare_batch runs on padded rows).
            if mesh is None:
                yield from train_batches
                return
            from online_neural_cdes_tpu.parallel.mesh import data_axis_size

            n_data = data_axis_size(mesh)
            for inputs, labels in train_batches:
                yield _pad_to_mesh_multiple(
                    inputs, jnp.asarray(labels), n_data
                )

        def epoch_batches():
            return prefetch_to_device(
                _mesh_padded(), size=prefetch, sharding=batch_sharding
            )
    else:

        def epoch_batches():
            return train_batches

    epoch_fn = stacked_inputs = stacked_labels = None
    fused_tail: list = []
    if epoch_fused:
        epoch_fn, stacked_inputs, stacked_labels, fused_tail = (
            _build_fused_epoch(
                bundle, train_batches, mesh, loss_str, lr,
                final_lr_multiplier, compute_dtype, accum_steps,
            )
        )

    # Profile the second epoch (the first compiles) — or the only epoch
    # when just one will run, so profile_dir never silently captures
    # nothing.
    profile_epoch = (
        start_epoch + 1 if max_epochs - start_epoch > 1 else start_epoch
    )
    # Mesh-constant divisor for ragged-tail padding, computed ONCE; the
    # prefetch path already pads upstream (its batches arrive pre-sharded),
    # so the in-loop pad applies only to the direct path.
    step_pad_n = None
    if mesh is not None and prefetch == 0:
        from online_neural_cdes_tpu.parallel.mesh import data_axis_size

        step_pad_n = data_axis_size(mesh)

    t_start = time.perf_counter()
    epochs_run = start_epoch
    for epoch in range(start_epoch, max_epochs):
        profiling = profile_dir is not None and epoch == profile_epoch
        if profiling:
            from online_neural_cdes_tpu.utils.profiling import trace

            ctx = trace(profile_dir)
        else:
            ctx = contextlib.nullcontext()
        with ctx:
            if epoch_fused:
                if epoch_fn is not None:
                    params, opt_state, losses = epoch_fn(
                        params, opt_state, stacked_inputs, stacked_labels,
                        lr_scale,
                    )
                    loss_val = losses[-1]
                for prepared, lab in fused_tail:
                    params, opt_state, loss_val = step(
                        params, opt_state, prepared, lab, lr_scale
                    )
            else:
                for inputs, labels in epoch_batches():
                    prepared = bundle.prepare_batch(inputs)
                    labels_j = jnp.asarray(labels)
                    if step_pad_n is not None:
                        prepared, labels_j = _pad_to_mesh_multiple(
                            prepared, labels_j, step_pad_n
                        )
                    params, opt_state, loss_val = step(
                        params, opt_state, prepared, labels_j, lr_scale,
                    )
            if profiling:
                from online_neural_cdes_tpu.utils.profiling import device_sync

                device_sync(loss_val)
        jax.block_until_ready(loss_val)
        epochs_run += 1
        if nfe_adaptive:
            epoch_nfe = _probe_nfe(bundle, params, train_batches)
            if epoch_nfe is not None:
                nfe_total += epoch_nfe

        val_results = _evaluate(bundle, params, val_batches, loss_str,
                                metrics, mesh=mesh)
        score = sign * val_results[val_metric_to_monitor]
        history.append({"epoch": epoch, "lr_scale": lr_scale, **val_results})
        if verbose:
            print(f"epoch {epoch}: train_loss {float(loss_val):.4f} val {val_results}")

        # Best-checkpoint + early stopping ride the MONITORED score with
        # ignite's strict-improvement semantics (ModelCheckpoint replaces
        # only on score > retained priority; EarlyStopping resets only on
        # score > best, stops at counter >= patience — trainer.py:417-443).
        if score < best_score:
            best_score = score
            best_params = params
            best_epoch = epoch
            stall_count = 0
        else:
            stall_count += 1
        # The plateau scheduler is torch ReduceLROnPlateau on VAL LOSS
        # (trainer.py:423-429): rel-threshold improvement test
        # loss < best * (1 - 1e-6), reduce when num_bad > patience, clamp
        # at min_lr=1e-7.  The single lr_scale clamps the BASE param group
        # exactly; the boosted readout group floors at 10x min_lr instead
        # of min_lr — reachable only after lr_scale has decayed below
        # min_lr*final_mult/lr, i.e. long after training has plateaued.
        if val_results["loss"] < plateau_best * (1.0 - PLATEAU_REL_THRESHOLD):
            plateau_best = val_results["loss"]
            plateau_count = 0
        else:
            plateau_count += 1
            if plateau_count > plateau_patience:
                lr_scale = max(lr_scale * plateau_factor,
                               PLATEAU_MIN_LR / lr)
                plateau_count = 0
        if stall_count >= early_stop_patience:
            break

        if (
            ckpt_path is not None and checkpoint_every > 0
            and (epoch + 1) % checkpoint_every == 0
        ):
            import json

            from online_neural_cdes_tpu.utils.checkpoint import save_checkpoint

            save_checkpoint(
                ckpt_path,
                {"params": params, "opt_state": opt_state, "best": best_params},
            )
            meta = {
                "next_epoch": epoch + 1,
                "best_score": float(best_score),
                "best_epoch": int(best_epoch),
                "plateau_count": int(plateau_count),
                "plateau_best": float(plateau_best),
                "stall_count": int(stall_count),
                "lr_scale": float(lr_scale),
                "nfe_total": int(nfe_total),
                "history": history,
            }
            tmp = ckpt_path + ".meta.json.tmp"
            with open(tmp, "w") as fh:
                json.dump(meta, fh)
            os.replace(tmp, ckpt_path + ".meta.json")

    elapsed = time.perf_counter() - t_start

    if checkpoint_dir is not None:
        # Persist the best parameters (the reference only kept a transient
        # tempdir checkpoint, trainer.py:437-443,211).
        from online_neural_cdes_tpu.utils.checkpoint import save_checkpoint

        save_checkpoint(
            os.path.join(checkpoint_dir, "best_params"), best_params
        )

    if nfe_adaptive and nfe_total > 0:
        nfe = nfe_total
        nfe_per_epoch = nfe_total / max(epochs_run, 1)
    else:
        nfe = None if nfe_per_epoch is None else nfe_per_epoch * epochs_run
    results = {
        "num_params": int(num_params),
        "elapsed_time": elapsed,
        "time_per_epoch": elapsed / max(epochs_run, 1),
        "epochs_run": epochs_run,
        "best_epoch": best_epoch,
        "nfe_per_epoch": nfe_per_epoch,
        "nfe": nfe,
        "memory_usage": _device_peak_memory_mb(),
        "history": history,
    }
    for split, batches in (
        ("train", train_batches), ("val", val_batches), ("test", test_batches)
    ):
        split_results = _evaluate(bundle, best_params, batches, loss_str,
                                  metrics, mesh=mesh)
        results.update({f"{split}.{k}": v for k, v in split_results.items()})
    results["best_params"] = best_params
    return results


def _nfe_is_adaptive(model) -> bool:
    from online_neural_cdes_tpu.ops.solvers import ADAPTIVE_METHODS

    return getattr(model, "solver", None) in ADAPTIVE_METHODS


def _probe_nfe(bundle, params, train_batches) -> Optional[int]:
    """Epoch NFE for NCDE models (the paper's efficiency metric): the first
    batch's measured NFE at ``params`` x batch count.  Exact for fixed-grid
    solvers; for adaptive solvers NFE is state/parameter-dependent, so the
    caller re-probes with the *trained* params each epoch (the reference
    accumulates the field's counter during training, trainer.py:464-468)."""
    model = bundle.model
    if not isinstance(model, NeuralCDE):
        return None
    try:
        inputs, _ = next(iter(train_batches))
        prepared = bundle.prepare_batch(inputs)
        _, stats = model.apply(params, prepared, return_stats=True)
        return int(stats["nfe"]) * len(train_batches)
    except Exception:
        return None
