"""Jitted, mesh-sharded training steps.

The reference's training loop is pytorch-ignite driving per-batch H2D
copies and a Python epoch loop (experiments/ingredients/trainer.py:311-345,
447-469).  Here the unit is a pure jitted ``train_step`` — params
replicated, batch sharded over the mesh's data axis, gradient psum inserted
by XLA from the shardings (SURVEY.md §2.7's TPU-native equivalent).

Optimizer parity with reference trainer.py:272-308: Adam, default lr 5e-3,
10x learning rate on the final linear layer, and ReduceLROnPlateau-style
scheduling — implemented by passing an ``lr_scale`` scalar into the jitted
step (no recompilation when the plateau scheduler decays it).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from online_neural_cdes_tpu.training.metrics import (
    make_loss, masked_temporal_loss, masked_temporal_loss_parts,
)

__all__ = [
    "make_optimizer", "make_train_step", "make_epoch_step", "make_eval_step",
]


def make_optimizer(lr: float = 5e-3, final_lr_multiplier: float = 10.0,
                   final_key: str = "final") -> optax.GradientTransformation:
    """Static-LR Adam with the boosted readout learning rate (multi_transform
    over top-level param labels).  For plateau scheduling prefer
    :func:`make_train_step`'s built-in lr_scale argument."""

    def label_fn(params):
        return {k: ("final" if k == final_key else "rest") for k in params}

    return optax.multi_transform(
        {"rest": optax.adam(lr), "final": optax.adam(lr * final_lr_multiplier)},
        label_fn,
    )


def _resolve_apply(model_or_fn) -> Callable:
    if callable(model_or_fn) and not hasattr(model_or_fn, "apply"):
        return model_or_fn
    return model_or_fn.apply


def _make_step_body(model, optimizer, loss, lr, final_lr_multiplier,
                    final_key, compute_dtype=None, accum_steps=None):
    """The un-jitted per-batch update shared by :func:`make_train_step`
    (jitted directly) and :func:`make_epoch_step` (scanned over stacked
    batches).  Returns ``(step, n_runtime)`` where ``n_runtime`` counts the
    trailing runtime-scalar arguments (0: fixed optimizer; 1: ``lr_scale``;
    2: ``lr_scale, final_mult`` when ``final_lr_multiplier is None``)."""
    apply_fn = _resolve_apply(model)
    pointwise = make_loss(loss)
    sqrt = loss == "rmse"

    if compute_dtype is None:

        def preds_fn(params, inputs):
            return apply_fn(params, inputs)

    else:
        # Mixed-precision compute storage (AMP-style): master weights and
        # the optimizer stay f32; the fwd+bwd runs on params/inputs cast
        # to ``compute_dtype`` (bf16 halves the HBM bytes of weights,
        # coefficients and the backward's rematerialised activations —
        # MXU passes are bf16 either way on TPU, so this relieves
        # traffic, not compute).  jax differentiates through the casts,
        # so gradients come back f32 and updates keep full precision.
        cdt = jnp.dtype(compute_dtype)
        if not jnp.issubdtype(cdt, jnp.floating):
            raise ValueError(
                f"compute_dtype must be a floating dtype, got {compute_dtype!r}"
            )

        def _cast(tree):
            return jax.tree.map(
                lambda a: a.astype(cdt)
                if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else a,
                tree,
            )

        def preds_fn(params, inputs):
            return apply_fn(_cast(params), _cast(inputs)).astype(jnp.float32)

    def loss_fn(params, inputs, labels):
        return masked_temporal_loss(
            pointwise, preds_fn(params, inputs), labels, sqrt=sqrt
        )

    if accum_steps is None or int(accum_steps) <= 1:
        value_and_grad_fn = jax.value_and_grad(loss_fn)
    else:
        # Gradient accumulation: the batch splits into `accum_steps`
        # microbatches scanned with SUM-form masked losses (micro sums
        # add exactly; micro MEANS would need per-micro mask counts to
        # recombine) and one optimizer update.  Peak activation memory
        # drops ~accum_steps-fold — the HBM lever for effective batches
        # beyond device memory, composing with remat and compute_dtype.
        # For rmse the sqrt is a reduction-level transform: accumulate
        # the mse gradient, then chain d sqrt(m)/dm = 1/(2 sqrt(m)).
        n_micro = int(accum_steps)

        def loss_parts(params, inputs, labels):
            return masked_temporal_loss_parts(
                pointwise, preds_fn(params, inputs), labels
            )

        def value_and_grad_fn(params, inputs, labels):
            def resh(a):
                b = a.shape[0]
                if b % n_micro:
                    raise ValueError(
                        f"accum_steps={n_micro} must divide the batch "
                        f"size {b}"
                    )
                return a.reshape((n_micro, b // n_micro) + a.shape[1:])

            inputs_m = jax.tree.map(resh, inputs)
            labels_m = resh(labels)

            def micro(carry, mb):
                gsum, tsum, csum = carry
                mb_in, mb_lab = mb
                (t, c), g = jax.value_and_grad(
                    lambda p: loss_parts(p, mb_in, mb_lab), has_aux=True
                )(params)
                return (
                    jax.tree.map(jnp.add, gsum, g),
                    tsum + t, csum + c,
                ), None

            zeros = jax.tree.map(jnp.zeros_like, params)
            probe_t, probe_c = jax.eval_shape(
                lambda p: loss_parts(
                    p,
                    jax.tree.map(lambda a: a[0], inputs_m),
                    labels_m[0],
                ),
                params,
            )
            t0 = jnp.zeros((), probe_t.dtype)
            c0 = jnp.zeros((), probe_c.dtype)
            (gsum, tsum, csum), _ = jax.lax.scan(
                micro, (zeros, t0, c0), (inputs_m, labels_m)
            )
            csafe = jnp.maximum(csum, 1)
            mean = tsum / csafe
            if sqrt:
                value = jnp.sqrt(mean)
                scale = 1.0 / (2.0 * jnp.maximum(value, 1e-12) * csafe)
            else:
                value = mean
                scale = 1.0 / csafe
            grads = jax.tree.map(
                lambda g: (g * scale).astype(g.dtype), gsum
            )
            return value, grads

    if optimizer is not None:

        def step(params, opt_state, inputs, labels):
            value, grads = value_and_grad_fn(params, inputs, labels)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, value

        return step, 0

    adam = optax.scale_by_adam()

    def apply_scaled(params, opt_state, grads, lr_scale, final_mult):
        updates, opt_state = adam.update(grads, opt_state)
        scaled = {
            k: jax.tree.map(
                lambda u: -(lr * (final_mult if k == final_key else 1.0))
                * lr_scale * u,
                v,
            )
            for k, v in updates.items()
        }
        return optax.apply_updates(params, scaled), opt_state

    if final_lr_multiplier is None:
        # The readout boost rides as runtime data (per-trial in vmapped
        # hyperopt waves, training/wave.py) instead of a closure constant.
        def step(params, opt_state, inputs, labels, lr_scale, final_mult):
            value, grads = value_and_grad_fn(params, inputs, labels)
            params, opt_state = apply_scaled(
                params, opt_state, grads, lr_scale, final_mult
            )
            return params, opt_state, value

        return step, 2

    def step(params, opt_state, inputs, labels, lr_scale):
        value, grads = value_and_grad_fn(params, inputs, labels)
        params, opt_state = apply_scaled(
            params, opt_state, grads, lr_scale, final_lr_multiplier
        )
        return params, opt_state, value

    return step, 1


def _jit_with_mesh(fn, mesh, n_runtime, batch_spec, donate):
    """Shared jit/sharding scaffolding: params+opt replicated, batch data
    sharded per ``batch_spec``, replicated trailing runtime scalars."""
    if mesh is None:
        return jax.jit(fn, donate_argnums=(0, 1) if donate else ())
    batch_sh = NamedSharding(mesh, batch_spec)
    repl_sh = NamedSharding(mesh, P())
    in_sh = [repl_sh, repl_sh, batch_sh, batch_sh] + [repl_sh] * n_runtime
    return jax.jit(
        fn,
        in_shardings=tuple(in_sh),
        out_shardings=(repl_sh, repl_sh, repl_sh),
        donate_argnums=(0, 1) if donate else (),
    )


def make_train_step(
    model,
    optimizer: Optional[optax.GradientTransformation] = None,
    loss: str = "bce",
    lr: float = 5e-3,
    final_lr_multiplier: float = 10.0,
    final_key: str = "final",
    mesh: Optional[Mesh] = None,
    donate: bool = True,
    compute_dtype=None,
    accum_steps: Optional[int] = None,
) -> Callable:
    """Returns a jitted step.

    ``compute_dtype`` (e.g. ``"bfloat16"``): mixed-precision compute
    storage — master weights/optimizer stay f32, the fwd+bwd runs with
    params and float inputs cast to this dtype (halves their HBM
    traffic; gradients return f32 through the cast).

    ``accum_steps=N``: gradient accumulation — the batch splits into N
    scanned microbatches with sum-form masked losses and ONE optimizer
    update; identical gradients to the full-batch step (fp reorder
    aside), ~N-fold lower peak activation memory.  N must divide the
    batch size.

    With ``optimizer`` given (e.g. from :func:`make_optimizer`):
        ``step(params, opt_state, inputs, labels) -> (params, opt_state, loss)``
    Without it, Adam with a dynamic LR is built in:
        ``step(params, opt_state, inputs, labels, lr_scale) -> ...`` where
        the effective LR is ``lr * lr_scale`` (x ``final_lr_multiplier`` on
        the ``final_key`` subtree) — the plateau scheduler shrinks
        ``lr_scale`` without retracing.  ``final_lr_multiplier=None`` makes
        the boost a runtime scalar too:
        ``step(params, opt_state, inputs, labels, lr_scale, final_mult)``
        (per-trial readout boosts in vmapped hyperopt waves).

    ``model`` is a model object with ``.apply(params, inputs)`` or a plain
    ``apply_fn(params, inputs)``.  NaN labels are masked (reference
    TemporalLossWrapper).
    """
    step, n_runtime = _make_step_body(
        model, optimizer, loss, lr, final_lr_multiplier, final_key,
        compute_dtype, accum_steps,
    )
    return _jit_with_mesh(step, mesh, n_runtime, P("data"), donate)


def make_epoch_step(
    model,
    optimizer: Optional[optax.GradientTransformation] = None,
    loss: str = "bce",
    lr: float = 5e-3,
    final_lr_multiplier: float = 10.0,
    final_key: str = "final",
    mesh: Optional[Mesh] = None,
    donate: bool = True,
    compute_dtype=None,
    accum_steps: Optional[int] = None,
) -> Callable:
    """One dispatch per EPOCH: ``inputs``/``labels`` carry a leading steps
    axis ``(S, B, ...)`` and the jitted function ``lax.scan``s the shared
    train-step body over it, returning per-step losses ``(S,)``.

    This removes per-step host dispatch latency entirely — on the tunneled
    axon TPU backend each dispatch costs milliseconds, which dominates
    small-model epochs.  Same optimizer / lr_scale semantics as
    :func:`make_train_step`:

        ``epoch(params, opt_state, inputs, labels[, lr_scale])
          -> (params, opt_state, losses)``

    Requires all steps to share one compiled shape (stack equal-size
    batches; use :func:`make_train_step` for ragged tails).
    """
    step, n_runtime = _make_step_body(
        model, optimizer, loss, lr, final_lr_multiplier, final_key,
        compute_dtype, accum_steps,
    )

    def epoch(params, opt_state, inputs, labels, *extra):
        def body(carry, batch):
            p, s = carry
            p, s, value = step(p, s, batch[0], batch[1], *extra)
            return (p, s), value

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), (inputs, labels)
        )
        return params, opt_state, losses

    # (steps, batch, ...) — the batch axis shards at position 1.
    return _jit_with_mesh(epoch, mesh, n_runtime, P(None, "data"), donate)


def make_eval_step(model, mesh: Optional[Mesh] = None) -> Callable:
    """Jitted forward: step(params, inputs) -> predictions."""
    apply_fn = _resolve_apply(model)

    if mesh is None:
        return jax.jit(apply_fn)
    batch_sh = NamedSharding(mesh, P("data"))
    repl_sh = NamedSharding(mesh, P())
    return jax.jit(apply_fn, in_shardings=(repl_sh, batch_sh), out_shardings=batch_sh)


def init_adam_state(params):
    """Optimizer state for the dynamic-LR step."""
    return optax.scale_by_adam().init(params)
