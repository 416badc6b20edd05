"""Jitted, mesh-sharded training steps.

The reference's training loop is pytorch-ignite driving per-batch H2D
copies and a Python epoch loop (experiments/ingredients/trainer.py:311-345,
447-469).  Here the unit is a pure jitted ``train_step`` — params
replicated, batch sharded over the mesh's data axis, gradient psum inserted
by XLA from the shardings (SURVEY.md §2.7's TPU-native equivalent).

Optimizer parity: Adam with a 10x learning rate on the final linear layer
(reference trainer.py:272-302), via optax.multi_transform over param labels.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from online_neural_cdes_tpu.training.metrics import make_loss, masked_temporal_loss

__all__ = ["make_optimizer", "make_train_step", "TrainState"]


def make_optimizer(lr: float = 5e-3, final_lr_multiplier: float = 10.0,
                   final_key: str = "final") -> optax.GradientTransformation:
    """Adam with a boosted learning rate on the readout layer
    (reference trainer.py:272-302,305-308; default lr 5e-3)."""

    def label_fn(params):
        return {k: ("final" if k == final_key else "rest") for k in params}

    return optax.multi_transform(
        {"rest": optax.adam(lr), "final": optax.adam(lr * final_lr_multiplier)},
        label_fn,
    )


def make_train_step(
    model,
    optimizer: optax.GradientTransformation,
    loss: str = "bce",
    mesh: Optional[Mesh] = None,
    donate: bool = True,
) -> Callable:
    """Returns jitted ``step(params, opt_state, batch) -> (params, opt_state,
    loss)`` where batch = (inputs, labels) and inputs is the coeff array or
    a (static, coeffs) tuple.  NaN labels are masked (online tasks end at
    different times — reference TemporalLossWrapper)."""
    pointwise = make_loss(loss)
    sqrt = loss == "rmse"

    def loss_fn(params, inputs, labels):
        preds = model.apply(params, inputs)
        return masked_temporal_loss(pointwise, preds, labels, sqrt=sqrt)

    def step(params, opt_state, inputs, labels):
        value, grads = jax.value_and_grad(loss_fn)(params, inputs, labels)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, value

    if mesh is None:
        return jax.jit(step, donate_argnums=(0, 1) if donate else ())

    batch_sh = NamedSharding(mesh, P("data"))
    repl_sh = NamedSharding(mesh, P())

    def batch_shardings(inputs_example):
        return jax.tree.map(lambda _: batch_sh, inputs_example)

    # Shardings: params/opt_state replicated, batch split on its leading
    # axis.  XLA turns the gradient sum into a psum over ICI.
    return jax.jit(
        step,
        in_shardings=(repl_sh, repl_sh, batch_sh, batch_sh),
        out_shardings=(repl_sh, repl_sh, repl_sh),
        donate_argnums=(0, 1) if donate else (),
    )


class TrainState:
    """Tiny mutable holder for (params, opt_state) host-side bookkeeping."""

    def __init__(self, model, optimizer, key, dtype=jnp.float32):
        self.model = model
        self.optimizer = optimizer
        self.params = model.init(key, dtype)
        self.opt_state = optimizer.init(self.params)

    def apply_step(self, step_fn, inputs, labels):
        self.params, self.opt_state, loss = step_fn(
            self.params, self.opt_state, inputs, labels
        )
        return loss
