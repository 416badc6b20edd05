"""Seed-parallel ensemble training: the reference's config/seed sweeps
(one training process per GPU coordinated by GNU parallel + MongoDB,
reference experiments/runs.py:64-73) become a single SPMD program — the
seed axis is ``vmap``-ed over the training step and *sharded across the
mesh*, so N seeds train simultaneously, one per slice of chips, with zero
orchestration machinery.

This composes with data parallelism: on an (ensemble, data) 2-D mesh each
seed's batch additionally shards over the data axis.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_ensemble_mesh", "init_ensemble", "make_ensemble_step", "EnsembleState"]

ENSEMBLE_AXIS = "ensemble"
DATA_AXIS = "data"


def make_ensemble_mesh(n_ensemble: int, n_data: int = 1, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    need = n_ensemble * n_data
    if len(devices) < need:
        raise ValueError(f"Need {need} devices, have {len(devices)}")
    grid = np.asarray(devices[:need]).reshape(n_ensemble, n_data)
    return Mesh(grid, (ENSEMBLE_AXIS, DATA_AXIS))


def init_ensemble(model, n_seeds: int, base_key=None, mesh: Optional[Mesh] = None):
    """Stacked params/opt-state for n_seeds models, seed axis sharded over
    the ensemble mesh axis when a mesh is given."""
    import optax

    base_key = base_key if base_key is not None else jax.random.PRNGKey(0)
    keys = jax.random.split(base_key, n_seeds)
    params = jax.vmap(model.init)(keys)
    opt_state = jax.vmap(optax.scale_by_adam().init)(params)
    if mesh is not None:
        sh = NamedSharding(mesh, P(ENSEMBLE_AXIS))
        params = jax.tree.map(lambda x: jax.device_put(x, sh), params)
        opt_state = jax.tree.map(lambda x: jax.device_put(x, sh), opt_state)
    return params, opt_state


def make_ensemble_step(
    model,
    loss: str = "bce",
    lr: float = 5e-3,
    final_lr_multiplier: float = 10.0,
    mesh: Optional[Mesh] = None,
) -> Callable:
    """step(stacked_params, stacked_opt_state, inputs, labels, lr_scale):
    trains every seed on the same batch concurrently.  With a mesh, the
    seed axis of params/opt-state shards over 'ensemble' and the batch
    shards over 'data' (replicated across seeds)."""
    from online_neural_cdes_tpu.training.loop import make_train_step

    base_step = make_train_step(
        model, loss=loss, lr=lr, final_lr_multiplier=final_lr_multiplier,
        donate=False,
    )
    vstep = jax.vmap(base_step, in_axes=(0, 0, None, None, None))

    if mesh is None:
        return jax.jit(vstep)

    seed_sh = NamedSharding(mesh, P(ENSEMBLE_AXIS))
    # Batches carry no seed axis: leading (batch) axis shards over data and
    # is replicated across the ensemble axis.
    data_sh = NamedSharding(mesh, P(DATA_AXIS))
    repl = NamedSharding(mesh, P())
    return jax.jit(
        vstep,
        in_shardings=(seed_sh, seed_sh, data_sh, data_sh, repl),
        out_shardings=(seed_sh, seed_sh, seed_sh),
    )


class EnsembleState:
    """Convenience holder mirroring the sweep's per-seed bookkeeping."""

    def __init__(self, model, n_seeds, mesh=None, key=None):
        self.model = model
        self.mesh = mesh
        self.params, self.opt_state = init_ensemble(model, n_seeds, key, mesh)
