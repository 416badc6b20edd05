"""Checkpoint/resume for parameter + optimiser pytrees.

The reference checkpoints only transiently: ignite's best-by-metric
``state_dict`` into a TemporaryDirectory that is deleted after test eval
(reference experiments/ingredients/trainer.py:437-443,211) — resume exists
only at sweep granularity.  Here checkpoints persist: orbax (the TPU
ecosystem standard) when importable, otherwise a self-contained
npz-of-leaves format; both round-trip arbitrary pytrees of arrays.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np

__all__ = ["save_checkpoint", "load_checkpoint"]


def _try_orbax():
    try:
        import orbax.checkpoint as ocp

        return ocp
    except Exception:
        return None


def save_checkpoint(path: str, state: Any, *, use_orbax: Optional[bool] = None) -> str:
    """Persist a pytree.  ``path`` is a directory (orbax) or gets ``.npz``
    appended (fallback)."""
    ocp = _try_orbax() if use_orbax in (None, True) else None
    if use_orbax is True and ocp is None:
        # An explicit orbax request must not silently write a different
        # format the caller's restore path will not find.
        raise RuntimeError("use_orbax=True but orbax.checkpoint is not importable")
    if ocp is not None and use_orbax is not False:
        path = os.path.abspath(path)
        checkpointer = ocp.StandardCheckpointer()
        checkpointer.save(path, state, force=True)
        checkpointer.wait_until_finished()
        return path

    leaves, treedef = jax.tree_util.tree_flatten(state)
    file_path = path if path.endswith(".npz") else path + ".npz"
    os.makedirs(os.path.dirname(os.path.abspath(file_path)), exist_ok=True)

    def to_numpy(leaf):
        arr = np.asarray(leaf)
        if arr.dtype.kind not in "biufc":
            # Extension float dtypes (bfloat16 etc.) np.savez as opaque
            # void records that cannot be restored; upcast losslessly to
            # f32 — load_checkpoint casts back to `like`'s dtype.
            arr = np.asarray(jax.numpy.asarray(leaf, jax.numpy.float32))
        return arr

    np.savez(
        file_path,
        __treedef__=np.frombuffer(str(treedef).encode(), dtype=np.uint8),
        **{f"leaf_{i}": to_numpy(l) for i, l in enumerate(leaves)},
    )
    return file_path


def load_checkpoint(path: str, like: Any) -> Any:
    """Restore a pytree with the structure/dtypes of ``like``."""
    ocp = _try_orbax()
    if os.path.isdir(path) and ocp is not None:
        checkpointer = ocp.StandardCheckpointer()
        return checkpointer.restore(os.path.abspath(path), like)

    file_path = path if path.endswith(".npz") else path + ".npz"
    npz = np.load(file_path, allow_pickle=False)
    leaves_like, treedef = jax.tree_util.tree_flatten(like)
    if "__treedef__" in npz.files:
        saved = bytes(np.asarray(npz["__treedef__"])).decode()
        if saved != str(treedef):
            raise ValueError(
                "Checkpoint pytree structure does not match `like`: restoring "
                "by leaf index would silently reassign arrays to the wrong "
                f"fields.\n  saved: {saved}\n  like:  {treedef}"
            )
    leaves = [
        np.asarray(npz[f"leaf_{i}"]).astype(np.asarray(l).dtype)
        for i, l in enumerate(leaves_like)
    ]
    return jax.tree_util.tree_unflatten(treedef, leaves)
