"""Host-to-device input prefetching.

The reference's loop moves each batch to the accelerator synchronously at
step time (experiments/ingredients/setup_model.py:149-152 ``prepare_batch``
device transfer).  On TPU the idiomatic shape is a *double-buffered* input
pipeline: while step ``i`` executes on device, batch ``i+1``'s host->device
copy is already in flight, so the HBM transfer rides under the compute
instead of on the critical path.

``prefetch_to_device`` wraps any (inputs, labels) iterable: a background
thread pulls batches, enqueues their ``jax.device_put`` (optionally with a
``Sharding`` so multi-chip batches land pre-sharded, skipping the
replicate-then-reshard XLA would otherwise insert), and hands them over a
bounded queue.  Order is preserved; iterator exceptions re-raise at the
consuming site.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, Optional

import jax

__all__ = ["prefetch_to_device"]

_SENTINEL = object()


def prefetch_to_device(
    iterable: Iterable,
    size: int = 2,
    sharding: Optional[object] = None,
) -> Iterator:
    """Iterate ``iterable``, moving each element (any pytree of numpy/JAX
    arrays) to device up to ``size`` elements ahead of the consumer.

    ``sharding``: optional ``jax.sharding.Sharding`` (e.g.
    ``NamedSharding(mesh, P("data"))``) applied to every array leaf —
    matches the batch sharding of ``training.loop.make_train_step(mesh=...)``.
    Scalars and non-array leaves pass through untouched.
    """
    if size < 1:
        raise ValueError(f"prefetch size must be >= 1, got {size}")
    buf: queue.Queue = queue.Queue(maxsize=size)
    # Set when the consumer abandons the generator (exception in the
    # training loop, early break): the producer must not stay blocked on a
    # full queue forever, pinning device-resident batches (a caught-and-
    # continued failure per hyperopt trial would otherwise leak a thread
    # plus ~size batches of HBM each time).
    stop = threading.Event()

    def put(tree):
        if sharding is None:
            return jax.device_put(tree)
        # The sharding applies per-leaf; leaves of lower rank than the
        # PartitionSpec (scalars alongside the batch arrays) cannot take it
        # and go to device unsharded instead of raising in the producer.
        spec_rank = len(getattr(sharding, "spec", ()))

        def put_leaf(leaf):
            if getattr(leaf, "ndim", 0) >= spec_rank:
                return jax.device_put(leaf, sharding)
            return jax.device_put(leaf)

        return jax.tree.map(put_leaf, tree)

    def enqueue(item) -> bool:
        while not stop.is_set():
            try:
                buf.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            for item in iterable:
                if not enqueue(put(item)):
                    return
        except BaseException as exc:  # re-raised by the consumer
            enqueue((_SENTINEL, exc))
            return
        enqueue((_SENTINEL, None))

    thread = threading.Thread(target=producer, daemon=True, name="prefetch")
    thread.start()

    try:
        while True:
            item = buf.get()
            if isinstance(item, tuple) and len(item) == 2 and item[0] is _SENTINEL:
                if item[1] is not None:
                    raise item[1]
                return
            yield item
    finally:
        # Runs on normal exhaustion AND on abandonment (GeneratorExit /
        # consumer exception): release the producer and drop buffered
        # device batches so HBM is reclaimed.
        stop.set()
        while True:
            try:
                buf.get_nowait()
            except queue.Empty:
                break
        thread.join(timeout=5.0)
