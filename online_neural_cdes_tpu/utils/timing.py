"""The sanctioned tunnel-RT-subtracted timing protocol, in one place.

On the axon-tunneled TPU every host sync pays a transport round-trip that
varies from ~2 ms to tens of seconds between sessions.  Two rules make
measurements comparable across bench.py and the experiment scripts (and
r5 measured WHY they matter: un-subtracted chains showed phantom
1.09-1.17x aggregate "wins" for variants that were actually flat —
DESIGN.md §instruction-level multi-replica interleaving):

1. **Chain with one closing sync.**  Run ``n`` dependent iterations and
   sync the host ONCE at the end, so the chain's elapsed time is
   ``n * step + one RT`` instead of ``n * (step + RT)``.
2. **Subtract that one RT explicitly**, using a fresh probe taken just
   before the chain, bounded at half the elapsed time so a spiking probe
   cannot halve the result.  The residual error is probe-to-sync RT
   jitter over ``n``.

``bench.py`` keeps its own deadline-aware chain loops (they interleave
budget checks) but delegates the probe here and states the same protocol;
the experiment scripts (interleave / pipeline / trainstep_ops) use these
helpers directly so a calibration change cannot silently diverge them.

NOTE: on the experimental axon backend ``block_until_ready`` does not
reliably block; a host transfer (``float()`` / ``np.asarray``) is the
only true sync — every ``run_chain`` must end in one.
"""

from __future__ import annotations

import time
from typing import Callable

import numpy as np

__all__ = ["tunnel_rt", "scaled_chain_len", "rt_subtracted_chain_s"]


def tunnel_rt() -> float:
    """One dispatch+sync round-trip of a trivial op, in seconds.  The
    first (warming) sync is excluded."""
    import jax.numpy as jnp

    x = jnp.ones((8, 8))
    float((x @ x).sum())  # warm the terminal + compile
    t0 = time.perf_counter()
    float((x @ x).sum())
    return time.perf_counter() - t0


def scaled_chain_len(n: int, cap: int, per_iter_ms_hint: float = 1.0) -> int:
    """Grow the chain length with the measured RT so the one subtracted
    round-trip stays small relative to the chain (share-before-correction
    <= ~1 ms-equivalent per iteration), capped to bound compute on a
    congested tunnel.  ``per_iter_ms_hint`` is the expected per-iteration
    cost: heavier steps need proportionally shorter chains for the same
    RT-to-chain ratio."""
    return min(max(n, int(tunnel_rt() * 1000.0 / max(per_iter_ms_hint, 1e-9))),
               cap)


def rt_subtracted_chain_s(run_chain: Callable[[int], None], n: int,
                          chains: int = 3) -> float:
    """Median per-iteration seconds over ``chains`` repetitions of the
    protocol: probe RT, run ``run_chain(n)`` (n dependent iterations,
    ONE closing host sync), subtract ``min(rt, elapsed/2)``, divide by n.

    ``run_chain`` must be warmed (compiled + one synced call) before this
    is invoked, so compile time never lands in a chain."""
    times = []
    for _ in range(chains):
        rt = tunnel_rt()
        t0 = time.perf_counter()
        run_chain(n)
        elapsed = time.perf_counter() - t0
        times.append((elapsed - min(rt, 0.5 * elapsed)) / n)
    return float(np.median(times))
