"""Hyperparameter optimisation over dunder-encoded parameter spaces.

Capability parity with reference experiments/hyperoptimize.py:36-126: a
budgeted search (default 20 trials, configurations.json5:20) over spaces
like ``{"name": "model__hidden_dim", "type": "range", "bounds": [32, 256]}``
with optional ``log_scale``, objective = validation metric, failed trials
scored with a sentinel so the search continues (hyperoptimize.py:65-78),
and ``best_parameters`` stored for later injection into sweeps.

The reference drives Facebook Ax (Bayesian); that service-grade dependency
is replaced by scrambled-Sobol quasi-random search (scipy.stats.qmc) —
equally budget-bounded, fully deterministic under the config seed, with
provably lower star discrepancy than uniform sampling at the reference's
20-trial budget, and no external service.  The trial loop and result
contract are identical, so Ax could be slotted back in behind
``sobol_parameterizations``.
"""

from __future__ import annotations

import logging
import math
from typing import List, Optional

import numpy as np

from online_neural_cdes_tpu.training.experiment import run_experiment

__all__ = ["run_hyperopt", "sample_parameterization", "sobol_parameterizations",
           "decode_dunder"]

logger = logging.getLogger(__name__)
FAILURE_SENTINEL = 1000.0


def _decode_unit(param: dict, u: float):
    """Map a unit-interval draw onto one Ax-style parameter."""
    if param["type"] == "choice":
        values = param["values"]
        return values[min(int(u * len(values)), len(values) - 1)]
    if param["type"] == "range":
        lo, hi = param["bounds"]
        if param.get("log_scale"):
            return float(np.exp(np.log(lo) + u * (np.log(hi) - np.log(lo))))
        val = lo + u * (hi - lo)
        if isinstance(lo, int) and isinstance(hi, int):
            return int(np.clip(round(val), lo, hi))
        return float(val)
    if param["type"] == "fixed":
        return param["value"]
    raise ValueError(f"Unknown parameter type {param['type']}")


def sobol_parameterizations(space: List[dict], n: int, seed: int = 0) -> List[dict]:
    """``n`` scrambled-Sobol points over an Ax-style space, deterministic
    under ``seed``.  Low-discrepancy: every 1-D projection of a 2^k-point
    draw lands exactly one point in each of the 2^k dyadic bins."""
    from scipy.stats import qmc

    dims = [p for p in space if p["type"] != "fixed"]
    fixed = [p for p in space if p["type"] == "fixed"]
    if dims:
        sampler = qmc.Sobol(d=len(dims), scramble=True, seed=seed)
        unit = sampler.random(n)
    else:
        unit = np.zeros((n, 0))
    points = []
    for row in unit:
        point = {p["name"]: _decode_unit(p, u) for p, u in zip(dims, row)}
        point.update({p["name"]: p["value"] for p in fixed})
        points.append(point)
    return points


def sample_parameterization(space: List[dict], rng: np.random.Generator) -> dict:
    """One uniform draw from an Ax-style space (kept for ad-hoc sampling;
    the search itself uses :func:`sobol_parameterizations`)."""
    return {p["name"]: _decode_unit(p, float(rng.uniform())) for p in space}


def decode_dunder(parameterization: dict) -> dict:
    """model__hidden_dim=64 -> {"model": {"hidden_dim": 64}}
    (reference hyperoptimize.py:103-126)."""
    out: dict = {}
    for key, value in parameterization.items():
        node = out
        parts = key.split("__")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value
    return out


def run_hyperopt(
    config: dict,
    data_root: str = "data/processed",
    mesh=None,
    ledger=None,
    run_name: Optional[str] = None,
    verbose: bool = False,
) -> dict:
    """Budgeted search; returns the best trial's results plus
    ``best_parameters`` (stored by the sweep into the ledger for later
    ``update_hyperparams`` injection)."""
    space = config["parameterization"]
    total_trials = int(config.get("total_trials", 20))
    metric = config.get("evaluation_metric", "loss")
    minimize = bool(config.get("minimize", metric == "loss"))
    sign = 1.0 if minimize else -1.0
    points = sobol_parameterizations(space, total_trials,
                                     seed=int(config.get("seed", 0)))

    best = (math.inf, None, None)
    for trial, point in enumerate(points):
        trial_cfg = {k: v for k, v in config.items()
                     if k not in ("parameterization", "total_trials")}
        trial_cfg = _merge(trial_cfg, decode_dunder(point))
        try:
            results = run_experiment(trial_cfg, data_root=data_root, mesh=mesh,
                                     verbose=verbose)
            score = sign * results[f"val.{metric}"]
        except Exception as exc:  # failed trial -> sentinel, keep searching
            logger.warning("hyperopt trial %d failed: %s", trial, exc)
            results = {"error": str(exc)}
            score = FAILURE_SENTINEL
        logger.info("trial %d/%d: %s -> score %.5f", trial + 1, total_trials,
                    point, score)
        if score < best[0]:
            best = (score, point, results)

    score, point, results = best
    results = dict(results or {})
    results["best_parameters"] = decode_dunder(point) if point else {}
    results["best_score"] = score
    return results


def _merge(config: dict, update: dict) -> dict:
    import copy

    out = copy.deepcopy(config)
    for key, value in update.items():
        if isinstance(value, dict) and isinstance(out.get(key), dict):
            out[key] = _merge(out[key], value)
        else:
            out[key] = value
    return out
