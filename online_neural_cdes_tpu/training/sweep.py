"""Sweep orchestration: expand a config suite, dedup against the ledger,
run every remaining experiment.

Replaces the reference's GNU-parallel + MongoDB orchestration
(experiments/runs.py:23-101).  One process per GPU there becomes, on TPU:

- **Co-scheduled waves** (default): same-shape config groups — the
  canonical case is the reference's 3-seeds-per-final-config protocol
  (reference configurations.json5 seed lists) — train as ONE vmapped SPMD
  program (training/wave.py) instead of serially.  What this buys,
  measured (RESULTS.md r5): K× fewer host dispatches and scheduler
  round-trips — a real win for small/medium programs (wave.py's ≥2×
  hyperopt measurements) — but NOT extra MXU utilisation at the flagship
  shape, where the r5 concurrency_grid found aggregate throughput FLAT to
  K=4 (per-replica weights make the vmapped stage K independent small
  matmuls), hence the ``max_wave_size=4`` cap.  Ledger semantics are
  preserved: every group member is marked running before the wave and
  saved individually after it, so dedup/resume behave exactly as the
  serial path.
- **Config-parallelism across hosts** by sharding the config list
  (``shard_index``/``num_shards`` — each host runs its slice against a
  shared-filesystem ledger, the same coordination contract MongoDB gave
  the reference).
- **Crash isolation + per-config watchdog** (``isolate`` /
  ``config_timeout_s``): the reference's process-per-GPU model contained
  crashes for free (runs.py:64-73); here one hung config (e.g. a tunnel
  stall inside a jit) would otherwise block the whole suite, since a hung
  XLA execute cannot be interrupted from Python.  Isolation runs each
  unit in a spawned subprocess with an optional wall-clock budget; a
  crash/timeout records a ``failed`` ledger sentinel and the sweep moves
  on.  ``purge_incomplete_runs`` + completed-only dedup make failed
  configs retryable on the next sweep invocation, exactly like the
  reference's purge of half-finished Mongo runs (runs.py:45-57).
"""

from __future__ import annotations

import json
import logging
import os
import tempfile
from typing import List, Optional

from online_neural_cdes_tpu.training.config import parse_configuration_json
from online_neural_cdes_tpu.training.experiment import run_experiment
from online_neural_cdes_tpu.training.ledger import Ledger

__all__ = ["run"]

logger = logging.getLogger(__name__)


def _subprocess_worker(payload_path: str, result_path: str):
    """Child entry for isolation mode: run one unit (a single experiment, a
    wave group, or one hyperopt search) and write the per-config results
    list as JSON.  Runs in a SPAWNED interpreter, so a segfault/OOM/hang
    dies here, not in the sweep.  Exceptions propagate as a nonzero exit
    code; the parent records the failure sentinel."""
    with open(payload_path) as fh:
        payload = json.load(fh)
    # Pin the parent's platform/compile-cache before any backend use: the
    # TPU image's sitecustomize force-sets jax_platforms at interpreter
    # start (env vars are ignored), so a spawned child would otherwise grab
    # the device regardless of what the parent runs on — a CPU-meshed test
    # sweep must not ride the TPU tunnel from its children.
    import jax

    if payload.get("platform"):
        jax.config.update("jax_platforms", payload["platform"])
    if payload.get("compile_cache"):
        jax.config.update("jax_compilation_cache_dir", payload["compile_cache"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.02)
    if payload.get("enable_x64"):
        jax.config.update("jax_enable_x64", True)
    cfgs = payload["cfgs"]
    data_root = payload["data_root"]
    verbose = payload["verbose"]
    if payload["kind"] == "wave":
        from online_neural_cdes_tpu.training.wave import run_trials_vmapped

        results = run_trials_vmapped(cfgs, data_root=data_root, verbose=verbose)
    elif payload["kind"] == "hyperopt":
        from online_neural_cdes_tpu.training.hyperopt import run_hyperopt

        results = [run_hyperopt(
            cfgs[0], data_root=data_root, verbose=verbose,
            ledger=Ledger(payload["ledger_path"]),
            run_name=payload["run_db_name"],
        )]
    else:
        results = [run_experiment(cfgs[0], data_root=data_root, verbose=verbose)]
    tmp = result_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump([_jsonable_results(r) for r in results], fh)
    os.replace(tmp, result_path)


def _jsonable_results(results: dict) -> dict:
    """Results crossing the isolation process boundary: drop in-memory
    parameter pytrees (the ledger drops ``best_params`` anyway — persistent
    weights are ``trainer.checkpoint_dir``'s job) and convert numpy scalars
    to plain Python so the parent reads back real numbers, not ``str()``
    reprs."""
    import numpy as np

    def conv(v):
        if hasattr(v, "dtype") and hasattr(v, "shape"):  # numpy/jax array
            a = np.asarray(v)
            return a.item() if a.ndim == 0 else a.tolist()
        if isinstance(v, dict):
            return {k: conv(x) for k, x in v.items()}
        if isinstance(v, (list, tuple)):
            return [conv(x) for x in v]
        return v

    return conv({k: v for k, v in results.items()
                 if k not in ("best_params",)})


def _run_isolated(kind: str, cfgs: List[dict], data_root: str, verbose: bool,
                  timeout_s: Optional[float], **extra) -> List[dict]:
    """Execute one unit in a spawned subprocess with a wall-clock budget.
    Raises TimeoutError on budget exhaustion (child killed) and
    RuntimeError on a crashed child — the caller converts either into a
    ledger failure sentinel and continues the suite."""
    import multiprocessing as mp

    import jax

    with tempfile.TemporaryDirectory(prefix="oncde_sweep_") as tmpdir:
        payload_path = os.path.join(tmpdir, "payload.json")
        result_path = os.path.join(tmpdir, "results.json")
        with open(payload_path, "w") as fh:
            json.dump(
                {"kind": kind, "cfgs": cfgs, "data_root": data_root,
                 "verbose": verbose,
                 "platform": jax.config.jax_platforms,
                 "compile_cache": jax.config.jax_compilation_cache_dir,
                 "enable_x64": bool(jax.config.jax_enable_x64),
                 **extra},
                fh, default=str,
            )
        # spawn, not fork: the parent holds an initialised JAX runtime and
        # forking it is a documented deadlock; the child re-initialises its
        # own backend from scratch.
        ctx = mp.get_context("spawn")
        proc = ctx.Process(
            target=_subprocess_worker, args=(payload_path, result_path)
        )
        proc.start()
        proc.join(timeout_s)
        if proc.is_alive():
            proc.terminate()
            proc.join(5.0)
            if proc.is_alive():
                proc.kill()
                proc.join()
            raise TimeoutError(
                f"config unit exceeded config_timeout_s={timeout_s}"
            )
        if proc.exitcode != 0 or not os.path.exists(result_path):
            raise RuntimeError(
                f"config unit subprocess died (exit code {proc.exitcode})"
            )
        with open(result_path) as fh:
            return json.load(fh)


def run(
    run_name: str,
    ledger_path: str = "results/ledger.jsonl",
    data_root: str = "data/processed",
    config_dir: Optional[str] = None,
    test_mode: bool = False,
    shard_index: int = 0,
    num_shards: int = 1,
    mesh=None,
    verbose: bool = False,
    co_schedule: bool = True,
    isolate: bool = False,
    config_timeout_s: Optional[float] = None,
    max_wave_size: int = 4,
) -> list:
    """Run a configuration suite (reference runs.run, runs.py:23-73).

    ``co_schedule``: co-train same-shape config groups (identical except
    ``seed``/waveable trainer scalars, wave.config_wave_groups) as one
    vmapped program.  ``max_wave_size`` caps each co-scheduled group:
    the r5 concurrency_grid measured flagship-shape aggregate throughput
    FLAT to K=4 and 0.70x at K=8 (per-replica weights make the vmapped
    stage K independent small matmuls — RESULTS.md r5 record), so larger
    groups chunk into waves of at most this size.  ``isolate``/
    ``config_timeout_s``: subprocess crash isolation + per-unit
    wall-clock watchdog (``config_timeout_s`` implies ``isolate``);
    incompatible with an in-process ``mesh`` (the mesh cannot cross the
    process boundary — shard across hosts instead).  Isolated results
    come back as plain JSON numbers and omit the in-memory
    ``best_params`` pytree — persist weights with
    ``trainer.checkpoint_dir``.  A ``mesh`` runs each config serially
    over it (the vmapped wave path is single-device).
    """
    from online_neural_cdes_tpu.training.config import DEFAULT_CONFIG_DIR

    if config_timeout_s is not None:
        isolate = True
    if isolate and mesh is not None:
        raise ValueError(
            "isolate/config_timeout_s runs configs in subprocesses, which "
            "cannot share an in-process mesh; use num_shards for multi-host "
            "parallelism or drop isolation"
        )

    ledger = Ledger(ledger_path)
    configs, db_name = parse_configuration_json(
        run_name,
        config_dir=config_dir or DEFAULT_CONFIG_DIR,
        test_mode=test_mode,
        ledger=ledger,
    )
    ledger.purge_incomplete_runs(run_name=db_name)

    hyperopt_suite = bool(
        configs and configs[0].get("hyperparameters") == "hyperopt"
    )
    if hyperopt_suite:
        from online_neural_cdes_tpu.training.hyperopt import run_hyperopt

        runner = lambda cfg: run_hyperopt(cfg, data_root=data_root, mesh=mesh,
                                          ledger=ledger, run_name=db_name,
                                          verbose=verbose)
    else:
        runner = lambda cfg: run_experiment(cfg, data_root=data_root, mesh=mesh,
                                            verbose=verbose)

    # This host's still-to-run slice, in suite order.
    todo: List[int] = []
    for i, cfg in enumerate(configs):
        if i % num_shards != shard_index:
            continue
        if ledger.check_if_run(cfg, run_name=db_name):
            logger.info("skipping completed config %d/%d", i + 1, len(configs))
            continue
        todo.append(i)

    # Units of execution: wave groups (>=2 co-trainable configs) or
    # singletons.  Hyperopt suites keep their own internal wave machinery
    # (training/hyperopt.py) — each hyperopt config is a whole search, not
    # a trainable trial, so it always runs as a singleton here.
    if mesh is not None and co_schedule:
        # The vmapped wave path trains single-device; silently dropping the
        # caller's mesh would shed the data-parallel sharding (and its
        # memory headroom) for every grouped config.  Mesh suites run each
        # config serially over the mesh instead — the measured co-residency
        # verdict (RESULTS.md r5 concurrency_grid: flat at flagship shape)
        # means this forfeits nothing at the shapes a mesh is for.
        logger.info("mesh given: running configs serially over the mesh "
                    "(co-scheduled waves are single-device)")
        co_schedule = False
    if co_schedule and not hyperopt_suite and len(todo) > 1:
        from online_neural_cdes_tpu.training.wave import config_wave_groups

        cap = max(1, int(max_wave_size))
        groups = [
            [todo[j] for j in g[k:k + cap]]
            for g in config_wave_groups([configs[i] for i in todo])
            for k in range(0, len(g), cap)
        ]
    else:
        groups = [[i] for i in todo]

    def _record_failure(idxs, exc):
        for i in idxs:
            logger.error("config %d/%d failed: %s", i + 1, len(configs), exc)
            ledger.mark_failed(configs[i], run_name=db_name, error=str(exc))

    completed = []
    for idxs in groups:
        group_cfgs = [configs[i] for i in idxs]
        for i in idxs:
            ledger.mark_running(configs[i], run_name=db_name)
        if len(idxs) > 1:
            kind = "wave"
            logger.info(
                "co-scheduling %d same-shape configs as one vmapped wave: %s",
                len(idxs), [i + 1 for i in idxs],
            )
        else:
            kind = "hyperopt" if hyperopt_suite else "single"
        try:
            if isolate:
                results_list = _run_isolated(
                    kind, group_cfgs, data_root, verbose, config_timeout_s,
                    ledger_path=ledger_path, run_db_name=db_name,
                )
            elif kind == "wave":
                from online_neural_cdes_tpu.training.wave import run_trials_vmapped

                results_list = run_trials_vmapped(
                    group_cfgs, data_root=data_root, verbose=verbose
                )
            else:
                logger.info("running config %d/%d", idxs[0] + 1, len(configs))
                results_list = [runner(group_cfgs[0])]
        except (TimeoutError, RuntimeError) as exc:
            if isolate:
                _record_failure(idxs, exc)
                continue
            raise
        except ValueError:
            if kind != "wave":
                raise
            # Defensive fallback: config_wave_groups should only emit
            # wave-compatible groups; if the wave contract still rejects
            # one, run its members sequentially rather than fail the suite.
            logger.warning("wave group rejected; running members serially")
            results_list = [runner(cfg) for cfg in group_cfgs]

        for cfg, results in zip(group_cfgs, results_list):
            info = {}
            if "best_parameters" in results:
                info["best_parameters"] = results.pop("best_parameters")
            ledger.save_result(cfg, results, run_name=db_name, info=info)
            completed.append((cfg, results))
    return completed
