"""Sweep orchestration: expand a config suite, dedup against the ledger,
run every remaining experiment.

Replaces the reference's GNU-parallel + MongoDB orchestration
(experiments/runs.py:23-101): one process per GPU there becomes either a
sequential loop on one TPU (each training step already saturates the chip
with batch 1024) or config-parallelism across hosts by sharding the config
list (``shard_index``/``num_shards`` — each host runs its slice against a
shared-filesystem ledger, the same coordination contract MongoDB gave the
reference).  Crash recovery: completed configs are skipped, half-finished
ones purged (runs.py:45-57).
"""

from __future__ import annotations

import logging
from typing import Optional

from online_neural_cdes_tpu.training.config import parse_configuration_json
from online_neural_cdes_tpu.training.experiment import run_experiment
from online_neural_cdes_tpu.training.ledger import Ledger

__all__ = ["run"]

logger = logging.getLogger(__name__)


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
) -> list:
    """Run a configuration suite (reference runs.run, runs.py:23-73)."""
    from online_neural_cdes_tpu.training.config import DEFAULT_CONFIG_DIR

    ledger = Ledger(ledger_path)
    configs, db_name = parse_configuration_json(
        run_name,
        config_dir=config_dir or DEFAULT_CONFIG_DIR,
        test_mode=test_mode,
        ledger=ledger,
    )
    ledger.purge_incomplete_runs(run_name=db_name)

    if configs and configs[0].get("hyperparameters") == "hyperopt":
        from online_neural_cdes_tpu.training.hyperopt import run_hyperopt

        runner = lambda cfg: run_hyperopt(cfg, data_root=data_root, mesh=mesh,
                                          ledger=ledger, run_name=db_name,
                                          verbose=verbose)
    else:
        runner = lambda cfg: run_experiment(cfg, data_root=data_root, mesh=mesh,
                                            verbose=verbose)

    completed = []
    for i, cfg in enumerate(configs):
        if i % num_shards != shard_index:
            continue
        if ledger.check_if_run(cfg, run_name=db_name):
            logger.info("skipping completed config %d/%d", i + 1, len(configs))
            continue
        logger.info("running config %d/%d", i + 1, len(configs))
        ledger.mark_running(cfg, run_name=db_name)
        results = runner(cfg)
        info = {}
        if "best_parameters" in results:
            info["best_parameters"] = results.pop("best_parameters")
        ledger.save_result(cfg, results, run_name=db_name, info=info)
        completed.append((cfg, results))
    return completed
