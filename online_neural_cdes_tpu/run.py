"""Command-line sweep runner.

The analogue of reference experiments/runs.py's ``__main__`` (runs.py:76-101)
without GNU parallel or MongoDB: suites run re-entrantly against the local
ledger; shard the config list across hosts with --shard/--num-shards.

    python -m online_neural_cdes_tpu.run toy --test-mode
    python -m online_neural_cdes_tpu.run medical-sota --data-root data/processed
    python -m online_neural_cdes_tpu.run medical-sota --analyse --tables-out results/tables
"""

from __future__ import annotations

import argparse
import logging


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("run_name", help="suite name from configurations.json5")
    ap.add_argument("--data-root", default="data/processed")
    ap.add_argument("--ledger", default="results/ledger.jsonl")
    ap.add_argument("--config-dir", default=None)
    ap.add_argument("--test-mode", action="store_true")
    ap.add_argument("--shard", type=int, default=0)
    ap.add_argument("--num-shards", type=int, default=1)
    ap.add_argument("--data-parallel", type=int, default=0, metavar="N",
                    help="train each config over an N-device data-parallel "
                         "mesh (params replicated, batches sharded, psum "
                         "over ICI); 0 = single device")
    ap.add_argument("--analyse", action="store_true",
                    help="print seed-averaged tables instead of running")
    ap.add_argument("--tables-out", default=None, metavar="DIR",
                    help="with --analyse: also write the full reference "
                         "table set (sparsity/gating/medical-sota/"
                         "interpolation .tex) under DIR")
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args(argv)

    logging.basicConfig(level=logging.INFO)

    if args.analyse:
        from online_neural_cdes_tpu.training.analyse import metric_table, nfe_table
        from online_neural_cdes_tpu.training.ledger import Ledger

        # Test-mode sweeps are recorded under the prefixed run name
        # (config.py: run_name = f"test_{run_name}") — match it here too.
        name = f"test_{args.run_name}" if args.test_mode else args.run_name
        ledger = Ledger(args.ledger)
        print(metric_table(ledger, name))
        print(nfe_table(ledger, name))
        if args.tables_out:
            from online_neural_cdes_tpu.training.analyse import (
                write_analysis_tables,
            )

            for path in write_analysis_tables(ledger, args.tables_out, name):
                print(f"wrote {path}")
        return

    from online_neural_cdes_tpu.training.sweep import run

    mesh = None
    if args.data_parallel > 0:
        from online_neural_cdes_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(args.data_parallel)

    completed = run(
        args.run_name,
        ledger_path=args.ledger,
        data_root=args.data_root,
        config_dir=args.config_dir,
        test_mode=args.test_mode,
        shard_index=args.shard,
        num_shards=args.num_shards,
        mesh=mesh,
        verbose=args.verbose,
    )
    print(f"completed {len(completed)} configs")


if __name__ == "__main__":
    main()
