"""Result analysis: ledger -> seed-averaged tables.

Capability parity with reference experiments/analyse.py:73-321: pull runs,
unify the per-dataset evaluation metric, average over seeds as mean+-std,
and emit model-ranking / interpolation / NFE-per-epoch tables as
DataFrames (CSV/LaTeX) — sourced from the local ledger instead of MongoDB.
"""

from __future__ import annotations

from typing import Optional

import pandas as pd

from online_neural_cdes_tpu.training.ledger import Ledger

__all__ = ["runs_frame", "seed_averaged", "metric_table", "nfe_table"]


def runs_frame(ledger: Ledger, run_name: Optional[str] = None) -> pd.DataFrame:
    """Flatten completed ledger entries into a DataFrame, one row per run."""
    rows = []
    for entry in ledger.query(
        lambda e: e.get("status") == "completed"
        and (run_name is None or e.get("run_name") == run_name)
    ):
        cfg = entry["config"]
        res = entry.get("results", {})
        row = {
            "dataset_name": cfg.get("dataset_name"),
            "model": cfg.get("model", {}).get("model_string"),
            "interpolation": cfg.get("dataset", {}).get("interpolation"),
            "adjoint": cfg.get("model", {}).get("adjoint"),
            "seed": cfg.get("seed"),
            "eval_metric": cfg.get("dataset", {}).get("evaluation_metric"),
        }
        for k, v in res.items():
            if isinstance(v, (int, float)) or v is None:
                row[k] = v
        # The unified headline number: the dataset's own eval metric on test
        # (reference analyse.py:73-86).
        metric = row["eval_metric"]
        row["test_metric"] = res.get(f"test.{metric}")
        rows.append(row)
    return pd.DataFrame(rows)


def _mean_std(series: pd.Series) -> str:
    vals = series.dropna().astype(float)
    if len(vals) == 0:
        return "-"
    return f"{vals.mean():.3f} +/- {vals.std(ddof=0):.3f}"


def seed_averaged(frame: pd.DataFrame, value: str = "test_metric",
                  index=("model",), columns=("dataset_name",)) -> pd.DataFrame:
    """Seed-averaged mean+-std pivot (reference analyse.py:98-205)."""
    if frame.empty or value not in frame.columns:
        return pd.DataFrame()
    return pd.pivot_table(
        frame, values=value, index=list(index), columns=list(columns),
        aggfunc=_mean_std,
    )


def metric_table(ledger: Ledger, run_name: Optional[str] = None,
                 index=("model",), columns=("dataset_name",),
                 latex: bool = False):
    frame = runs_frame(ledger, run_name)
    table = seed_averaged(frame, "test_metric", index, columns)
    return table.to_latex() if latex else table


def nfe_table(ledger: Ledger, run_name: Optional[str] = None,
              latex: bool = False):
    """NFE-per-epoch comparison across interpolation schemes
    (reference analyse.py:279-299)."""
    frame = runs_frame(ledger, run_name)
    table = seed_averaged(
        frame, "nfe_per_epoch", index=("interpolation",), columns=("dataset_name",)
    )
    return table.to_latex() if latex else table
