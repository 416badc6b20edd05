"""Compact parser for the sktime/UEA ``.ts`` time-series file format.

Replaces the reference's vendored 730-line sktime loader
(/root/reference/get_data/download/tsr.py:55-730) with a minimal reader
covering what the benchmarks need: multivariate series with optional class
labels (UEA classification) or regression targets (TSER), '?' missing
values, ragged lengths.

Format recap: '#' comment lines, '@tag value' header lines, then '@data'
followed by one line per case — dimensions separated by ':', observations
comma-separated, with the label/target as the final ':'-field when
``@classLabel``/``@targetlabel`` is true.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

__all__ = ["load_ts_file"]


def _parse_value(tok: str) -> float:
    tok = tok.strip()
    return np.nan if tok in ("?", "") else float(tok)


def load_ts_file(path: str) -> Tuple[List[np.ndarray], List[str]]:
    """Returns (series, labels): series[i] is (L_i, C) float32 with NaN for
    missing values; labels[i] is the raw label/target string ('' if the
    file has none)."""
    has_labels = False
    in_data = False
    series: List[np.ndarray] = []
    labels: List[str] = []

    with open(path) as f:
        for raw_line in f:
            line = raw_line.strip()
            if not line or line.startswith("#"):
                continue
            if not in_data:
                low = line.lower()
                if low.startswith("@classlabel") or low.startswith("@targetlabel"):
                    has_labels = "true" in low.split()
                if low.startswith("@data"):
                    in_data = True
                continue

            fields = line.split(":")
            if has_labels:
                label = fields[-1].strip()
                fields = fields[:-1]
            else:
                label = ""
            dims = [
                np.asarray([_parse_value(tok) for tok in field.split(",")],
                           dtype=np.float32)
                for field in fields
            ]
            length = max(len(d) for d in dims)
            arr = np.full((length, len(dims)), np.nan, dtype=np.float32)
            for c, d in enumerate(dims):
                arr[: len(d), c] = d
            series.append(arr)
            labels.append(label)

    return series, labels
