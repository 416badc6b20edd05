"""MIMIC-IV raw construction: BigQuery CSV exports -> reduced_format.npz.

Capability parity with reference /root/reference/get_data/mimic-iv/
build_raw.py (semantics documented at build_raw.py:1-11 and per function
below), re-written with vectorised pandas groupbys — the reference's
row-wise ``groupby().apply`` merge is self-described as "~4 hours"
(build_raw.py:183); the cumsum-group formulation here is minutes.

The BigQuery step itself requires credentialed network access and cannot
run in this image; the extraction SQL ships as ``mimic_query.sql`` next to
this module (role parity with reference query.sql:1-416) and this module
consumes its CSV exports from ``data/raw/mimic-iv/*.csv``.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import numpy as np
import pandas as pd

logger = logging.getLogger(__name__)

# Final model features (reference build_raw.py FEATURES_TO_USE, :26-82).
STATIC_FEATURES = ["gender", "ethnicity", "admission_age", "height", "weight",
                   "mortality", "los"]
TEMPORAL_VITALS = ["dbp", "dbp_ni", "heart_rate", "mbp", "mbp_ni", "o2_flow",
                   "resp_rate", "sbp", "spo2", "temperature"]
TEMPORAL_LABS = ["alp", "ast", "baseexcess", "bicarbonate_bg", "bilirubin_direct",
                 "bilirubin_total", "bun", "calcium", "chloride", "creatinine",
                 "fibrinogen", "fio2", "glucose", "glucose_bg", "hematocrit",
                 "hemoglobin", "lactate", "pco2", "ph", "platelet", "po2",
                 "potassium_bg", "ptt", "so2", "sodium", "troponin_i", "wbc"]
TEMPORAL_FEATURES = ["time"] + TEMPORAL_VITALS + TEMPORAL_LABS + ["sepsis", "ventilation"]

# Ventilation status -> ordinal code (build_raw.py:1-11).
VENT_CODES = {np.nan: 0, "Oxygen": 1, "InvasiveVent": 2, "Trach": 3,
              "HighFlow": 4, "NonInvasiveVent": 5}


def combine_csvs(raw_dir: str) -> pd.DataFrame:
    frames = [
        pd.read_csv(os.path.join(raw_dir, f))
        for f in sorted(os.listdir(raw_dir))
        if f.endswith(".csv")
    ]
    if not frames:
        raise FileNotFoundError(
            f"No BigQuery CSV exports under {raw_dir} (zero-egress image: "
            "run get_data/mimic-iv/query.sql externally first)."
        )
    return pd.concat(frames, ignore_index=True)


def build_times(frame: pd.DataFrame) -> pd.DataFrame:
    """Measurement time / LOS / sepsis marker in hours from ICU admission
    (reference build_raw.py:105-126)."""
    for col in ("charttime", "icu_outtime", "icu_intime", "t_sofa"):
        frame[col] = pd.to_datetime(frame[col])
    frame["time"] = (frame["charttime"] - frame["icu_intime"]).dt.total_seconds() / 3600.0
    frame["los"] = (frame["icu_outtime"] - frame["icu_intime"]).dt.total_seconds() / 86400.0
    frame["sepsis"] = (frame["t_sofa"] - frame["icu_intime"]).dt.total_seconds() / 3600.0
    return frame


def encode_categoricals(frame: pd.DataFrame, columns=("gender", "ethnicity")) -> pd.DataFrame:
    for col in columns:
        frame[col] = pd.factorize(frame[col])[0].astype(float)
    return frame


def remove_continuously_monitored(frame: pd.DataFrame, consecutive_time=2.0,
                                  num_consecutive=5) -> pd.DataFrame:
    """Drop patients with >= 5 consecutive unique measurement times within
    2 minutes of each other (reference build_raw.py:135-167), vectorised
    per id."""

    def is_continuous(times: np.ndarray) -> bool:
        times = np.unique(times)
        diffs = np.diff(times) * 60.0
        if len(diffs) <= num_consecutive:
            return False
        close = diffs < consecutive_time
        run = np.convolve(close.astype(int), np.ones(num_consecutive, int), "valid")
        return bool((run == num_consecutive).any())

    drop_ids = {
        id_ for id_, g in frame.groupby("id")["time"] if is_continuous(g.values)
    }
    logger.info("Removed %d continuously monitored patients", len(drop_ids))
    return frame[~frame["id"].isin(drop_ids)]


def merge_nearby_vitals(frame: pd.DataFrame, window_minutes=2.0) -> pd.DataFrame:
    """Merge measurements within 2 minutes of the previous one: feature
    means, last time/ventilation/sepsis (reference build_raw.py:170-220)
    as one vectorised groupby."""
    frame = frame.sort_values(["id", "time"], kind="stable").reset_index(drop=True)
    same_id = frame["id"].eq(frame["id"].shift(1))
    close = (frame["time"] - frame["time"].shift(1)) * 60.0 < window_minutes
    new_group = ~(same_id & close)
    frame["_group"] = new_group.cumsum()

    agg = {col: "mean" for col in frame.columns
           if col not in ("id", "_group", "time", "ventilation", "sepsis")}
    agg.update({"id": "first", "time": "last", "ventilation": "last", "sepsis": "last"})
    merged = frame.groupby("_group", as_index=False).agg(agg)
    original_order = [c for c in frame.columns if c != "_group"]
    return merged[original_order]


def convert_to_numpy(static_frame: pd.DataFrame, temporal_frame: pd.DataFrame,
                     out_path: str, min_points=4, min_hours=4.0) -> str:
    """Per-patient arrays + the four label structures -> reduced_format.npz
    (reference build_raw.py:296-355)."""
    temporal_frame = temporal_frame.sort_values(["id", "time"], kind="stable")
    static_data, temporal_data = [], []
    los, mort, vent, sepsis = [], [], [], []
    feature_cols = [c for c in temporal_frame.columns
                    if c not in ("id", "sepsis", "ventilation")]
    for id_, g in temporal_frame.groupby("id"):
        if len(g) < min_points or g["time"].max() < min_hours:
            continue
        srow = static_frame.loc[id_]
        static_data.append(
            srow.drop(["los", "mortality"]).to_numpy(dtype=np.float32)
        )
        los.append(float(srow["los"]))
        mort.append(float(srow["mortality"]))
        temporal_data.append(g[feature_cols].to_numpy(dtype=np.float32))
        vent.append(g[["time", "ventilation"]].to_numpy(dtype=np.float32))
        sep = g[["time", "sepsis"]].to_numpy(dtype=np.float32)
        t_sepsis = sep[0, 1]
        sep[:, 1] = 0.0
        if np.isfinite(t_sepsis):
            sep[int(np.argmin(np.abs(sep[:, 0] - t_sepsis))), 1] = 1.0
        sepsis.append(sep)

    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    np.savez(
        out_path,
        static_data=np.stack(static_data),
        temporal_data=np.array(temporal_data, dtype=object),
        los_data=np.asarray(los, np.float32),
        mortality_data=np.asarray(mort, np.float32),
        ventilation_data=np.array(vent, dtype=object),
        sepsis_data=np.array(sepsis, dtype=object),
        static_columns=[c for c in static_frame.columns if c not in ("los", "mortality")],
        temporal_columns=feature_cols,
    )
    return out_path


def build_reduced_format(raw_dir: str = "data/raw/mimic-iv",
                         out_path: Optional[str] = None) -> str:
    """The full pipeline: CSVs -> cleaned frames -> reduced_format.npz."""
    out_path = out_path or os.path.join(raw_dir, "reduced_format.npz")
    frame = combine_csvs(raw_dir)
    frame = frame.rename(columns={"stay_id": "id", "hospital_expire_flag": "mortality"})
    frame = build_times(frame)
    frame = frame[frame["time"] > 0]
    frame["ventilation"] = frame["ventilation_status"].map(
        lambda v: VENT_CODES.get(v, 0) if isinstance(v, str) else 0
    ).astype(float)
    frame = encode_categoricals(frame)
    frame = frame.sort_values("time", kind="stable")
    frame = remove_continuously_monitored(frame)

    static_frame = (
        frame[["id"] + STATIC_FEATURES].groupby("id", as_index=True).first()
    )
    temporal_frame = merge_nearby_vitals(frame[["id"] + TEMPORAL_FEATURES])
    return convert_to_numpy(static_frame, temporal_frame, out_path)
