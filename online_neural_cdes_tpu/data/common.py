"""Dataset preprocessing: normalisation, time channels, interpolation
precompute, stratified splits, npz persistence.

Capability parity with reference /root/reference/get_data/common.py and
transformers.py: the processed-dataset contract is an ``.npz`` holding
``temporal_data_{linear,rectilinear,cubic,linear_forward_fill,raw}``,
``static_data``, ``labels`` and ``{train,val,test}_idxs``
(common.py:93-123), which the loader consumes per interpolation key.

All coefficient construction runs through the jitted batched builders in
``ops.interpolation`` (the reference loops per-sample on torch);
ragged inputs are grouped by length so each distinct length compiles once.
"""

from __future__ import annotations

import os
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from online_neural_cdes_tpu.ops.interpolation import (
    hermite_cubic_coefficients_with_backward_differences,
    linear_interpolation_coeffs,
    natural_cubic_coeffs,
)

INTERPOLATION_METHODS = (
    "linear",
    "rectilinear",
    "cubic",
    "linear_forward_fill",
    # Beyond the reference npz contract (common.py:93-123): the causal
    # Hermite-cubic scheme the toy benchmark assumes exists
    # (sim_bm_toy_example.py:164,189) is first-class end-to-end here.
    "hermite",
)


def add_time(temporal_data: np.ndarray) -> np.ndarray:
    """Prepend a 0..L-1 time channel (reference common.py:178-184)."""
    times = np.repeat(
        np.arange(temporal_data.shape[1]).reshape(1, -1, 1), len(temporal_data), 0
    )
    return np.concatenate([times, temporal_data], axis=-1)


def normalise(data) -> list:
    """NaN-aware z-score with statistics over all samples/times
    (reference common.py:81-90).  ``data``: array (N, L, C) or ragged list."""
    if isinstance(data, np.ndarray) and data.ndim == 3:
        flat = data.reshape(-1, data.shape[-1])
        seq = [d for d in data]
    else:
        seq = [np.asarray(d) for d in data]
        flat = np.concatenate(seq, axis=0)
    mean = np.nanmean(flat, axis=0)
    std = np.nanstd(flat, axis=0)
    return [(d - mean) / (std + 1e-6) for d in seq]


def negative_filter(static: np.ndarray) -> np.ndarray:
    """Mark negative placeholder entries as missing (the role of autots'
    NegativeFilter in the reference static pipeline, common.py:45-51)."""
    out = np.array(static, dtype=np.float64, copy=True)
    out[out < 0] = np.nan
    return out


def static_pipeline(static: np.ndarray) -> np.ndarray:
    """negative-filter -> z-score -> constant-impute 0 (common.py:41-56)."""
    out = negative_filter(static)
    mean = np.nanmean(out, axis=0)
    std = np.nanstd(out, axis=0)
    out = (out - mean) / (std + 1e-6)
    out[np.isnan(out)] = 0.0
    return out.astype(np.float32)


def _coeff_fn(method: str):
    if method == "linear":
        return lambda x: linear_interpolation_coeffs(x)
    if method == "rectilinear":
        return lambda x: linear_interpolation_coeffs(x, rectilinear=0)
    if method == "linear_forward_fill":
        return lambda x: linear_interpolation_coeffs(x, forward_fill=True)
    if method == "cubic":
        return natural_cubic_coeffs
    if method == "hermite":
        return hermite_cubic_coefficients_with_backward_differences
    raise ValueError(method)


def interpolate(data, method: str = "linear", initial_nan_to_zero: bool = True,
                use_native: bool = True):
    """Coefficient transformer (reference transformers.py:7-76): per-method
    coeff builder with the causal initial-NaN->0 fill.  Accepts an array
    (N, L, C) or a ragged list.  Ragged corpora prefer the native C++
    library (data/native.py — one threaded pass, no per-length compiles)
    and otherwise group by length so each length compiles once."""
    fn = _coeff_fn(method)

    def one_batch(arr):
        arr = np.array(arr, dtype=np.float32, copy=True)
        if initial_nan_to_zero:
            first = arr[..., :1, :]
            first[np.isnan(first)] = 0.0
            arr[..., :1, :] = first
        return np.asarray(fn(jnp.asarray(arr)))

    if isinstance(data, np.ndarray) and data.ndim == 3:
        return one_batch(data)

    if use_native:
        native_out = _interpolate_native(data, method, initial_nan_to_zero)
        if native_out is not None:
            return native_out

    lengths = [len(d) for d in data]
    out: List[Optional[np.ndarray]] = [None] * len(data)
    for length in sorted(set(lengths)):
        idxs = [i for i, l in enumerate(lengths) if l == length]
        batch = np.stack([np.asarray(data[i]) for i in idxs])
        coeffs = one_batch(batch)
        for j, i in enumerate(idxs):
            out[i] = coeffs[j]
    return out


def _interpolate_native(data, method: str, initial_nan_to_zero: bool):
    """Ragged fast path through csrc/preprocess.cpp; None if unavailable."""
    try:
        from online_neural_cdes_tpu.data import native
    except Exception:
        return None
    if method not in ("linear", "rectilinear", "linear_forward_fill", "cubic",
                      "hermite"):
        return None
    if not native.available():
        return None
    series = []
    for d in data:
        d = np.array(d, dtype=np.float32, copy=True)
        if initial_nan_to_zero:
            row = d[:1, :]
            row[np.isnan(row)] = 0.0
        series.append(d)
    if method == "cubic":
        return native.natural_cubic_ragged(series)
    if method == "hermite":
        return native.hermite_ragged(series)
    if method == "rectilinear":
        series = native.rectilinear_ragged(series, time_index=0)
        return native.linear_fill_ragged(series)
    if method == "linear_forward_fill":
        series = native.forward_fill_ragged(series)
    return native.linear_fill_ragged(series)


def train_val_test_indices(length: int, stratification_labels=None,
                           fractions=(0.70, 0.15, 0.15), seed: int = 0):
    """Stratified 70/15/15 split (reference common.py:126-137)."""
    from sklearn.model_selection import train_test_split

    idxs = np.arange(length)
    strat = None if stratification_labels is None else np.asarray(stratification_labels)
    try:
        train, rest = train_test_split(
            idxs, test_size=fractions[1] + fractions[2], random_state=seed,
            stratify=strat,
        )
        rest_strat = None if strat is None else strat[rest]
        val, test = train_test_split(
            rest,
            test_size=fractions[2] / (fractions[1] + fractions[2]),
            random_state=seed,
            stratify=rest_strat,
        )
    except ValueError:
        # Stratification infeasible (tiny datasets / rare classes).
        train, rest = train_test_split(
            idxs, test_size=fractions[1] + fractions[2], random_state=seed
        )
        val, test = train_test_split(
            rest, test_size=fractions[2] / (fractions[1] + fractions[2]),
            random_state=seed,
        )
    return train, val, test


def process_all_interpolations(
    static_data,
    temporal_data,
    stratification_labels=None,
    split: bool = True,
) -> dict:
    """Normalise + precompute every interpolation's coefficients + splits
    (reference common.py:93-123)."""
    processed = {}
    if static_data is not None:
        processed["static_data"] = static_pipeline(np.asarray(static_data))

    temporal_data = normalise(temporal_data)
    processed["temporal_data_raw"] = temporal_data
    for method in INTERPOLATION_METHODS:
        processed[f"temporal_data_{method}"] = interpolate(temporal_data, method)

    if split:
        train, val, test = train_val_test_indices(
            len(temporal_data), stratification_labels
        )
        processed["train_idxs"] = train
        processed["val_idxs"] = val
        processed["test_idxs"] = test
    return processed


def save_processed(processed: dict, labels, directory: str, test_mode: bool = False):
    """Write the reference-compatible npz (``improved-neural-cdes_data.npz``)."""
    os.makedirs(directory, exist_ok=True)
    payload = dict(processed)
    payload["labels"] = labels
    for key, val in list(payload.items()):
        if isinstance(val, list):
            if all(isinstance(v, np.ndarray) and v.shape == val[0].shape for v in val):
                payload[key] = np.stack(val)
            else:
                payload[key] = np.array(val, dtype=object)
    name = "improved-neural-cdes_data{}.npz".format("_test" if test_mode else "")
    np.savez(os.path.join(directory, name), **payload)
    return os.path.join(directory, name)


def reduce_tensor_samples(tensors, num_samples: int = 100):
    """Shrink datasets for test mode (reference common.py:140-145)."""
    return [t[:num_samples] for t in tensors]


def rolling_window(x: np.ndarray, window_size: int, step_size: int = 1,
                   return_same_size: bool = True) -> np.ndarray:
    """(N, L, C) -> (N, L', C, W) rolling windows over time
    (reference common.py:148-175)."""
    x = np.asarray(x)
    if return_same_size:
        pad = np.full((x.shape[0], window_size - 1, x.shape[2]), np.nan, x.dtype)
        x = np.concatenate([pad, x], axis=1)
    n, length, channels = x.shape
    n_windows = (length - window_size) // step_size + 1
    out = np.empty((n, n_windows, channels, window_size), x.dtype)
    for w in range(n_windows):
        start = w * step_size
        out[:, w] = np.moveaxis(x[:, start:start + window_size], 1, -1)
    return out
