"""ctypes bindings for the native C++ preprocessing library (csrc/
preprocess.cpp): ragged forward fill, linear NaN infill, rectilinear
preparation, natural-cubic and Hermite-cubic coefficient construction and
GRU-D delta/mask —
one pass per series, threaded over series, no per-length XLA compiles.

``build()`` compiles the shared library with g++ on first use; every entry
point has a pure-Python fallback path in ``data/common.py`` /
``ops/interpolation.py``, so the framework works unbuilt.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence

import numpy as np

__all__ = [
    "available",
    "build",
    "forward_fill_ragged",
    "linear_fill_ragged",
    "rectilinear_ragged",
    "natural_cubic_ragged",
    "hermite_ragged",
    "delta_mask_ragged",
]

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(os.path.dirname(_HERE), "csrc", "preprocess.cpp")
_LIB_PATH = os.path.join(os.path.dirname(_HERE), "csrc", "libncde_preprocess.so")
_lib: Optional[ctypes.CDLL] = None
_load_failed = False

_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")


def build(force: bool = False) -> str:
    """Compile the shared library (g++, -O3).  Rebuilds when the source is
    newer than an existing .so — a stale committed binary must not silently
    shadow source edits."""
    if os.path.exists(_LIB_PATH) and not force:
        # Use the existing binary when the source is absent (shipped-.so
        # deployment) or not newer than it.
        if not os.path.exists(_SRC) or (
            os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC)
        ):
            return _LIB_PATH
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", _LIB_PATH, "-pthread",
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB_PATH


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None:
        return _lib
    if _load_failed:
        # Negative-cache a failed build: no g++ subprocess spawn per call.
        return None
    try:
        build()
        lib = ctypes.CDLL(_LIB_PATH)
    except Exception:
        _load_failed = True
        return None
    lib.ncde_forward_fill.argtypes = [_f32p, _i64p, ctypes.c_int64, ctypes.c_int64]
    lib.ncde_linear_fill.argtypes = [_f32p, _f64p, _i64p, ctypes.c_int64, ctypes.c_int64]
    lib.ncde_rectilinear.argtypes = [
        _f32p, _f32p, _i64p, _i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64
    ]
    lib.ncde_natural_cubic.argtypes = [
        _f32p, _f64p, _f32p, _i64p, _i64p, ctypes.c_int64, ctypes.c_int64
    ]
    lib.ncde_hermite.argtypes = [
        _f32p, _f64p, _f32p, _i64p, _i64p, ctypes.c_int64, ctypes.c_int64
    ]
    lib.ncde_delta_mask.argtypes = [_f32p, _f32p, _f32p, _i64p, ctypes.c_int64,
                                    ctypes.c_int64]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _ragged_pack(series: Sequence[np.ndarray], min_length: int = 1):
    lengths = np.asarray([len(s) for s in series], np.int64)
    if len(lengths) == 0:
        raise ValueError("empty series list")
    if lengths.min() < min_length:
        # Output-length arithmetic (2L-1 rectilinear rows, L-1 cubic
        # pieces) goes negative for shorter series, which would corrupt
        # the offset tables and make the C++ kernels write out of bounds.
        raise ValueError(
            f"every series must have at least {min_length} rows; got "
            f"lengths down to {int(lengths.min())}"
        )
    offsets = np.zeros(len(series) + 1, np.int64)
    np.cumsum(lengths, out=offsets[1:])
    flat = np.concatenate([np.ascontiguousarray(s, np.float32) for s in series])
    return flat, offsets


def _check_times(t: np.ndarray, flat: np.ndarray):
    if t.shape[0] != flat.shape[0]:
        raise ValueError(
            f"concatenated times have {t.shape[0]} rows but the series have "
            f"{flat.shape[0]} — per-series times must match series lengths"
        )
    return np.ascontiguousarray(t)


def _unpack(flat: np.ndarray, offsets: np.ndarray) -> List[np.ndarray]:
    return [flat[offsets[i]: offsets[i + 1]] for i in range(len(offsets) - 1)]


def _times_for(series, offsets):
    return np.concatenate(
        [np.arange(offsets[i + 1] - offsets[i], dtype=np.float64)
         for i in range(len(offsets) - 1)]
    )


def forward_fill_ragged(series: Sequence[np.ndarray]) -> List[np.ndarray]:
    lib = _load()
    flat, offsets = _ragged_pack(series)
    lib.ncde_forward_fill(flat, offsets, len(series), flat.shape[-1])
    return _unpack(flat, offsets)


def linear_fill_ragged(series: Sequence[np.ndarray],
                       times: Optional[Sequence[np.ndarray]] = None) -> List[np.ndarray]:
    lib = _load()
    flat, offsets = _ragged_pack(series)
    if times is None:
        t = _times_for(series, offsets)
    else:
        t = np.concatenate([np.asarray(x, np.float64) for x in times])
    lib.ncde_linear_fill(flat, _check_times(t, flat), offsets, len(series),
                         flat.shape[-1])
    return _unpack(flat, offsets)


def rectilinear_ragged(series: Sequence[np.ndarray], time_index: int = 0) -> List[np.ndarray]:
    lib = _load()
    flat, offsets = _ragged_pack(series, min_length=1)
    out_lengths = 2 * np.diff(offsets) - 1
    out_offsets = np.zeros(len(series) + 1, np.int64)
    np.cumsum(out_lengths, out=out_offsets[1:])
    out = np.empty((out_offsets[-1], flat.shape[-1]), np.float32)
    lib.ncde_rectilinear(flat, out, offsets, out_offsets, len(series),
                         flat.shape[-1], time_index)
    return _unpack(out, out_offsets)


def _cubic_coeffs_ragged(entry_point, series, times) -> List[np.ndarray]:
    """Shared packing for the cubic-coefficient entry points: ragged pack,
    per-series times, piece offsets (len-1 rows each), [a|b|two_c|three_d]
    output buffer."""
    lib = _load()
    flat, offsets = _ragged_pack(series, min_length=2)
    channels = flat.shape[-1]
    if times is None:
        t = _times_for(series, offsets)
    else:
        t = np.concatenate([np.asarray(x, np.float64) for x in times])
    piece_lengths = np.diff(offsets) - 1
    piece_offsets = np.zeros(len(series) + 1, np.int64)
    np.cumsum(piece_lengths, out=piece_offsets[1:])
    coeffs = np.zeros((piece_offsets[-1], 4 * channels), np.float32)
    getattr(lib, entry_point)(flat, _check_times(t, flat), coeffs, offsets,
                              piece_offsets, len(series), channels)
    return _unpack(coeffs, piece_offsets)


def natural_cubic_ragged(series: Sequence[np.ndarray],
                         times: Optional[Sequence[np.ndarray]] = None) -> List[np.ndarray]:
    """Packed [a|b|two_c|three_d] coefficients per series, rows = len-1."""
    return _cubic_coeffs_ragged("ncde_natural_cubic", series, times)


def hermite_ragged(series: Sequence[np.ndarray],
                   times: Optional[Sequence[np.ndarray]] = None) -> List[np.ndarray]:
    """Hermite-cubic (backward differences) coefficients, packed
    [a|b|two_c|three_d] per series, rows = len-1 — the causal cubic scheme
    (ops/interpolation.py:246-280) without per-length XLA compiles."""
    return _cubic_coeffs_ragged("ncde_hermite", series, times)


def delta_mask_ragged(series: Sequence[np.ndarray]):
    """GRU-D time-since-last-observation deltas + masks (time channel 0)."""
    lib = _load()
    flat, offsets = _ragged_pack(series)
    delta = np.zeros_like(flat)
    mask = np.zeros_like(flat)
    lib.ncde_delta_mask(flat, delta, mask, offsets, len(series), flat.shape[-1])
    return _unpack(delta, offsets), _unpack(mask, offsets)
