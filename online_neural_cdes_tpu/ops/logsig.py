"""Log-ODE method: log-signatures over windows, pure JAX.

Capability parity with reference /root/reference/modules/torchcde/torchcde/
log_ode.py:15-133 (``logsig_windows`` / deprecated ``logsignature_windows``),
which delegates the kernel to the external C++/CUDA ``signatory`` package.
Here depth <= 3 log-signatures are computed natively:

1. each window's piecewise-linear path signature is built by folding
   per-segment signatures exp(delta) with Chen's identity (a ``lax.scan``
   whose identity element is the zero increment — so ragged windows are
   just zero-padded),
2. the truncated tensor logarithm is taken in closed form,
3. coefficients of the Lyndon words are extracted (signatory's default
   ``mode='words'`` coordinates), giving C + (C^2-C)/2 + (C^3-C)/3 channels.

The transformed series is [x_0-padded first row; per-window logsigs],
cumulative-summed over windows (log_ode.py:53-70): a shorter path with more
channels, trading sequence length for width — exactly the trade a TPU
wants (SURVEY.md §5 long-context).
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from online_neural_cdes_tpu.ops.fill import linear_fill

__all__ = [
    "logsig_windows",
    "logsignature_windows",
    "logsignature_channels",
    "lyndon_words",
]


def lyndon_words(channels: int, depth: int) -> List[Tuple[int, ...]]:
    """All Lyndon words over {0..channels-1} of length <= depth, in
    (length, lexicographic) order — signatory's channel ordering."""
    assert 1 <= depth <= 3, "log-signatures implemented for depth <= 3"
    words = [(i,) for i in range(channels)]
    if depth >= 2:
        words += [(i, j) for i in range(channels) for j in range(channels) if i < j]
    if depth >= 3:
        for i in range(channels):
            for j in range(channels):
                for k in range(channels):
                    w = (i, j, k)
                    if w < (j, k, i) and w < (k, i, j):
                        words.append(w)
    return words


def logsignature_channels(channels: int, depth: int) -> int:
    return len(lyndon_words(channels, depth))


def _chen(sig_a, sig_b, depth):
    """Chen's identity for truncated signatures represented as tuples
    (s1 (C,), s2 (C,C), s3 (C,C,C))."""
    a1, a2, a3 = sig_a
    b1, b2, b3 = sig_b
    s1 = a1 + b1
    s2 = s3 = None
    if depth >= 2:
        s2 = a2 + b2 + jnp.einsum("...i,...j->...ij", a1, b1)
    if depth >= 3:
        s3 = (
            a3 + b3
            + jnp.einsum("...ij,...k->...ijk", a2, b1)
            + jnp.einsum("...i,...jk->...ijk", a1, b2)
        )
    return (s1, s2, s3)


def _segment_signature(delta, depth):
    """exp(delta): the signature of one linear segment."""
    s1 = delta
    s2 = s3 = None
    if depth >= 2:
        s2 = 0.5 * jnp.einsum("...i,...j->...ij", delta, delta)
    if depth >= 3:
        s3 = jnp.einsum("...ij,...k->...ijk", s2, delta) / 3.0
    return (s1, s2, s3)


def _tensor_log(sig, depth):
    """log(1 + s) truncated at ``depth``."""
    s1, s2, s3 = sig
    l1 = s1
    l2 = l3 = None
    if depth >= 2:
        l2 = s2 - 0.5 * jnp.einsum("...i,...j->...ij", s1, s1)
    if depth >= 3:
        l3 = (
            s3
            - 0.5 * (
                jnp.einsum("...i,...jk->...ijk", s1, s2)
                + jnp.einsum("...ij,...k->...ijk", s2, s1)
            )
            + jnp.einsum("...i,...j,...k->...ijk", s1, s1, s1) / 3.0
        )
    return (l1, l2, l3)


def _window_logsig(deltas, depth, words_idx):
    """deltas: (..., M, C) zero-padded segment increments of one window ->
    (..., logsig_channels) Lyndon-word coefficients."""
    channels = deltas.shape[-1]
    batch_shape = deltas.shape[:-2]
    zero = (
        jnp.zeros(batch_shape + (channels,), deltas.dtype),
        jnp.zeros(batch_shape + (channels, channels), deltas.dtype) if depth >= 2 else None,
        jnp.zeros(batch_shape + (channels, channels, channels), deltas.dtype) if depth >= 3 else None,
    )

    def fold(sig, delta):
        return _chen(sig, _segment_signature(delta, depth), depth), None

    sig, _ = jax.lax.scan(fold, zero, jnp.moveaxis(deltas, -2, 0))
    l1, l2, l3 = _tensor_log(sig, depth)

    parts = [l1]
    if depth >= 2:
        flat2 = l2.reshape(batch_shape + (channels * channels,))
        parts.append(flat2[..., words_idx[2]])
    if depth >= 3:
        flat3 = l3.reshape(batch_shape + (channels**3,))
        parts.append(flat3[..., words_idx[3]])
    return jnp.concatenate(parts, axis=-1)


def _logsignature_windows(x, depth, window_length, t, version):
    x = jnp.asarray(x)
    channels = x.shape[-1]
    length = x.shape[-2]
    if t is None:
        t_np = np.arange(length, dtype=np.float64)
    else:
        t_np = np.asarray(t, dtype=np.float64)

    # Static host-side window grid (log_ode.py:19-38): window boundaries at
    # multiples of window_length, merged into the observation grid.
    timespan = t_np[-1] - t_np[0]
    num_pieces = int(np.ceil(timespan / window_length - 1e-9))
    new_t = np.minimum(t_np[0] + window_length * np.arange(num_pieces + 1), t_np[-1])
    union = np.unique(np.concatenate([t_np, new_t]))
    boundary_pos = np.searchsorted(union, new_t)

    # Evaluate the (NaN-infilled) linear interpolation on the union grid.
    filled = linear_fill(x, t=jnp.asarray(t_np, x.dtype), axis=-2)
    idx = np.clip(np.searchsorted(t_np, union, side="right") - 1, 0, length - 2)
    frac = (union - t_np[idx]) / (t_np[idx + 1] - t_np[idx])
    left = filled[..., idx, :]
    right = filled[..., idx + 1, :]
    xu = left + jnp.asarray(frac, x.dtype)[:, None] * (right - left)

    # Zero-padded per-window segment increments (zero = Chen identity).
    deltas = xu[..., 1:, :] - xu[..., :-1, :]
    seg_window = np.searchsorted(boundary_pos[1:], np.arange(len(union) - 1), "right")
    max_segs = int(np.max(np.bincount(seg_window, minlength=num_pieces)))
    gather = np.full((num_pieces, max_segs), len(union) - 1, dtype=np.int64)
    for w in range(num_pieces):
        segs = np.nonzero(seg_window == w)[0]
        gather[w, : len(segs)] = segs
    pad = jnp.concatenate([deltas, jnp.zeros_like(deltas[..., :1, :])], axis=-2)
    win_deltas = pad[..., jnp.asarray(gather), :]      # (..., W, M, C)

    words = lyndon_words(channels, depth)
    words_idx = {
        2: np.asarray([w[0] * channels + w[1] for w in words if len(w) == 2], np.int64),
        3: np.asarray(
            [w[0] * channels**2 + w[1] * channels + w[2] for w in words if len(w) == 3],
            np.int64,
        ),
    }
    logsigs = jax.vmap(
        lambda d: _window_logsig(d, depth, words_idx), in_axes=-3, out_axes=-2
    )(win_deltas)                                       # (..., W, n_logsig)

    if version == 0:
        widths = jnp.asarray(np.diff(new_t), x.dtype)[..., :, None]
        logsigs = logsigs * widths

    first = jnp.zeros(x.shape[:-2] + (1, len(words)), x.dtype)
    first = first.at[..., 0, :channels].set(xu[..., 0, :])
    path = jnp.cumsum(jnp.concatenate([first, logsigs], axis=-2), axis=-2)

    if version == 0:
        return path, jnp.asarray(new_t, x.dtype)
    return path


def logsig_windows(x, depth: int, window_length, t=None):
    """Transformed path of shape (..., num_windows+1, logsig_channels);
    times are the implicit unit grid (reference log_ode.py:110-133)."""
    return _logsignature_windows(x, depth, window_length, t, version=1)


def logsignature_windows(x, depth: int, window_length, t=None):
    """Deprecated variant with the window-width rescaling; returns
    (values, times) (reference log_ode.py:80-107)."""
    return _logsignature_windows(x, depth, window_length, t, version=0)
