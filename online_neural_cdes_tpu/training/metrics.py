"""Losses and metrics with NaN masking for online tasks.

Capability parity with reference experiments/ingredients/metrics.py: the
``TemporalLossWrapper`` that masks NaN labels (finished series) before the
loss (metrics.py:26-46), the ce/bce/mse/rmse registry (trainer.py:252-269),
and the accuracy/AUC/AUPRC metric set (metrics.py:61-224; AUC/AUPRC run on
host via sklearn exactly as the reference does — they are rank statistics,
not device math)."""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["make_loss", "masked_temporal_loss", "accuracy", "auc", "auprc",
           "precision", "f1", "METRICS"]


def _bce_logits(logits, labels):
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def _ce_logits(logits, labels):
    # labels: integer class ids
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[..., None].astype(jnp.int32), axis=-1)[..., 0]


def _mse(preds, labels):
    return jnp.square(preds - labels)


def make_loss(name: str) -> Callable:
    """Pointwise loss registry; reduce with :func:`masked_temporal_loss` or a
    plain mean.  ``preds`` carry a trailing output-dim axis which bce/mse
    squeeze when it is 1 (matching the reference's loss plumbing)."""

    def squeeze(preds):
        return preds[..., 0] if preds.shape[-1] == 1 else preds

    if name == "bce":
        return lambda preds, labels: _bce_logits(squeeze(preds), labels)
    if name == "ce":
        return lambda preds, labels: _ce_logits(preds, labels)
    if name == "mse":
        return lambda preds, labels: _mse(squeeze(preds), labels)
    if name == "rmse":
        # rmse is a reduction-level transform; pointwise it is mse, and
        # masked_temporal_loss applies the sqrt (reference metrics.py:49-58).
        return lambda preds, labels: _mse(squeeze(preds), labels)
    raise ValueError(f"Unknown loss {name!r}")


def masked_temporal_loss_parts(pointwise, preds, labels):
    """(sum of pointwise loss over non-NaN labels, non-NaN count) — the
    accumulable form of :func:`masked_temporal_loss`: microbatch sums add
    exactly (gradient accumulation), whereas microbatch MEANS would need
    per-micro mask counts to recombine."""
    # One-shot labels stored with a trailing singleton axis (e.g. the MIMIC
    # Mortality/LOS (N, 1) contract) must align with the squeezed (B,)
    # predictions — without this, (B,) x (B, 1) broadcasting silently
    # computes a (B, B) cross-pair loss matrix whose mean trains every
    # sample toward the label base rate.
    if labels.ndim >= 2 and labels.shape[-1] == 1 and labels.ndim == preds.ndim:
        labels = labels[..., 0]
    mask = ~jnp.isnan(labels)
    safe_labels = jnp.where(mask, labels, jnp.zeros_like(labels))
    values = pointwise(preds, safe_labels)
    # For ce the mask may lack the trailing class axis; broadcast.
    mask = jnp.broadcast_to(mask, values.shape)
    total = jnp.sum(jnp.where(mask, values, 0.0))
    # Count in the loss dtype: accumulation carries then share one dtype
    # (per-batch counts are far below float32's exact-integer range).
    return total, jnp.sum(mask, dtype=values.dtype)


def masked_temporal_loss(pointwise, preds, labels, sqrt: bool = False):
    """Mean of the pointwise loss over non-NaN labels (reference
    ``TemporalLossWrapper``, metrics.py:26-46).  Works for both per-step
    (online) and terminal labels."""
    total, count = masked_temporal_loss_parts(pointwise, preds, labels)
    mean = total / jnp.maximum(count, 1)
    return jnp.sqrt(mean) if sqrt else mean


# -- host-side evaluation metrics (NaN labels masked out) -------------------

def _flat_mask(preds: np.ndarray, labels: np.ndarray):
    labels = np.asarray(labels).reshape(-1)
    preds = np.asarray(preds)
    preds = preds.reshape(-1, preds.shape[-1]) if preds.ndim > 1 else preds.reshape(-1, 1)
    keep = ~np.isnan(labels)
    return preds[keep], labels[keep]


def accuracy(preds, labels) -> float:
    p, l = _flat_mask(preds, labels)
    if p.shape[-1] == 1:
        pred_cls = (1 / (1 + np.exp(-p[:, 0])) > 0.5).astype(l.dtype)
    else:
        pred_cls = p.argmax(-1).astype(l.dtype)
    return float((pred_cls == l).mean())


def auc(preds, labels) -> float:
    from sklearn.metrics import roc_auc_score

    p, l = _flat_mask(preds, labels)
    scores = p[:, 0] if p.shape[-1] == 1 else p.max(-1)
    return float(roc_auc_score(l, scores))


def auprc(preds, labels) -> float:
    from sklearn.metrics import average_precision_score

    p, l = _flat_mask(preds, labels)
    scores = p[:, 0] if p.shape[-1] == 1 else p.max(-1)
    return float(average_precision_score(l, scores))


def _predicted_classes(p: np.ndarray, like_dtype):
    if p.shape[-1] == 1:
        return (1 / (1 + np.exp(-p[:, 0])) > 0.5).astype(like_dtype)
    return p.argmax(-1).astype(like_dtype)


def precision(preds, labels) -> float:
    """NaN-masked precision (reference ingredients/metrics.py:61-141)."""
    from sklearn.metrics import precision_score

    p, l = _flat_mask(preds, labels)
    avg = "binary" if p.shape[-1] == 1 else "macro"
    return float(precision_score(l, _predicted_classes(p, l.dtype),
                                 average=avg, zero_division=0))


def f1(preds, labels) -> float:
    """NaN-masked F1 (reference ingredients/metrics.py:61-141)."""
    from sklearn.metrics import f1_score

    p, l = _flat_mask(preds, labels)
    avg = "binary" if p.shape[-1] == 1 else "macro"
    return float(f1_score(l, _predicted_classes(p, l.dtype),
                          average=avg, zero_division=0))


METRICS = {"acc": accuracy, "auc": auc, "auprc": auprc,
           "precision": precision, "f1": f1}
