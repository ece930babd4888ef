"""Segmentation metrics.

Capability parity (SURVEY.md §2.1 "Loss & metrics", §5 observability):
all-pixel accuracy, **nonzero-pixel accuracy** (the key reference metric —
LArTPC images are ~99% empty, so accuracy restricted to pixels with charge
> 0), plus per-class IoU / mIoU required by the BASELINE parity gate.
All reductions are pure jnp so they run inside the jitted step; under pjit
with batch-sharded inputs the sums are global automatically.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


def segmentation_metrics(
    logits: jax.Array,   # (B, *S, C)
    labels: jax.Array,   # (B, *S) int
    data: jax.Array,     # (B, *S, C_in) input charge image (nonzero mask source)
    *,
    num_class: int,
) -> Dict[str, jax.Array]:
    pred = jnp.argmax(logits, axis=-1)
    labels = labels.astype(pred.dtype)
    correct = (pred == labels).astype(jnp.float32)

    acc_all = jnp.mean(correct)

    nonzero = (jnp.sum(jnp.abs(data), axis=-1) > 0).astype(jnp.float32)
    n_nonzero = jnp.maximum(jnp.sum(nonzero), 1.0)
    acc_nonzero = jnp.sum(correct * nonzero) / n_nonzero

    # Per-class IoU via confusion sums (static num_class loop -> fused by XLA).
    ious = []
    for c in range(num_class):
        p = (pred == c)
        t = (labels == c)
        inter = jnp.sum(jnp.logical_and(p, t).astype(jnp.float32))
        union = jnp.sum(jnp.logical_or(p, t).astype(jnp.float32))
        ious.append(jnp.where(union > 0, inter / jnp.maximum(union, 1.0), 1.0))
    iou = jnp.stack(ious)

    out = {
        "acc_all": acc_all,
        "acc_nonzero": acc_nonzero,
        "miou": jnp.mean(iou),
    }
    for c in range(num_class):
        out[f"iou_class{c}"] = iou[c]
    return out


def segmentation_counts(
    logits: jax.Array,   # (B, *S, C)
    labels: jax.Array,   # (B, *S) int
    data: jax.Array,     # (B, *S, C_in)
    *,
    num_class: int,
    row_valid: jax.Array = None,   # (B,) 1.0 = real row, 0.0 = padded tail
) -> Dict[str, jax.Array]:
    """SUM-form counterpart of `segmentation_metrics` for exact dataset
    evaluation (the mIoU parity gate, BASELINE north_star): returns raw
    counts — a (pred, true) confusion matrix plus nonzero-pixel counts —
    that aggregate across batches before `metrics_from_counts` computes the
    metrics ONCE over the whole dataset. Per-batch IoU means are not a
    well-defined dataset mIoU; confusion sums are. ``row_valid`` masks the
    wrapped/padded rows of the final batch so every event counts exactly
    once (SURVEY.md §3.2 sequential single-pass ana)."""
    pred = jnp.argmax(logits, axis=-1)
    labels = labels.astype(pred.dtype)
    spatial = tuple(range(1, pred.ndim))
    valid = (jnp.ones(pred.shape[0], jnp.float32) if row_valid is None
             else row_valid.astype(jnp.float32))
    vpix = valid.reshape((-1,) + (1,) * len(spatial))            # (B,1,..)
    one_p = jax.nn.one_hot(pred, num_class, dtype=jnp.float32) * vpix[..., None]
    one_t = jax.nn.one_hot(labels, num_class, dtype=jnp.float32)
    # (pred, true) confusion sums PER ROW — one-hot contraction, not
    # gathers. Per-row keeps every f32 sum an exact integer (a single row
    # is < 2^24 pixels even at 192^3 = 7.1M); the cross-row reduction
    # happens in float64 on the host (`reduce_counts`) so dataset totals
    # stay exact at any scale (round-3 review finding).
    conf = jnp.einsum("b...c,b...d->bcd", one_p, one_t)
    nonzero = (jnp.sum(jnp.abs(data), axis=-1) > 0).astype(jnp.float32) * vpix
    correct = (pred == labels).astype(jnp.float32)
    pix_per_row = 1
    for s in pred.shape[1:]:
        pix_per_row *= int(s)
    return {
        "conf": conf,                                          # (B, C, C)
        "n_pixels": jnp.sum(valid) * float(pix_per_row),
        "correct_nonzero": jnp.sum(correct * nonzero,
                                   axis=spatial),              # (B,)
        "n_nonzero": jnp.sum(nonzero, axis=spatial),           # (B,)
    }


def reduce_counts(counts: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Host-side float64 reduction of (possibly per-row) count leaves from
    `segmentation_counts` (+ any scalar extras like loss sums): conf
    (B,C,C)->(C,C), per-row vectors -> scalars. Aggregate the returned
    dicts by plain addition across batches."""
    out = {}
    for k, v in counts.items():
        v = np.asarray(v, np.float64)
        if k == "conf" and v.ndim == 3:
            v = v.sum(axis=0)
        elif k != "conf" and v.ndim >= 1:
            v = v.sum()
        out[k] = v
    return out


def metrics_from_counts(counts: Dict[str, Any]) -> Dict[str, float]:
    """Final metrics from aggregated `segmentation_counts` sums (host side,
    numpy). Same IoU semantics as `segmentation_metrics` (empty union ->
    1.0)."""
    conf = np.asarray(counts["conf"], np.float64)
    num_class = conf.shape[0]
    n_pix = float(counts["n_pixels"])
    out = {
        "acc_all": float(np.trace(conf) / max(n_pix, 1.0)),
        "acc_nonzero": float(counts["correct_nonzero"]
                             / max(float(counts["n_nonzero"]), 1.0)),
    }
    ious = []
    for c in range(num_class):
        inter = conf[c, c]
        union = conf[c, :].sum() + conf[:, c].sum() - inter
        iou = inter / union if union > 0 else 1.0
        ious.append(iou)
        out[f"iou_class{c}"] = float(iou)
    out["miou"] = float(np.mean(ious))
    return out
