"""Segmentation metrics.

Capability parity (SURVEY.md §2.1 "Loss & metrics", §5 observability):
all-pixel accuracy, **nonzero-pixel accuracy** (the key reference metric —
LArTPC images are ~99% empty, so accuracy restricted to pixels with charge
> 0), plus per-class IoU / mIoU required by the BASELINE parity gate.
All reductions are pure jnp so they run inside the jitted step; under pjit
with batch-sharded inputs the sums are global automatically.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


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
