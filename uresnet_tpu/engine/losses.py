"""Pixel-weighted softmax cross-entropy.

Capability parity (SURVEY.md §2.1 "Loss & metrics"; §3.1 step):
reference computes ``mean(weight * softmax_xent(label, logits))`` over all
pixels. ``normalize='mean'`` reproduces that; ``'weight_sum'`` divides by
``sum(weight)`` instead (scale-invariant alternative, configurable because
the exact reference weighting scheme is [K:low] — SURVEY.md §7 hard part #3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def weighted_softmax_xent(
    logits: jax.Array,      # (B, *S, C) float
    labels: jax.Array,      # (B, *S) int
    weights: jax.Array,     # (B, *S) float
    *,
    normalize: str = "mean",
) -> jax.Array:
    logits = logits.astype(jnp.float32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    true_logit = jnp.take_along_axis(
        logits, labels[..., None].astype(jnp.int32), axis=-1
    )[..., 0]
    xent = logz - true_logit
    w = weights.astype(jnp.float32)
    if normalize == "mean":
        return jnp.mean(w * xent)
    if normalize == "weight_sum":
        return jnp.sum(w * xent) / jnp.maximum(jnp.sum(w), 1e-6)
    raise ValueError(f"unknown normalize mode {normalize!r}")
