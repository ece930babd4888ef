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


def softmax_xent_per_pixel(
    logits: jax.Array,      # (B, *S, C) float
    labels: jax.Array,      # (B, *S) int
) -> jax.Array:
    """Unreduced per-pixel cross-entropy (f32). Shared by the training loss
    and the exactly-once dataset evaluator (engine/evaluator.py), which
    needs to mask padded tail rows before reducing."""
    logits = logits.astype(jnp.float32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    # one-hot multiply-sum, NOT take_along_axis: the gather lowers to a
    # scalar-indexed op that measured 128 ms/step at (32,512,512,3) on v5e
    # (30% of the whole train step); the one-hot contraction is a fused
    # vectorized pass (num_class is small).
    num_class = logits.shape[-1]
    one_hot = jax.nn.one_hot(labels.astype(jnp.int32), num_class,
                             dtype=logits.dtype)
    true_logit = jnp.sum(logits * one_hot, axis=-1)
    return logz - true_logit


def weighted_softmax_xent(
    logits: jax.Array,      # (B, *S, C) float
    labels: jax.Array,      # (B, *S) int
    weights: jax.Array,     # (B, *S) float
    *,
    normalize: str = "mean",
) -> jax.Array:
    xent = softmax_xent_per_pixel(logits, labels)
    w = weights.astype(jnp.float32)
    if normalize == "mean":
        return jnp.mean(w * xent)
    if normalize == "weight_sum":
        return jnp.sum(w * xent) / jnp.maximum(jnp.sum(w), 1e-6)
    raise ValueError(f"unknown normalize mode {normalize!r}")
