"""Functional BatchNorm with TF1-compatible semantics.

Capability parity: the reference's BN wrappers + `UPDATE_OPS` moving-stat
updates (SURVEY.md §2.1 "Layer builders"; §7 hard part #2 "BatchNorm
fidelity"). TF1 `tf.layers.batch_normalization` defaults: momentum=0.99,
eps=1e-3, biased batch variance both for normalization and for the moving
update — reproduced here. There is no session/update-op machinery: the
running stats are explicit state threaded through the step function.

Cross-replica semantics: under pjit with a batch-sharded global array, the
batch-dim reductions below are global — XLA inserts the ICI allreduce, so
DP training computes *global-batch* statistics and matches the single-device
run on the concatenated batch bit-for-bit modulo reduction order (SURVEY.md
§4 distributed test contract). Under `shard_map` (per-shard locality), pass
``axis_name`` to recover the same global stats with an explicit `pmean`.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax


def bn_init(ch: int, param_dtype=jnp.float32) -> Tuple[dict, dict]:
    params = {
        "scale": jnp.ones((ch,), param_dtype),
        "bias": jnp.zeros((ch,), param_dtype),
    }
    state = {
        "mean": jnp.zeros((ch,), jnp.float32),
        "var": jnp.ones((ch,), jnp.float32),
    }
    return params, state


def batch_norm(
    x: jax.Array,
    params: dict,
    state: dict,
    *,
    train: bool,
    momentum: float = 0.99,
    eps: float = 1e-3,
    axis_name: Optional[str] = None,
) -> Tuple[jax.Array, dict]:
    """Normalize over all dims but the trailing channel dim; returns (y, state').

    Statistics are computed in float32 regardless of input dtype.
    """
    x32 = x.astype(jnp.float32)
    reduce_axes = tuple(range(x.ndim - 1))
    if train:
        mean = jnp.mean(x32, axis=reduce_axes)
        mean2 = jnp.mean(jnp.square(x32), axis=reduce_axes)
        if axis_name is not None:
            mean = lax.pmean(mean, axis_name)
            mean2 = lax.pmean(mean2, axis_name)
        var = mean2 - jnp.square(mean)  # biased, TF1-style
        new_state = {
            "mean": state["mean"] * momentum + mean * (1.0 - momentum),
            "var": state["var"] * momentum + var * (1.0 - momentum),
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    # Fold into one per-channel affine and apply in the activation dtype:
    # y = x*g + b with g = scale/sqrt(var+eps), b = bias - mean*g. Statistics
    # stay f32; the (large) elementwise pass runs in x.dtype (bf16 on the
    # TPU hot path) — one multiply-add instead of an f32 round-trip.
    g = lax.rsqrt(var + eps) * params["scale"].astype(jnp.float32)
    b = params["bias"].astype(jnp.float32) - mean * g
    y = x * g.astype(x.dtype) + b.astype(x.dtype)
    return y, new_state
