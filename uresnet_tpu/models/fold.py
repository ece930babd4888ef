"""Inference-time BatchNorm folding.

SURVEY.md §2.2 names "conv-BN-ReLU epilogue fusion" as a rebuild target. In
inference mode BN is an affine map with frozen stats, so it folds exactly
into the preceding conv's weights:

    BN(conv(x, w)) = conv(x, w * g) + b,   g = scale / sqrt(var + eps)
                                           b = bias - mean * g

yielding a pure conv(+bias)+ReLU network — fewer HBM round trips and fused
epilogues for the batched multi-plane inference path (BASELINE config 3).
Verified equal to the unfolded eval forward in tests/test_fold.py.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from uresnet_tpu.config import ModelConfig


def _fold_unit(conv_p: dict, bn_p: dict, bn_s: dict, eps: float) -> dict:
    g = bn_p["scale"].astype(jnp.float32) * jax.lax.rsqrt(
        bn_s["var"].astype(jnp.float32) + eps)
    b = bn_p["bias"].astype(jnp.float32) - bn_s["mean"].astype(jnp.float32) * g
    w = conv_p["w"].astype(jnp.float32) * g  # broadcast over out-channel dim
    out = {"w": w.astype(conv_p["w"].dtype),
           "b": b.astype(conv_p["w"].dtype)}
    if "b" in conv_p:
        out["b"] = (conv_p["b"].astype(jnp.float32) * g + b).astype(
            conv_p["w"].dtype)
    return out


def fold_batchnorm(params: Dict[str, Any], state: Dict[str, Any],
                   cfg: ModelConfig) -> Dict[str, Any]:
    """Fold every conv+BN unit's stats into conv weights+bias.

    Returns a params tree for `uresnet_apply_folded`: same keys, each
    conv-BN pair replaced by a biased conv; projection shortcuts and the
    head conv (no BN) pass through unchanged.
    """
    folded: Dict[str, Any] = {}
    for name, p in params.items():
        if name == "head":
            folded[name] = p
        elif "cb1" in p:  # residual block
            folded[name] = {
                "cb1": _fold_unit(p["cb1"]["conv"], p["cb1"]["bn"],
                                  state[name]["cb1"]["bn"], cfg.bn_eps),
                "cb2": _fold_unit(p["cb2"]["conv"], p["cb2"]["bn"],
                                  state[name]["cb2"]["bn"], cfg.bn_eps),
            }
            if "proj" in p:
                folded[name]["proj"] = p["proj"]
        else:  # conv_bn unit (stem / down / up)
            folded[name] = _fold_unit(p["conv"], p["bn"], state[name]["bn"],
                                      cfg.bn_eps)
    return folded


def uresnet_apply_folded(folded: Dict[str, Any], x: jax.Array, *,
                         cfg: ModelConfig) -> jax.Array:
    """Inference forward over BN-folded params: conv(+bias)+ReLU chains.

    Mirrors uresnet_apply(train=False) exactly (tests/test_fold.py pins the
    equivalence in f32).
    """
    from uresnet_tpu.ops.conv import conv, conv_transpose
    from uresnet_tpu.utils.dtypes import canonical_dtype

    cd = canonical_dtype(cfg.compute_dtype)
    relu = jax.nn.relu

    def cbr(p, h, stride=1, transpose=False):
        if transpose:
            h = conv_transpose(h, p, stride=stride, dims=cfg.dims,
                               compute_dtype=cd)
        else:
            h = conv(h, p, stride=stride, dims=cfg.dims, compute_dtype=cd)
        return relu(h)

    def block(p, h):
        y = cbr(p["cb1"], h)
        y = conv(y, p["cb2"], dims=cfg.dims, compute_dtype=cd)
        sc = h if "proj" not in p else conv(h, p["proj"], dims=cfg.dims,
                                            compute_dtype=cd)
        return relu(y + sc.astype(y.dtype))

    h = cbr(folded["stem"], x)
    skips = []
    for lvl in range(cfg.depth):
        for b in range(cfg.blocks_per_level):
            h = block(folded[f"enc{lvl}_b{b}"], h)
        skips.append(h)
        h = cbr(folded[f"down{lvl}"], h, stride=2)
    for b in range(cfg.blocks_per_level):
        h = block(folded[f"mid_b{b}"], h)
    for lvl in reversed(range(cfg.depth)):
        h = cbr(folded[f"up{lvl}"], h, stride=2, transpose=True)
        h = jnp.concatenate([h, skips[lvl].astype(h.dtype)], axis=-1)
        for b in range(cfg.blocks_per_level):
            h = block(folded[f"dec{lvl}_b{b}"], h)
    logits = conv(h, folded["head"], dims=cfg.dims, compute_dtype=cd)
    return logits.astype(jnp.float32)
