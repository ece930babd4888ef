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

    ``cfg.kernel_backend`` selects the conv implementation for eligible
    units (2D, 3x3, stride 1, 128-lane-aligned channels): 'xla'/'auto' use
    lax convs (the measured winner at 128 lanes — 93-104 TF/s vs the Pallas
    kernel's 79-82, benchmarks/RESULTS.md round 2; hence 'auto' == 'xla'),
    'pallas' uses ops/pallas/conv2d.fused_conv3x3_bn_relu_v2 for A/B runs.
    """
    from uresnet_tpu.ops.conv import conv, conv_transpose
    from uresnet_tpu.utils.dtypes import canonical_dtype

    if cfg.kernel_backend not in ("auto", "xla", "pallas"):
        raise ValueError(
            f"model.kernel_backend must be 'auto', 'xla' or 'pallas', "
            f"got {cfg.kernel_backend!r}")
    use_pallas = cfg.kernel_backend == "pallas"
    # interpret mode off-TPU so the A/B path stays testable on the CPU mesh
    interpret = jax.devices()[0].platform != "tpu"
    cd = canonical_dtype(cfg.compute_dtype)
    relu = jax.nn.relu

    def pallas_eligible(p, h, stride, transpose):
        w = p["w"]
        return (use_pallas and cfg.dims == 2 and not transpose
                and stride == 1 and w.shape[:2] == (3, 3)
                and h.shape[-1] % 128 == 0 and w.shape[-1] % 128 == 0
                and h.shape[1] % 8 == 0)

    def fused(p, h, residual=None, do_relu=True):
        from uresnet_tpu.ops.pallas.conv2d import fused_conv3x3_bn_relu_v2

        w = p["w"].astype(cd)
        ones = jnp.ones((w.shape[-1],), jnp.float32)
        return fused_conv3x3_bn_relu_v2(
            h.astype(cd), w, ones, p["b"].astype(jnp.float32),
            residual, relu=do_relu, interpret=interpret)

    def cbr(p, h, stride=1, transpose=False):
        if pallas_eligible(p, h, stride, transpose):
            return fused(p, h)
        if transpose:
            h = conv_transpose(h, p, stride=stride, dims=cfg.dims,
                               compute_dtype=cd)
        else:
            h = conv(h, p, stride=stride, dims=cfg.dims, compute_dtype=cd)
        return relu(h)

    def block(p, h):
        y = cbr(p["cb1"], h)
        sc = h if "proj" not in p else conv(h, p["proj"], dims=cfg.dims,
                                            compute_dtype=cd)
        if pallas_eligible(p["cb2"], y, 1, False):
            # conv + bias + residual-add + ReLU in ONE fused pass
            return fused(p["cb2"], y, residual=sc.astype(cd))
        y = conv(y, p["cb2"], dims=cfg.dims, compute_dtype=cd)
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
    from uresnet_tpu.ops.conv import head_precision

    hd = canonical_dtype(cfg.head_dtype) if cfg.head_dtype else cd
    logits = conv(h, folded["head"], dims=cfg.dims, compute_dtype=hd,
                  precision=head_precision(hd, cd))
    return logits.astype(jnp.float32)
