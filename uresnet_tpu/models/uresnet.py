"""U-ResNet: U-Net topology with ResNet-style conv stages, unified 2D/3D.

Capability parity (SURVEY.md §3.3 forward-pass contract; reference
`lib/uresnet.py` `build(...)` [K:med]):

    input (B, *S, C_in)
    stem: conv3(base_f) - BN - ReLU
    for level l in 0..depth-1:
        resblock x blocks_per_level @ f = base_f * 2^l
        skip[l] = activations            # saved pre-downsample
        downsample: conv3 stride2 -> 2f, BN, ReLU
    bottleneck: resblock x blocks_per_level @ base_f * 2^depth
    for level l in depth-1..0:
        conv_transpose stride2 -> base_f * 2^l, BN, ReLU
        concat(skip[l])                  # channel concat, U-Net style
        resblock x blocks_per_level      # first block projects 2f -> f
    conv(final_kernel) -> num_class logits

Design (not a TF1 translation, SURVEY.md §7): pure `init`/`apply` functions
over nested-dict pytrees; BN running stats are explicit state; `remat`
wraps each level in `jax.checkpoint` to trade FLOPs for HBM on 3D volumes
(SURVEY.md §7 hard part #5).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from uresnet_tpu.config import ModelConfig
from uresnet_tpu.models.blocks import (
    BlockCtx,
    conv_bn_apply,
    conv_bn_init,
    resblock_apply,
    resblock_init,
)
from uresnet_tpu.ops.conv import conv, conv_init
from uresnet_tpu.utils.dtypes import canonical_dtype

Params = Dict[str, Any]
State = Dict[str, Any]


def remat_wrappers(remat):
    """(level, block) wrappers for cfg.remat: False | True/'level' | 'block'.

    'level' checkpoints each U-Net level (saves only level inputs; the whole
    level is recomputed — and all its intermediates are live — during its
    backward). 'block' checkpoints each resblock/down/up stage instead:
    more saved boundaries but a much smaller recompute working set, which is
    what bounds peak HBM during the backward of the high-resolution levels
    (SURVEY.md §7 hard part #5)."""
    mode = remat if isinstance(remat, str) else ("level" if remat else "none")
    if mode not in ("none", "level", "block"):
        raise ValueError(f"unknown remat mode {remat!r}")
    ident = lambda fn: fn
    level = jax.checkpoint if mode == "level" else ident
    block = jax.checkpoint if mode == "block" else ident
    return level, block


def _ctx(cfg: ModelConfig, axis_name: Optional[str] = None) -> BlockCtx:
    return BlockCtx(
        dims=cfg.dims,
        compute_dtype=canonical_dtype(cfg.compute_dtype),
        param_dtype=canonical_dtype(cfg.param_dtype),
        bn_momentum=cfg.bn_momentum,
        bn_eps=cfg.bn_eps,
        axis_name=axis_name,
    )


def uresnet_init(key: jax.Array, cfg: ModelConfig) -> Tuple[Params, State]:
    """Build the param/state pytrees. Structure is keyed by strings so the
    pytree is stable across configs of the same (depth, blocks_per_level)."""
    pd = canonical_dtype(cfg.param_dtype)
    keys = iter(jax.random.split(key, 4 + 4 * cfg.depth * (cfg.blocks_per_level + 2)))
    params: Params = {}
    state: State = {}

    f = cfg.base_filters
    params["stem"], state["stem"] = conv_bn_init(
        next(keys), 3, cfg.in_channels, f, dims=cfg.dims, param_dtype=pd)

    for lvl in range(cfg.depth):
        fl = cfg.base_filters * (2 ** lvl)
        for b in range(cfg.blocks_per_level):
            name = f"enc{lvl}_b{b}"
            params[name], state[name] = resblock_init(
                next(keys), fl, fl, dims=cfg.dims, param_dtype=pd)
        name = f"down{lvl}"
        params[name], state[name] = conv_bn_init(
            next(keys), 3, fl, fl * 2, dims=cfg.dims, param_dtype=pd)

    fb = cfg.base_filters * (2 ** cfg.depth)
    for b in range(cfg.blocks_per_level):
        name = f"mid_b{b}"
        params[name], state[name] = resblock_init(
            next(keys), fb, fb, dims=cfg.dims, param_dtype=pd)

    for lvl in reversed(range(cfg.depth)):
        fl = cfg.base_filters * (2 ** lvl)
        name = f"up{lvl}"
        params[name], state[name] = conv_bn_init(
            next(keys), 3, fl * 2, fl, dims=cfg.dims, param_dtype=pd)
        for b in range(cfg.blocks_per_level):
            name = f"dec{lvl}_b{b}"
            in_ch = fl * 2 if b == 0 else fl  # concat(skip) doubles channels
            params[name], state[name] = resblock_init(
                next(keys), in_ch, fl, dims=cfg.dims, param_dtype=pd)

    params["head"] = conv_init(next(keys), cfg.final_kernel,
                               cfg.base_filters, cfg.num_class,
                               dims=cfg.dims, use_bias=True, param_dtype=pd)
    return params, state


def uresnet_apply(
    params: Params,
    state: State,
    x: jax.Array,
    *,
    cfg: ModelConfig,
    train: bool,
    axis_name: Optional[str] = None,
    packed_logits: bool = False,
) -> Tuple[jax.Array, State]:
    """Forward pass: (B, *spatial, C_in) -> float32 logits (B, *spatial, num_class).

    Returns updated BN state (identical to input state when ``train=False``).
    With ``cfg.pack`` (2D), low-channel levels run in space-to-depth packed
    layout (models/packed.py) — numerically equivalent, much faster on TPU.
    ``packed_logits`` (packed models only): return logits in the packed-head
    layout for the loss fast path (models/packed.py loss_layout_phases).
    """
    if cfg.pack:
        from uresnet_tpu.models.packed import uresnet_apply_packed

        return uresnet_apply_packed(params, state, x, cfg=cfg, train=train,
                                    axis_name=axis_name,
                                    packed_logits=packed_logits)
    ctx = _ctx(cfg, axis_name)
    new_state: State = {}
    level, block = remat_wrappers(cfg.remat)

    def run_blocks(prefix: str, h):
        sub = {}
        for b in range(cfg.blocks_per_level):
            name = f"{prefix}_b{b}"
            h, sub[name] = block(
                lambda hh, name=name: resblock_apply(
                    ctx, params[name], state[name], hh, train=train))(h)
        return h, sub

    h, new_state["stem"] = conv_bn_apply(ctx, params["stem"], state["stem"],
                                         x, train=train)

    skips = []
    for lvl in range(cfg.depth):
        def enc(h, lvl=lvl):
            h, sub = run_blocks(f"enc{lvl}", h)
            skip = h
            name = f"down{lvl}"
            h, s = block(
                lambda hh: conv_bn_apply(ctx, params[name], state[name], hh,
                                         stride=2, train=train))(h)
            sub[name] = s
            return h, skip, sub
        h, skip, sub = level(enc)(h)
        skips.append(skip)
        new_state.update(sub)

    h, sub = level(lambda h: run_blocks("mid", h))(h)
    new_state.update(sub)

    for lvl in reversed(range(cfg.depth)):
        def dec(h, skip, lvl=lvl):
            name = f"up{lvl}"
            h, s = block(
                lambda hh: conv_bn_apply(ctx, params[name], state[name], hh,
                                         stride=2, train=train,
                                         transpose=True))(h)
            sub = {name: s}
            h = jnp.concatenate([h, skip.astype(h.dtype)], axis=-1)
            h, bsub = run_blocks(f"dec{lvl}", h)
            sub.update(bsub)
            return h, sub
        h, sub = level(dec)(h, skips[lvl])
        new_state.update(sub)

    from uresnet_tpu.ops.conv import head_precision

    hd = jnp.dtype(cfg.head_dtype) if cfg.head_dtype else ctx.compute_dtype
    logits = conv(h, params["head"], dims=cfg.dims, compute_dtype=hd,
                  precision=head_precision(hd, ctx.compute_dtype))
    return logits.astype(jnp.float32), new_state


def param_count(params: Params) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(params))
