"""Packed (space-to-depth) U-ResNet forward: the TPU fast path (2D and 3D).

Measured motivation (benchmarks/RESULTS.md, v5e): convs at 512^2 x 16ch run
at ~2.7 TF/s (16/128 MXU lanes used); the same math packed to 256^2 x 64ch
runs at 30+ TF/s, and with one extra H-phase at 128ch at ~94 TF/s. In 3D,
packing 192^3 x 16 -> 96^3 x 128 additionally avoids an XLA tile-padding
blowup (8x expansion on a tiny-minor-dim gradient tensor) that OOMs the
canonical layout. This module runs every level whose channel count is below
``cfg.pack_threshold`` in packed space using the exact-equivalence kernels
of `uresnet_tpu.ops.pack` — same params, same function, different layout.
Equality with the canonical forward is pinned by tests/test_packed_model.py.

Layout rules per level l (f = base_filters * 2^l, P = 2^dims):
  encoder: unpacked input -> [s2d] -> packed blocks -> packed-down conv ->
           UNPACKED (S/2, 2f) output; skip saved packed.
  decoder: unpacked (S/2, 2f) -> packed-up conv -> packed (P*f on the S/2
           grid) -> concat packed skip -> packed blocks -> [d2s] -> unpacked,
           except level 0 which stays packed through the head conv.
  2D block runs whose P*f <= 64 get an extra factor-2 H pack (s2d_h) so the
  convs run at 2*P*f channels.
BatchNorm in packed space reshapes (..., P*C) -> (..., P, C) so statistics
aggregate over the spatial phases — identical to unpacked BN; running stats
keep their canonical (C,) shape (checkpoint-compatible).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from uresnet_tpu.config import ModelConfig
from uresnet_tpu.models.blocks import BlockCtx, conv_bn_apply, resblock_apply
from uresnet_tpu.ops.conv import _precision, conv, head_precision
from uresnet_tpu.ops.pack import (conv_packed, d2s_h, depth_to_space,
                                  pack_weight_concat, pack_weight_conv,
                                  pack_weight_conv_h, pack_weight_down,
                                  pack_weight_down_h, pack_weight_up,
                                  pack_weight_up_h, s2d_h, space_to_depth)

Params = Dict[str, Any]
State = Dict[str, Any]


def _packed_level(cfg: ModelConfig, lvl: int) -> bool:
    return cfg.base_filters * (2 ** lvl) < cfg.pack_threshold


def _hpack_level(cfg: ModelConfig, lvl: int) -> bool:
    # extra H phase (2D only) when the packed channel count still underfills
    # the 128 MXU lanes; resident at level 0 (see uresnet_apply_packed).
    P = 2 ** cfg.dims
    return (cfg.pack_extra_h and cfg.dims == 2 and _packed_level(cfg, lvl)
            and P * cfg.base_filters * (2 ** lvl) <= 64)


def loss_layout_phases(cfg: ModelConfig) -> int:
    """Spatial phases per packed-head logit position (1 = canonical head).

    Per-pixel losses/metrics are layout-invariant, so the train step can
    consume the head's PACKED logits directly (uresnet_apply(...,
    packed_logits=True)) and skip the d2s relayouts of the full-resolution
    logit tensor — measured ~9% of the 512^2 train step in data formatting
    (benchmarks/RESULTS.md round 2). Targets (label/weight/charge) must be
    packed to the matching layout with `pack_like_logits`."""
    if not cfg.pack or not _packed_level(cfg, 0):
        return 1
    P = 2 ** cfg.dims
    return 2 * P if _hpack_level(cfg, 0) else P


def pack_like_logits(x: jax.Array, cfg: ModelConfig) -> jax.Array:
    """Relayout a per-pixel target (B, *S, K) into the packed-head logit
    layout (B, *S', phases*K), phase-major — the exact channel order the
    packed head conv emits (pack_weight_conv[_h] phase nesting)."""
    x = space_to_depth(x, dims=cfg.dims)
    if _hpack_level(cfg, 0):
        x = s2d_h(x)
    return x


def _bn_packed(ctx: BlockCtx, p, s, x, train, phases: int):
    """BN over a packed tensor: aggregate statistics over the spatial
    phases so semantics equal unpacked BN; running stats stay (C,)."""
    C = x.shape[-1] // phases
    y, ns = ctx.bn(x.reshape(x.shape[:-1] + (phases, C)), p, s, train)
    return y.reshape(x.shape), ns


def _pack_same_w(w, dims, in_splits, hpack, splits_hpacked):
    """Packed (optionally H-packed) stride-1 kernel, honoring concat input
    layout: transient hpack concats BEFORE s2d_h (H phases span the whole
    concat -> conv_h of the concat-packed kernel); resident hpack concats
    ALREADY-H-packed tensors (H phases are per-tensor -> conv_h per slice,
    then concat)."""
    if in_splits and hpack and splits_hpacked:
        return jnp.concatenate(
            [pack_weight_conv_h(pack_weight_conv(w[..., a:b, :], dims))
             for a, b in in_splits], axis=-2)
    wp = (pack_weight_concat([w[..., a:b, :] for a, b in in_splits], dims)
          if in_splits else pack_weight_conv(w, dims))
    return pack_weight_conv_h(wp) if hpack else wp


def _conv_bn_packed(ctx, params, state, x, *, train, relu=True,
                    mode="same", in_splits=None, hpack=False,
                    splits_hpacked=False):
    """Packed conv + BN + ReLU. mode: 'same' | 'down' | 'up' |
    'down_h' (H-packed in AND out) | 'up_h' (unpacked in, H-packed out).
    hpack (2D only): input/output carry an extra H phase."""
    w = params["conv"]["w"]
    dims = ctx.dims
    P = 2 ** dims
    prec = _precision(ctx.compute_dtype)
    if mode == "same":
        wp = _pack_same_w(w, dims, in_splits, hpack, splits_hpacked)
        y = conv_packed(x, wp, padding="SAME", dims=dims,
                        compute_dtype=ctx.compute_dtype, precision=prec)
        y, ns = _bn_packed(ctx, params["bn"], state["bn"], y, train,
                           phases=2 * P if hpack else P)
    elif mode == "down":
        y = conv_packed(x, pack_weight_down(w, dims), padding=(0, 1),
                        dims=dims, compute_dtype=ctx.compute_dtype,
                        precision=prec)
        y, ns = ctx.bn(y, params["bn"], state["bn"], train)  # unpacked out
    elif mode == "down_h":
        # consumes H-packed packed input; emits the H-PACKED down output
        y = conv_packed(x, pack_weight_down_h(pack_weight_down(w, dims)),
                        padding=(0, 1), dims=dims,
                        compute_dtype=ctx.compute_dtype, precision=prec)
        y, ns = _bn_packed(ctx, params["bn"], state["bn"], y, train,
                           phases=2)
    elif mode == "up":
        y = conv_packed(x, pack_weight_up(w, dims), padding=(1, 0),
                        dims=dims, compute_dtype=ctx.compute_dtype,
                        precision=prec)
        y, ns = _bn_packed(ctx, params["bn"], state["bn"], y, train, phases=P)
    elif mode == "up_h":
        # consumes the UNPACKED coarse input; emits H-packed packed output
        y = conv_packed(x, pack_weight_up_h(pack_weight_up(w, dims)),
                        padding=((1, 0), (1, 0)), stride=(2, 1), dims=dims,
                        compute_dtype=ctx.compute_dtype, precision=prec)
        y, ns = _bn_packed(ctx, params["bn"], state["bn"], y, train,
                           phases=2 * P)
    else:
        raise ValueError(mode)
    if relu:
        y = jax.nn.relu(y)
    return y, {"bn": ns}


def _resblock_packed(ctx, params, state, x, *, train, in_splits=None,
                     hpack=False, splits_hpacked=False):
    y, s1 = _conv_bn_packed(ctx, params["cb1"], state["cb1"], x, train=train,
                            in_splits=in_splits, hpack=hpack,
                            splits_hpacked=splits_hpacked)
    y, s2 = _conv_bn_packed(ctx, params["cb2"], state["cb2"], y, train=train,
                            relu=False, hpack=hpack)
    shortcut = x
    if "proj" in params:
        wp = _pack_same_w(params["proj"]["w"], ctx.dims, in_splits, hpack,
                          splits_hpacked)
        shortcut = conv_packed(x, wp, padding="SAME", dims=ctx.dims,
                               compute_dtype=ctx.compute_dtype,
                               precision=_precision(ctx.compute_dtype))
    y = jax.nn.relu(y + shortcut.astype(y.dtype))
    return y, {"cb1": s1, "cb2": s2}


def uresnet_apply_packed(
    params: Params,
    state: State,
    x: jax.Array,
    *,
    cfg: ModelConfig,
    train: bool,
    axis_name: Optional[str] = None,
    packed_logits: bool = False,
) -> Tuple[jax.Array, State]:
    """Forward with packed low-channel levels; numerically equal to
    `uresnet_apply` (up to f32 rounding in the relayout).

    ``packed_logits``: return the head's logits in their PACKED layout
    (B, *S', phases*num_class, compute dtype) instead of relayouting to
    canonical full-resolution f32 — the train-loss fast path (see
    `loss_layout_phases`). No-op when level 0 is not packed."""
    from uresnet_tpu.models.uresnet import _ctx  # shared BlockCtx builder

    dims = cfg.dims
    P = 2 ** dims
    ctx = _ctx(cfg, axis_name)
    new_state: State = {}

    def packed_level(lvl: int) -> bool:
        return _packed_level(cfg, lvl)

    def hpack_level(lvl: int) -> bool:
        return _hpack_level(cfg, lvl)

    from uresnet_tpu.models.uresnet import remat_wrappers

    level, block = remat_wrappers(cfg.remat)
    # Residency (round 2, bench-driven): at the OUTERMOST level the hpack
    # layout stays resident across stem -> enc0 blocks -> down0 and
    # up0 -> dec0 blocks -> head (pack_weight_{down,up}_h / conv_h-packed
    # stem+head), eliminating the per-run s2d_h/d2s_h relayouts and running
    # those convs at 2x the lanes too.
    resident = hpack_level(0)

    def run_blocks(prefix, h, packed, first_in_splits=None, hpack=False,
                   res=False, splits_hpacked=False):
        """`hpack`: blocks run in H-packed layout. `res`: the input/output
        already ARE H-packed (resident) — skip the transient relayouts."""
        sub = {}
        if hpack and not res:
            h = s2d_h(h)
        for b in range(cfg.blocks_per_level):
            name = f"{prefix}_b{b}"
            splits = first_in_splits if b == 0 else None
            if packed:
                fn = lambda hh, name=name, splits=splits: _resblock_packed(
                    ctx, params[name], state[name], hh, train=train,
                    in_splits=splits, hpack=hpack,
                    splits_hpacked=splits_hpacked)
            else:
                fn = lambda hh, name=name: resblock_apply(
                    ctx, params[name], state[name], hh, train=train)
            h, sub[name] = block(fn)(h)
        if hpack and not res:
            h = d2s_h(h)
        return h, sub

    # stem
    if packed_level(0):
        h = space_to_depth(x, dims=dims)
        if resident:
            h = s2d_h(h)
        h, s = _conv_bn_packed(ctx, params["stem"], state["stem"], h,
                               train=train, hpack=resident)
    else:
        h, s = conv_bn_apply(ctx, params["stem"], state["stem"], x,
                             train=train)
    new_state["stem"] = s

    skips, skips_packed = [], []
    for lvl in range(cfg.depth):
        pk = packed_level(lvl)

        def enc(h, lvl=lvl, pk=pk):
            res_lvl = resident and lvl == 0
            if pk and not (lvl == 0 and packed_level(0)):
                h = space_to_depth(h, dims=dims)
            h, sub = run_blocks(f"enc{lvl}", h, pk, hpack=hpack_level(lvl),
                                res=res_lvl)
            skip = h          # res_lvl: saved H-PACKED (dec0 consumes as-is)
            name = f"down{lvl}"
            if pk:
                dn = lambda hh: _conv_bn_packed(
                    ctx, params[name], state[name], hh, train=train,
                    mode="down_h" if res_lvl else "down")
            else:
                dn = lambda hh: conv_bn_apply(ctx, params[name], state[name],
                                              hh, stride=2, train=train)
            hs, s = block(dn)(h)
            if res_lvl:       # hand the next level the canonical layout
                hs = d2s_h(hs)
            sub[name] = s
            return hs, skip, sub

        h, skip, sub = level(enc)(h)
        skips.append(skip)
        skips_packed.append(pk)
        new_state.update(sub)

    h, sub = level(lambda h: run_blocks("mid", h, False))(h)
    new_state.update(sub)

    for lvl in reversed(range(cfg.depth)):
        pk = packed_level(lvl)
        fl = cfg.base_filters * (2 ** lvl)

        def dec(h, skip, lvl=lvl, pk=pk, fl=fl):
            name = f"up{lvl}"
            sub = {}
            res_lvl = resident and lvl == 0
            if pk:
                h, s = block(
                    lambda hh: _conv_bn_packed(
                        ctx, params[name], state[name], hh, train=train,
                        mode="up_h" if res_lvl else "up"))(h)
                sub[name] = s
                skip_p = (skip if skips_packed[lvl]
                          else space_to_depth(skip, dims=dims))
                h = jnp.concatenate([h, skip_p.astype(h.dtype)], axis=-1)
                splits = ((0, fl), (fl, 2 * fl))
                h, bsub = run_blocks(f"dec{lvl}", h, True,
                                     first_in_splits=splits,
                                     hpack=hpack_level(lvl), res=res_lvl,
                                     splits_hpacked=res_lvl)
                if lvl != 0:
                    h = depth_to_space(h, dims=dims)
            else:
                # Even at high channel counts the phase-decomposed upsample
                # beats lax.conv_transpose: the packed 2^dims-tap conv + d2s
                # does 2^dims/ (3/2)^dims fewer MACs than the lhs-dilated
                # form and identical numerics (tests/test_pack.py).
                def up(hh):
                    w = params[name]["conv"]["w"]
                    y = conv_packed(hh, pack_weight_up(w, dims),
                                    padding=(1, 0), dims=dims,
                                    compute_dtype=ctx.compute_dtype,
                                    precision=_precision(ctx.compute_dtype))
                    y = depth_to_space(y, dims=dims)
                    y, s = ctx.bn(y, params[name]["bn"], state[name]["bn"],
                                  train)
                    return jax.nn.relu(y), s
                h, s = block(up)(h)
                sub[name] = {"bn": s}
                h = jnp.concatenate([h, skip.astype(h.dtype)], axis=-1)
                h, bsub = run_blocks(f"dec{lvl}", h, False)
            sub.update(bsub)
            return h, sub

        h, sub = level(dec)(h, skips[lvl])
        new_state.update(sub)

    # cfg.head_dtype (e.g. float32): unquantized logits — the bf16 logits
    # rounding makes near-saturated weighted-xent residuals ulp-chaotic
    # late in training (RESULTS.md round 4 "3D bf16"); the head is ~1% of
    # model FLOPs so the dtype bump is ~free in either layout
    head_cdt = (jnp.dtype(cfg.head_dtype) if cfg.head_dtype
                else ctx.compute_dtype)
    # raised head dtype -> DEFAULT precision: same bf16 MXU pass, f32
    # accumulation/output (unquantized logits at ~bf16 cost; measured
    # 2.21 vs 2.03 vol/s for HIGHEST at 192^3 — RESULTS.md round 4)
    head_prec = (head_precision(head_cdt, ctx.compute_dtype)
                 or _precision(head_cdt))
    if packed_level(0):
        wp = pack_weight_conv(params["head"]["w"], dims)
        if resident:
            wp = pack_weight_conv_h(wp)
        logits = conv_packed(h, wp, padding="SAME", dims=dims,
                             compute_dtype=head_cdt,
                             precision=head_prec)
        if "b" in params["head"]:
            bias = params["head"]["b"]
            logits = logits + jnp.tile(bias, 2 * P if resident else P) \
                .astype(logits.dtype)
        if packed_logits:
            # loss fast path: stay packed (phase-major channels), keep the
            # compute dtype — the loss casts to f32 itself
            return logits, new_state
        if resident:
            logits = d2s_h(logits)
        logits = depth_to_space(logits, dims=dims)
    else:
        logits = conv(h, params["head"], dims=dims,
                      compute_dtype=head_cdt,
                      precision=head_precision(head_cdt, ctx.compute_dtype))
    return logits.astype(jnp.float32), new_state
