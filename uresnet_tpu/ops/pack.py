"""Space-to-depth packing: exact-equivalence layout transform for the
high-resolution, low-channel levels (2D and 3D).

Why (measured, benchmarks/RESULTS.md on v5e): a 512^2 x 16-channel conv runs
at ~2.7 TF/s because 16 output channels fill 16 of the MXU's 128 lanes; the
same FLOPs at 64+ channels run at 30-120 TF/s. Packing r x r spatial phases
into channels (512^2 x C -> 256^2 x 4C in 2D; 192^3 x C -> 96^3 x 8C in 3D)
moves the low-channel levels into the efficient regime — and in 3D also
avoids pathological XLA tile-padding blowups on tiny-minor-dim gradient
tensors. The transform is EXACT: packed kernels are a pure linear relabeling of the
canonical weights, so params/checkpoints stay in reference layout and tests
pin equality (f32) of packed vs unpacked forward.

Math (r=2 per spatial dim, odd k, SAME), per dim:
    Y[2i+p] = sum_dy X[2i+p+dy-k//2] W[dy]
    row 2i+p+dy-k//2 = 2(i+a)+p'  =>  dy = 2a + p' - p + k//2
so a stride-1 k-odd conv becomes a packed k conv over (2^dims)C channels
(out-of-range dy are structural zeros); a stride-2 k=3 conv (SAME, pad_lo=0)
becomes a packed k=2 conv with (0,1) padding emitting UNPACKED output; a
k=3 s=2 transpose conv becomes a packed k=2 conv with (1,0) padding emitting
PACKED output. All verified against the lax reference ops in
tests/test_pack.py (2D and 3D).

Weight packing is a tiny einsum against static 0/1 per-dim tensors (see
_einsum_pack): its forward AND backward are fused vectorized contractions.
(History: a naive .at[].set scatter blew up XLA compile time; an
index-gather form cost ~33 ms/step in gather + backward scatter-add.)
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

R = 2  # pack factor per spatial dim

_MAP_CACHE: Dict[Tuple, Tuple[np.ndarray, np.ndarray]] = {}


def space_to_depth(x: jax.Array, r: int = R, dims: int = 2, *,
                   _force_path: str | None = None) -> jax.Array:
    """(B, *S, C) -> (B, *S/r, r^dims * C); channel order phase-major
    (p_0, ..., p_{dims-1}, c).

    Two bit-identical implementations, picked by lane fill (measured on
    v5e, benchmarks/RESULTS.md round 2): the innermost spatial dim can be
    packed by a PURE RESHAPE (row-major (w, c) order makes the w-pair the
    channel-major index), leaving only cheap row-granular transposes for
    the outer dims (~870 GB/s vs ~75 GB/s for the naive all-dims
    transpose) — but the reshape itself relayouts the (minor-dim) tiling,
    which only beats the transpose when the merged minor dim r*C fills the
    128 lanes. Hence: reshape path iff r*C >= 128.

    ``_force_path`` ('reshape'|'transpose') overrides the lane heuristic —
    test hook only, so CI pins both branches bit-identical at triggering
    channel counts (tests/test_pack.py)."""
    B = x.shape[0]
    S = x.shape[1:1 + dims]
    C = x.shape[-1]
    use_reshape = (r * C >= 128 if _force_path is None
                   else _force_path == "reshape")
    if use_reshape:
        # innermost dim: free-ish reshape; outer dims: row transposes,
        # innermost-first so the final order is phase-major (p_0,...,c)
        x = x.reshape(x.shape[:-2] + (x.shape[-2] // r, r * C))
        for ax in range(dims - 1, 0, -1):
            s = x.shape
            Cc = s[-1]
            x = x.reshape(s[:ax] + (s[ax] // r, r) + s[ax + 1:])
            perm = [i for i in range(x.ndim) if i != ax + 1]
            perm.insert(len(perm) - 1, ax + 1)
            x = x.transpose(perm).reshape(
                s[:ax] + (s[ax] // r,) + s[ax + 1:-1] + (r * Cc,))
        return x
    shape = (B,)
    for s in S:
        shape += (s // r, r)
    shape += (C,)
    x = x.reshape(shape)
    # (B, s0/r, r, s1/r, r, ..., C) -> (B, s0/r, s1/r, ..., r, r, ..., C)
    perm = (0,) + tuple(1 + 2 * d for d in range(dims)) \
        + tuple(2 + 2 * d for d in range(dims)) + (1 + 2 * dims,)
    x = x.transpose(perm)
    out_shape = (B,) + tuple(s // r for s in S) + (r ** dims * C,)
    return x.reshape(out_shape)


def depth_to_space(x: jax.Array, r: int = R, dims: int = 2, *,
                   _force_path: str | None = None) -> jax.Array:
    """Inverse of space_to_depth (same hybrid implementation choice: the
    reshape path wins iff the still-merged minor dim stays >= 128 lanes,
    i.e. packed channels >= 128 * r^(dims-1)). ``_force_path`` as in
    space_to_depth (test hook)."""
    B = x.shape[0]
    Sp = x.shape[1:1 + dims]
    C = x.shape[-1] // (r ** dims)
    use_reshape = (x.shape[-1] // (r ** (dims - 1)) >= 128
                   if _force_path is None else _force_path == "reshape")
    if use_reshape:
        for ax in range(1, dims):
            s = x.shape
            Cc = s[-1] // r
            x = x.reshape(s[:-1] + (r, Cc))
            perm = [i for i in range(x.ndim) if i != x.ndim - 2]
            perm.insert(ax + 1, x.ndim - 2)
            x = x.transpose(perm).reshape(
                s[:ax] + (s[ax] * r,) + s[ax + 1:-1] + (Cc,))
        return x.reshape(x.shape[:-2] + (x.shape[-2] * r, x.shape[-1] // r))
    x = x.reshape((B,) + Sp + (r,) * dims + (C,))
    perm = [0]
    for d in range(dims):
        perm += [1 + d, 1 + dims + d]
    perm += [1 + 2 * dims]
    x = x.transpose(perm)
    return x.reshape((B,) + tuple(s * r for s in Sp) + (C,))


# Packing as an einsum against static 0/1 per-dim tensors T[A, p', p, dy]:
#     pw[A,B,(u,v,i),(p,q,o)] = sum_{d,e} Ty[A,u,p,d] Tx[B,v,q,e] w[d,e,i,o]
# Profiled motivation (benchmarks/RESULTS.md): the index-gather form lowers
# to gather + scatter-add (backward) which together cost ~33 ms/step at
# 512^2/b32 on v5e; the einsum form is a tiny fused contraction with an
# einsum backward — no scatter.


def _dim_T(kind: str, k: int) -> np.ndarray:
    key = ("T", kind, k)
    if key not in _MAP_CACHE:
        kp, pi, po, dy, valid = _dim_tables(kind, k)
        T = np.zeros((kp, pi, po, k), np.float32)
        for A in range(kp):
            for u in range(pi):
                for p in range(po):
                    if valid[A, u, p]:
                        T[A, u, p, dy[A, u, p]] = 1.0
        _MAP_CACHE[key] = (T, None)
    return _MAP_CACHE[key][0]


def _einsum_pack(w: jax.Array, kind: str, dims: int) -> jax.Array:
    # Precision.HIGHEST is LOAD-BEARING, not a nicety. Each packed output
    # slot selects exactly ONE canonical weight (or 0), so in true f32 the
    # forward is an EXACT relabeling and the backward an EXACT f32
    # partial-sum. At DEFAULT precision the TPU lowers these einsums
    # through single-pass bf16 dots: the forward rounding is masked (the
    # conv casts kernels to bf16 anyway) but the BACKWARD quantizes every
    # packed-slot weight-grad partial to bf16 BEFORE the sum into the
    # canonical slot — measured rel error up to ~4 on cancelling entries —
    # silently undoing ops/conv.py's f32 weight-grad path on packed levels
    # only. Removing that asymmetry is necessary but measured NOT
    # sufficient for the packed-bf16 3D divergence (a 600-step 96^3 run
    # with HIGHEST still diverges — benchmarks/RESULTS.md "3D bf16");
    # CPU CI never sees the quantization because CPU default precision is
    # already f32-exact. The einsums are weight-sized (k^dims * Ci * Co),
    # so HIGHEST costs nothing measurable.
    k = w.shape[0]
    ci, co = w.shape[-2], w.shape[-1]
    T = jnp.asarray(_dim_T(kind, k), w.dtype)
    kp, pi, po = T.shape[0], T.shape[1], T.shape[2]
    hi = lax.Precision.HIGHEST
    if dims == 2:
        out = jnp.einsum("aupd,bvqe,deio->abuvipqo", T, T, w, precision=hi)
    elif dims == 3:
        out = jnp.einsum("aupd,bvqe,cwrf,defio->abcuvwipqro", T, T, T, w,
                         precision=hi)
    else:
        raise ValueError(dims)
    return out.reshape((kp,) * dims + (pi ** dims * ci, po ** dims * co))


def _dim_tables(kind: str, k: int):
    """Per-dim (kp, pi, po, dy[kp, pi, po], valid) tables."""
    if kind == "same":
        kp, pi, po = k, R, R
        A = np.arange(kp)[:, None, None]
        pp = np.arange(pi)[None, :, None]
        p = np.arange(po)[None, None, :]
        dy = 2 * (A - kp // 2) + pp - p + k // 2
    elif kind == "down":
        kp, pi, po = 2, R, 1
        A = np.arange(kp)[:, None, None]
        pp = np.arange(pi)[None, :, None]
        dy = np.broadcast_to(2 * A + pp, (kp, pi, po)).copy()
    elif kind == "up":
        kp, pi, po = 2, 1, R
        # y[2t+p]: p=0 reads x[t-1] w[0] (tap A=0) and x[t] w[2] (A=1);
        # p=1 reads x[t] w[1] (A=1). Input padding (1,0).
        dy = np.full((kp, pi, po), -1)
        for (a, pv), d in {(0, 0): 0, (1, 0): 2, (1, 1): 1}.items():
            dy[a, 0, pv] = d
    elif kind == "down_h":
        # H-pack BOTH sides of the packed-down H kernel (k=2, pad (0,1),
        # stride 1): ydh[v] = (yd[2v], yd[2v+1]) reads xh[v+a] phase u via
        # down-tap dy = 2a + u - p. Stays k=2, pad (0,1), stride 1 on the
        # hpack grid; output is the H-packed down result.
        kp, pi, po = 2, R, R
        A = np.arange(kp)[:, None, None]
        pp = np.arange(pi)[None, :, None]
        p = np.arange(po)[None, None, :]
        dy = 2 * A + pp - p
    elif kind == "up_h":
        # H-pack the OUTPUT of the packed-up H kernel (k=2, pad (1,0),
        # stride 1): yuh[v] = (yu[2v], yu[2v+1]) reads the UNPACKED coarse
        # input x[2v + A - 1], A in 0..2 — i.e. a k=3 STRIDE-2 pad (1,0)
        # conv on the coarse grid; up-tap dy = A - p.
        kp, pi, po = 3, 1, R
        A = np.arange(kp)[:, None, None]
        p = np.arange(po)[None, None, :]
        dy = np.broadcast_to(A - p, (kp, pi, po)).copy()
    else:
        raise ValueError(kind)
    valid = (dy >= 0) & (dy < k)
    return kp, pi, po, np.clip(dy, 0, k - 1), valid


def pack_weight_conv(w: jax.Array, dims: int = 2) -> jax.Array:
    """(k..k, Ci, Co), k odd, stride-1 SAME -> packed (k..k, P*Ci, P*Co)."""
    return _einsum_pack(w, "same", dims)


def pack_weight_down(w: jax.Array, dims: int = 2) -> jax.Array:
    """k=3 stride-2 SAME (pad_lo=0) -> packed (2..2, P*Ci, Co); output
    UNPACKED on the packed grid. Use padding (0,1) per dim."""
    return _einsum_pack(w, "down", dims)


def pack_weight_up(w: jax.Array, dims: int = 2) -> jax.Array:
    """k=3 s=2 SAME transpose conv -> packed (2..2, Ci, P*Co); input
    UNPACKED (half-res), output PACKED. Use padding (1,0) per dim."""
    return _einsum_pack(w, "up", dims)


def pack_weight_concat(ws: Sequence[jax.Array], dims: int = 2) -> jax.Array:
    """Packed stride-1 kernel for an input that is a CONCAT of packed
    tensors: pack each input-channel slice separately, then concat —
    phase-major layout is per-tensor, not global."""
    return jnp.concatenate([pack_weight_conv(w, dims) for w in ws], axis=-2)


# -- 1D (H-only) packing: a second factor-2 pack for 2D block runs whose
# packed channel count is still below the 128 MXU lanes. Composes with the
# 2D pack: s2d_h(r2-packed x) runs convs at 8x phases / 8C channels.
# Measured on v5e (benchmarks/RESULTS.md): the relayout streams at ~870 GB/s
# (C stays lane-aligned) and the 128-ch conv runs ~1.55x faster per
# equivalent work than the 64-ch one.


def s2d_h(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, H/2, W, 2C), channel index p*C + c."""
    B, H, W, C = x.shape
    return x.reshape(B, H // 2, 2, W, C).transpose(0, 1, 3, 2, 4).reshape(
        B, H // 2, W, 2 * C)


def d2s_h(x: jax.Array) -> jax.Array:
    B, Hp, W, C2 = x.shape
    C = C2 // 2
    return x.reshape(B, Hp, W, 2, C).transpose(0, 1, 3, 2, 4).reshape(
        B, Hp * 2, W, C)


def _pack_h_kind(w: jax.Array, kind: str) -> jax.Array:
    """Apply an H-dim pack table to a 2D kernel's H taps (W taps kept)."""
    k, kw, ci, co = w.shape
    T = jnp.asarray(_dim_T(kind, k), w.dtype)      # (kp, pi, po, k)
    # HIGHEST for the same reason as _einsum_pack: exact relabel forward,
    # exact f32 partial-sum backward (default precision bf16-quantizes the
    # weight-grad partials on TPU)
    out = jnp.einsum("aupd,dxio->axuipo", T, w,
                     precision=lax.Precision.HIGHEST)
    return out.reshape(T.shape[0], kw, T.shape[1] * ci, T.shape[2] * co)


def pack_weight_conv_h(w: jax.Array) -> jax.Array:
    """H-only factor-2 pack of a stride-1 SAME odd-k 2D kernel:
    (k,k,Ci,Co) -> (k,k,2Ci,2Co). Applies to already-packed kernels too
    (any stride-1 SAME conv), so it composes with pack_weight_conv."""
    return _pack_h_kind(w, "same")


def pack_weight_down_h(wp: jax.Array) -> jax.Array:
    """H-pack a packed-down 2D kernel (from pack_weight_down): consumes
    H-PACKED input, emits the H-PACKED down output. (2,2,P*Ci,Co) ->
    (2,2,2*P*Ci,2*Co); apply with padding (0,1), stride 1; follow with
    d2s_h for the canonical (S/2)^2 down output."""
    return _pack_h_kind(wp, "down_h")


def pack_weight_up_h(wu: jax.Array) -> jax.Array:
    """H-pack a packed-up 2D kernel's OUTPUT (from pack_weight_up):
    consumes the UNPACKED coarse input, emits H-PACKED packed output.
    (2,2,Ci,P*Co) -> (3,2,Ci,2*P*Co); apply with H stride 2, padding
    ((1,0),(1,0))."""
    return _pack_h_kind(wu, "up_h")


# -- packed conv wrappers ----------------------------------------------------


def conv_packed(xp, wp, *, padding, stride=1, dims=2, compute_dtype,
                precision=None):
    # Routed through conv_general: in bf16 the weight grad comes back in
    # f32 (ops/conv.py `_conv_f32wgrad`). In packed layouts each canonical
    # weight's grad is otherwise a sum of 2^dims independently
    # bf16-quantized packed-slot partials; removing that rounding is
    # strictly better but measured NOT sufficient alone to fix the packed
    # bf16 96^3 3D divergence (benchmarks/RESULTS.md "3D bf16").
    from uresnet_tpu.ops.conv import conv_general

    return conv_general(xp, wp, strides=stride, padding=padding, dims=dims,
                        compute_dtype=compute_dtype, precision=precision)
