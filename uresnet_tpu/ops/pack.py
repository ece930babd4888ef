"""Space-to-depth packing: exact-equivalence layout transform for the
high-resolution, low-channel levels (2D and 3D).

Why (measured, benchmarks/RESULTS.md on v5e): a 512^2 x 16-channel conv runs
at ~2.7 TF/s because 16 output channels fill 16 of the MXU's 128 lanes; the
same FLOPs at 64+ channels run at 30-120 TF/s. Packing r x r spatial phases
into channels (512^2 x C -> 256^2 x 4C in 2D; 192^3 x C -> 96^3 x 8C in 3D)
moves the low-channel levels into the efficient regime — and in 3D also
avoids pathological XLA tile-padding blowups on tiny-minor-dim gradient
tensors. The transform is EXACT: packed kernels are a pure gather of the
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

Weight packing is ONE gather per kernel: the (index, mask) maps are static
numpy arrays cached per shape, so tracing adds a single take+multiply per
conv (a naive scatter of the same mapping blew up XLA compile time).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

R = 2  # pack factor per spatial dim

_MAP_CACHE: Dict[Tuple, Tuple[np.ndarray, np.ndarray]] = {}


def space_to_depth(x: jax.Array, r: int = R, dims: int = 2) -> jax.Array:
    """(B, *S, C) -> (B, *S/r, r^dims * C); channel order phase-major
    (p_0, ..., p_{dims-1}, c)."""
    B = x.shape[0]
    S = x.shape[1:1 + dims]
    C = x.shape[-1]
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


def depth_to_space(x: jax.Array, r: int = R, dims: int = 2) -> jax.Array:
    B = x.shape[0]
    Sp = x.shape[1:1 + dims]
    C = x.shape[-1] // (r ** dims)
    x = x.reshape((B,) + Sp + (r,) * dims + (C,))
    perm = [0]
    for d in range(dims):
        perm += [1 + d, 1 + dims + d]
    perm += [1 + 2 * dims]
    x = x.transpose(perm)
    return x.reshape((B,) + tuple(s * r for s in Sp) + (C,))


def _gather_pack(w: jax.Array, idx: np.ndarray, mask: np.ndarray) -> jax.Array:
    flat = w.reshape(-1)
    pw = jnp.take(flat, jnp.asarray(idx.reshape(-1)), axis=0)
    pw = pw * jnp.asarray(mask.reshape(-1), w.dtype)
    return pw.reshape(idx.shape)


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
    else:
        raise ValueError(kind)
    valid = (dy >= 0) & (dy < k)
    return kp, pi, po, np.clip(dy, 0, k - 1), valid


def _build_map(kind: str, k: int, ci: int, co: int, dims: int):
    key = (kind, k, ci, co, dims)
    if key in _MAP_CACHE:
        return _MAP_CACHE[key]
    kp, pi, po, dy, vy = _dim_tables(kind, k)

    # full index space: (A_0..A_{D-1}, p'_0..p'_{D-1}, p_0..p_{D-1}, ci, co)
    shape = (kp,) * dims + (pi,) * dims + (po,) * dims + (ci, co)
    nd = len(shape)

    def exp(arr_1d_dims, d):
        """dy/valid table for dim d broadcast into the full shape."""
        view = [1] * nd
        view[d] = kp
        view[dims + d] = pi
        view[2 * dims + d] = po
        return np.broadcast_to(arr_1d_dims.reshape(view[d], view[dims + d],
                                                   view[2 * dims + d])
                               .reshape(view), shape)

    kidx = np.zeros(shape, np.int64)
    valid = np.ones(shape, bool)
    for d in range(dims):
        kidx = kidx * k + exp(dy, d)
        valid &= exp(vy.astype(np.int64), d).astype(bool)
    cib = np.broadcast_to(
        np.arange(ci).reshape([1] * (nd - 2) + [ci, 1]), shape)
    cob = np.broadcast_to(np.arange(co).reshape([1] * (nd - 1) + [co]), shape)
    idx = (kidx * ci + cib) * co + cob

    # reorder to [(taps), (p' phases, ci), (p phases, co)]
    perm = (list(range(dims)) + list(range(dims, 2 * dims)) + [nd - 2]
            + list(range(2 * dims, 3 * dims)) + [nd - 1])
    P_i, P_o = pi ** dims, po ** dims
    idx = idx.transpose(perm).reshape((kp,) * dims + (P_i * ci, P_o * co))
    mask = valid.transpose(perm).reshape(
        (kp,) * dims + (P_i * ci, P_o * co)).astype(np.float32)
    _MAP_CACHE[key] = (idx.astype(np.int32), mask)
    return _MAP_CACHE[key]


def pack_weight_conv(w: jax.Array, dims: int = 2) -> jax.Array:
    """(k..k, Ci, Co), k odd, stride-1 SAME -> packed (k..k, P*Ci, P*Co)."""
    k, ci, co = w.shape[0], w.shape[-2], w.shape[-1]
    idx, mask = _build_map("same", k, ci, co, dims)
    return _gather_pack(w, idx, mask)


def pack_weight_down(w: jax.Array, dims: int = 2) -> jax.Array:
    """k=3 stride-2 SAME (pad_lo=0) -> packed (2..2, P*Ci, Co); output
    UNPACKED on the packed grid. Use padding (0,1) per dim."""
    k, ci, co = w.shape[0], w.shape[-2], w.shape[-1]
    idx, mask = _build_map("down", k, ci, co, dims)
    return _gather_pack(w, idx, mask)


def pack_weight_up(w: jax.Array, dims: int = 2) -> jax.Array:
    """k=3 s=2 SAME transpose conv -> packed (2..2, Ci, P*Co); input
    UNPACKED (half-res), output PACKED. Use padding (1,0) per dim."""
    k, ci, co = w.shape[0], w.shape[-2], w.shape[-1]
    idx, mask = _build_map("up", k, ci, co, dims)
    return _gather_pack(w, idx, mask)


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


def pack_weight_conv_h(w: jax.Array) -> jax.Array:
    """H-only factor-2 pack of a stride-1 SAME odd-k 2D kernel:
    (k,k,Ci,Co) -> (k,k,2Ci,2Co). Applies to already-packed kernels too
    (any stride-1 SAME conv), so it composes with pack_weight_conv."""
    k, kw, ci, co = w.shape
    key = ("same_h", k, kw, ci, co)
    if key not in _MAP_CACHE:
        A = np.arange(k)[:, None, None]
        pp = np.arange(2)[None, :, None]
        p = np.arange(2)[None, None, :]
        dy = 2 * (A - k // 2) + pp - p + k // 2       # (k, 2, 2)
        vy = (dy >= 0) & (dy < k)
        dyc = np.clip(dy, 0, k - 1)
        shape = (k, kw, 2, 2, ci, co)
        dyb = np.broadcast_to(dyc[:, None, :, :, None, None], shape)
        vyb = np.broadcast_to(vy[:, None, :, :, None, None], shape)
        dxb = np.broadcast_to(np.arange(kw)[None, :, None, None, None, None],
                              shape)
        cib = np.broadcast_to(np.arange(ci)[None, None, None, None, :, None],
                              shape)
        cob = np.broadcast_to(np.arange(co)[None, None, None, None, None, :],
                              shape)
        idx = ((dyb * kw + dxb) * ci + cib) * co + cob
        # reorder to [A, dx, (p', ci), (p, co)]
        idx = idx.transpose(0, 1, 2, 4, 3, 5).reshape(k, kw, 2 * ci, 2 * co)
        mask = vyb.transpose(0, 1, 2, 4, 3, 5).reshape(
            k, kw, 2 * ci, 2 * co).astype(np.float32)
        _MAP_CACHE[key] = (idx.astype(np.int32), mask)
    idx, mask = _MAP_CACHE[key]
    return _gather_pack(w, idx, mask)


# -- packed conv wrappers ----------------------------------------------------


def conv_packed(xp, wp, *, padding, stride=1, dims=2, compute_dtype,
                precision=None):
    dn = ("NHWC", "HWIO", "NHWC") if dims == 2 else ("NDHWC", "DHWIO", "NDHWC")
    if isinstance(padding, tuple) and isinstance(padding[0], int):
        padding = (padding,) * dims
    return lax.conv_general_dilated(
        xp.astype(compute_dtype), wp.astype(compute_dtype),
        window_strides=(stride,) * dims, padding=padding,
        dimension_numbers=dn, precision=precision)
