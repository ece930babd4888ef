"""Space-to-depth packing: exact-equivalence layout transform for the
high-resolution, low-channel levels.

Why (measured, benchmarks/micro.py on v5e): a 512^2 x 16-channel conv runs
at ~2.7 TF/s because 16 output channels fill 16 of the MXU's 128 lanes; the
same FLOPs at 64+ channels run at 60+ TF/s. Packing r x r spatial phases
into channels (512^2 x C -> 256^2 x 4C) moves the level-0 stage into the
efficient regime. The transform is EXACT: packed kernels are a pure gather
of the canonical weights, so params/checkpoints stay in reference layout
and tests pin equality (f32) of packed vs unpacked forward.

Math (r=2, odd k, SAME): with X'[i,j,(p,q,c)] = X[2i+p, 2j+q, c],
    Y[2i+p] = sum_dy X[2i+p+dy-k//2] W[dy]
    row 2i+p+dy-k//2 = 2(i+a)+p'  =>  dy = 2a + p' - p + k//2
so a stride-1 k-odd conv becomes a packed k conv over 4C channels (entries
with out-of-range dy are structural zeros); a stride-2 k=3 conv (SAME,
pad_lo=0) becomes a packed k=2 conv with (0,1) padding emitting UNPACKED
output; a k=3 s=2 transpose conv becomes a packed k=2 conv with (1,0)
padding emitting PACKED output. All verified against the lax reference ops
in tests/test_pack.py.

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

R = 2  # pack factor (2D: 4x channels)

_MAP_CACHE: Dict[Tuple, Tuple[np.ndarray, np.ndarray]] = {}


def space_to_depth(x: jax.Array, r: int = R) -> jax.Array:
    """(B, H, W, C) -> (B, H/r, W/r, r*r*C), channel index ((p*r)+q)*C + c."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // r, r, W // r, r, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H // r, W // r, r * r * C)


def depth_to_space(x: jax.Array, r: int = R) -> jax.Array:
    B, Hp, Wp, C4 = x.shape
    C = C4 // (r * r)
    x = x.reshape(B, Hp, Wp, r, r, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, Hp * r, Wp * r, C)


def _gather_pack(w: jax.Array, idx: np.ndarray, mask: np.ndarray) -> jax.Array:
    flat = w.reshape(-1)
    pw = jnp.take(flat, jnp.asarray(idx.reshape(-1)), axis=0)
    pw = pw * jnp.asarray(mask.reshape(-1), w.dtype)
    return pw.reshape(idx.shape)


def _dy_map(kp: int, k: int, mode: str) -> Tuple[np.ndarray, np.ndarray]:
    """dy[A, p', p] and validity for one spatial dim.

    mode 'same': dy = 2(A - kp//2) + p' - p + k//2        (stride-1 SAME)
    mode 'down': dy = 2A + p'                              (k=3 s=2, pad_lo=0)
    mode 'up'  : dy = {(p=0,A=0):0, (p=0,A=1):2, (p=1,A=1):1}  (k=3 s=2 tconv)
    """
    A = np.arange(kp)[:, None, None]
    pp = np.arange(R)[None, :, None]
    p = np.arange(R)[None, None, :]
    if mode == "same":
        dy = 2 * (A - kp // 2) + pp - p + k // 2
    elif mode == "down":
        dy = np.broadcast_to(2 * A + pp, (kp, R, 1)).copy()  # output unpacked
    elif mode == "up":
        dy = np.full((kp, R, R), -1)
        table = {(0, 0): 0, (1, 0): 2, (1, 1): 1}  # (A, p) -> dy
        for (a, pv), d in table.items():
            dy[a, :, pv] = [d] * R  # p' dim unused (input unpacked)
        dy = dy[:, :1, :]  # p' collapses to size 1
    else:
        raise ValueError(mode)
    valid = (dy >= 0) & (dy < k)
    return np.clip(dy, 0, k - 1), valid


def _build_map(kind: str, k: int, ci: int, co: int):
    key = (kind, k, ci, co)
    if key in _MAP_CACHE:
        return _MAP_CACHE[key]
    if kind == "same":
        kp, pi, po = k, R, R
    elif kind == "down":
        kp, pi, po = 2, R, 1
    elif kind == "up":
        kp, pi, po = 2, 1, R
    else:
        raise ValueError(kind)
    dy, vy = _dy_map(kp, k, kind)   # (kp, pi, po)
    dx, vx = dy, vy                 # symmetric in the two spatial dims

    # packed layout: [A, B, (p', q', ci), (p, q, co)]
    shape = (kp, kp, pi, pi, po, po, ci, co)
    dyb = np.broadcast_to(dy[:, None, :, None, :, None, None, None], shape)
    dxb = np.broadcast_to(dx[None, :, None, :, None, :, None, None], shape)
    vyb = np.broadcast_to(vy[:, None, :, None, :, None, None, None], shape)
    vxb = np.broadcast_to(vx[None, :, None, :, None, :, None, None], shape)
    cib = np.broadcast_to(np.arange(ci)[None, None, None, None, None, None, :, None], shape)
    cob = np.broadcast_to(np.arange(co)[None, None, None, None, None, None, None, :], shape)
    idx = ((dyb * k + dxb) * ci + cib) * co + cob
    mask = (vyb & vxb)
    # reorder to [A, B, p'*q'*ci, p*q*co]
    idx = idx.transpose(0, 1, 2, 3, 6, 4, 5, 7).reshape(
        kp, kp, pi * pi * ci, po * po * co)
    mask = mask.transpose(0, 1, 2, 3, 6, 4, 5, 7).reshape(
        kp, kp, pi * pi * ci, po * po * co).astype(np.float32)
    _MAP_CACHE[key] = (idx.astype(np.int32), mask)
    return _MAP_CACHE[key]


def pack_weight_conv(w: jax.Array) -> jax.Array:
    """(k,k,Ci,Co), k odd, stride-1 SAME -> packed (k,k,4Ci,4Co)."""
    k, _, ci, co = w.shape
    idx, mask = _build_map("same", k, ci, co)
    return _gather_pack(w, idx, mask)


def pack_weight_down(w: jax.Array) -> jax.Array:
    """(3,3,Ci,Co) stride-2 SAME (pad_lo=0) -> packed (2,2,4Ci,Co).

    Output is UNPACKED (half-res grid == packed grid). Use padding
    ((0,1),(0,1)) on the packed input.
    """
    k, _, ci, co = w.shape
    idx, mask = _build_map("down", k, ci, co)
    return _gather_pack(w, idx, mask)


def pack_weight_up(w: jax.Array) -> jax.Array:
    """(3,3,Ci,Co) k=3 s=2 SAME transpose conv -> packed (2,2,Ci,4Co).

    Input UNPACKED (half-res), output PACKED. Use padding ((1,0),(1,0)).
    Derivation: y[o] = sum_A xd[o+A-2] w[A] (lax SAME pads (2,1), input
    lhs-dilated by 2); o=2t -> y = x[t-1] w[0] + x[t] w[2];
    o=2t+1 -> y = x[t] w[1]. Packed tap A'=0 reads x[t-1], A'=1 reads x[t].
    """
    k, _, ci, co = w.shape
    idx, mask = _build_map("up", k, ci, co)
    return _gather_pack(w, idx, mask)


def pack_weight_concat(ws: Sequence[jax.Array]) -> jax.Array:
    """Packed stride-1 kernel for an input that is a CONCAT of packed
    tensors: pack each input-channel slice separately, then concat —
    phase-major layout is per-tensor, not global."""
    return jnp.concatenate([pack_weight_conv(w) for w in ws], axis=2)


# -- packed conv wrappers ----------------------------------------------------

_DN = ("NHWC", "HWIO", "NHWC")


def conv_packed(xp, wp, *, padding, stride=1, compute_dtype, precision=None):
    return lax.conv_general_dilated(
        xp.astype(compute_dtype), wp.astype(compute_dtype),
        window_strides=(stride, stride), padding=padding,
        dimension_numbers=_DN, precision=precision)
