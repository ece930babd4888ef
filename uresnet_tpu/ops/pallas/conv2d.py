"""Pallas fused 3x3 conv (+ BN-affine + ReLU + residual) for packed levels.

SURVEY.md §7 stage 7: Pallas only where fusion beats XLA, benchmark-gated
with an XLA fallback. Target (benchmarks/RESULTS.md): the packed-L0 conv
(256^2 x 64ch, bf16) runs at ~30 TF/s under XLA and dominates the step;
its BN/ReLU epilogue is a separate 340 GB/s HBM pass. This kernel computes

    y = relu((conv3x3(x, w)) * scale + bias [+ residual])

in ONE pass over x: a row-slab of the (H-padded) input is DMA'd into VMEM
once, the 3x3 taps are 9 MXU matmuls over (block_h*W, C) x (C, Co) with f32
accumulation, and the affine/ReLU/residual epilogue is applied in-register
before the single bf16 write-back — eliminating the separate stat/normalize
HBM round-trips.

Correctness is pinned against the XLA reference in tests/test_pallas_conv.py
(interpret mode on CPU); whether the model uses it is decided by
measurement (kernel_backend config knob / benchmarks).

Status (round 2, COMPILED + MEASURED on v5e — benchmarks/pallas_probe.py):
  * v2 below (full-row DMA, W-halo as in-register shifts) COMPILES and runs
    BIT-EXACT vs XLA at the 128-lane hpack'd L0 shape (32,128,256,128):
    78.9 TF/s (bh=8) / 81.9 TF/s (bh=16) vs XLA's 93-104 TF/s for the same
    fused conv+affine+ReLU+residual — XLA wins at 128 lanes; kernel gated
    OFF on that measurement (SURVEY.md §7 stage 7 bench gate).
  * At 64 lanes Mosaic structurally rejects ANY DMA whose minor dim is not
    a 128 multiple, even full-extent: "Slice shape along dimension 3 must
    be aligned to tiling (128), but is 64" (tpu.memref_slice on the
    (...,256,64) HBM memref). The 64-ch direct conv therefore cannot be
    fed by manual DMA at all; the lane-filling route for 64-ch levels is
    layout packing (ops/pack.py pack_extra_h - 1.33x MAC redundancy at
    ~100 TF/s beats 2x-redundant in-kernel W-pairing at ~80 TF/s).
v1 (_kernel) kept for reference; it additionally trips the misaligned
W-halo VMEM slice. Correctness of both is pinned in interpret mode by
tests/test_pallas_conv.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_hbm, w_ref, scale_ref, bias_ref, res_ref, out_ref, slab, sem,
            *, block_h: int, width: int, cin: int, cout: int, relu: bool,
            has_residual: bool):
    b = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when(jnp.logical_and(b == 0, i == 0))
    def _():
        # zero the W-halo columns once; DMAs never touch them
        slab[:, 0, :] = jnp.zeros((block_h + 2, cin), slab.dtype)
        slab[:, width + 1, :] = jnp.zeros((block_h + 2, cin), slab.dtype)

    # fetch the row slab (input is H-padded by 1 on each side)
    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * block_h, block_h + 2), :, :],
        slab.at[:, pl.ds(1, width), :],
        sem,
    )
    dma.start()
    dma.wait()

    acc = jnp.zeros((block_h * width, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            xs = slab[dy:dy + block_h, dx:dx + width, :]
            xs = xs.reshape(block_h * width, cin)
            acc += jnp.dot(xs, w_ref[dy, dx], preferred_element_type=jnp.float32)

    y = acc * scale_ref[0, :].astype(jnp.float32) + bias_ref[0, :].astype(jnp.float32)
    y = y.reshape(block_h, width, cout)
    if has_residual:
        y = y + res_ref[0].astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    out_ref[0] = y.astype(out_ref.dtype)


def _kernel_v2(x_hbm, w_ref, scale_ref, bias_ref, res_ref, out_ref, slab,
               sem, *, block_h: int, width: int, cin: int, cout: int,
               relu: bool, has_residual: bool):
    """v2: DMA full (block_h+2, W, C) row-slabs — no W-halo columns in VMEM,
    so every DMA copies whole (W, C) tile-rows (the round-1 Mosaic blocker
    was slicing the W/C dims: 'slice ... must be aligned to tiling (128)').
    The SAME-padding W-shifts happen on VALUES after the VMEM load (VPU
    shuffles), not on refs."""
    b = pl.program_id(0)
    i = pl.program_id(1)

    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * block_h, block_h + 2)], slab, sem)
    dma.start()
    dma.wait()

    acc = jnp.zeros((block_h, width, cout), jnp.float32)
    zcol = jnp.zeros((block_h, 1, cin), slab.dtype)
    for dy in range(3):
        xv = slab[dy:dy + block_h]              # (bh, W, C)
        for dx in range(3):
            if dx == 0:      # left tap reads col-1: shift right, zero col 0
                xs = jnp.concatenate([zcol, xv[:, :width - 1]], axis=1)
            elif dx == 2:    # right tap: shift left, zero last col
                xs = jnp.concatenate([xv[:, 1:], zcol], axis=1)
            else:
                xs = xv
            acc += jax.lax.dot_general(
                xs.reshape(block_h * width, cin), w_ref[dy, dx],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(block_h, width, cout)

    y = acc * scale_ref[0, :].astype(jnp.float32) \
        + bias_ref[0, :].astype(jnp.float32)
    if has_residual:
        y = y + res_ref[0].astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    out_ref[0] = y.astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("relu", "block_h", "interpret"))
def fused_conv3x3_bn_relu_v2(
    x: jax.Array,                 # (B, H, W, C) bf16/f32
    w: jax.Array,                 # (3, 3, C, Co)
    scale: jax.Array,             # (Co,)
    bias: jax.Array,              # (Co,)
    residual: Optional[jax.Array] = None,
    *,
    relu: bool = True,
    block_h: int = 8,
    interpret: bool = False,
) -> jax.Array:
    B, H, W, C = x.shape
    Co = w.shape[-1]
    assert H % block_h == 0, (H, block_h)
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))

    has_residual = residual is not None
    res = residual if has_residual else jnp.zeros((B, 1, 1, Co), x.dtype)

    grid = (B, H // block_h)
    kernel = functools.partial(
        _kernel_v2, block_h=block_h, width=W, cin=C, cout=Co, relu=relu,
        has_residual=has_residual)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),          # x: manual DMA
            pl.BlockSpec(memory_space=pltpu.VMEM),         # w (full)
            pl.BlockSpec((1, Co), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),         # scale
            pl.BlockSpec((1, Co), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),         # bias
            (pl.BlockSpec((1, block_h, W, Co), lambda b, i: (b, i, 0, 0),
                          memory_space=pltpu.VMEM)
             if has_residual else
             pl.BlockSpec((1, 1, 1, Co), lambda b, i: (0, 0, 0, 0),
                          memory_space=pltpu.VMEM)),       # residual
        ],
        out_specs=pl.BlockSpec((1, block_h, W, Co), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Co), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_h + 2, W, C), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, w, scale.reshape(1, -1), bias.reshape(1, -1), res)


@functools.partial(jax.jit, static_argnames=("relu", "block_h", "interpret"))
def fused_conv3x3_bn_relu(
    x: jax.Array,                 # (B, H, W, C) bf16/f32
    w: jax.Array,                 # (3, 3, C, Co)
    scale: jax.Array,             # (Co,) folded BN scale (1s for plain conv)
    bias: jax.Array,              # (Co,)
    residual: Optional[jax.Array] = None,   # (B, H, W, Co) or None
    *,
    relu: bool = True,
    block_h: int = 8,
    interpret: bool = False,
) -> jax.Array:
    B, H, W, C = x.shape
    Co = w.shape[-1]
    assert H % block_h == 0, (H, block_h)
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))

    has_residual = residual is not None
    res = residual if has_residual else jnp.zeros((B, 1, 1, Co), x.dtype)

    grid = (B, H // block_h)
    kernel = functools.partial(
        _kernel, block_h=block_h, width=W, cin=C, cout=Co, relu=relu,
        has_residual=has_residual)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),          # x: manual DMA
            pl.BlockSpec(memory_space=pltpu.VMEM),         # w (full)
            pl.BlockSpec((1, Co), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),         # scale
            pl.BlockSpec((1, Co), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),         # bias
            (pl.BlockSpec((1, block_h, W, Co), lambda b, i: (b, i, 0, 0),
                          memory_space=pltpu.VMEM)
             if has_residual else
             pl.BlockSpec((1, 1, 1, Co), lambda b, i: (0, 0, 0, 0),
                          memory_space=pltpu.VMEM)),       # residual
        ],
        out_specs=pl.BlockSpec((1, block_h, W, Co), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Co), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_h + 2, W + 2, C), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, w, scale.reshape(1, -1), bias.reshape(1, -1), res)
