"""U-ResNet building blocks (pure functions over param/state pytrees).

Capability parity (SURVEY.md §2.1 "Layer builders", reference
`lib/uresnet_layers.py` [K:med]):

  residual block = conv3-BN-ReLU -> conv3-BN, projection shortcut (1x1 conv)
  on channel/stride mismatch, add, ReLU;
  downsample = stride-2 conv3 (strided conv, not maxpool) + BN + ReLU;
  upsample = stride-2 transpose conv + BN + ReLU.

Unified over 2D (NHWC) and 3D (NDHWC) via the ``dims`` knob.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from uresnet_tpu.ops.conv import conv, conv_init, conv_transpose
from uresnet_tpu.ops.norm import batch_norm, bn_init


class BlockCtx:
    """Static per-call context: dims, dtypes, BN hyperparams, axis name."""

    def __init__(self, *, dims=2, compute_dtype=jnp.bfloat16,
                 param_dtype=jnp.float32, bn_momentum=0.99, bn_eps=1e-3,
                 axis_name: Optional[str] = None):
        self.dims = dims
        self.compute_dtype = compute_dtype
        self.param_dtype = param_dtype
        self.bn_momentum = bn_momentum
        self.bn_eps = bn_eps
        self.axis_name = axis_name

    def conv(self, x, p, stride=1):
        return conv(x, p, stride=stride, dims=self.dims,
                    compute_dtype=self.compute_dtype)

    def conv_t(self, x, p, stride=2):
        return conv_transpose(x, p, stride=stride, dims=self.dims,
                              compute_dtype=self.compute_dtype)

    def bn(self, x, p, s, train):
        return batch_norm(x, p, s, train=train, momentum=self.bn_momentum,
                          eps=self.bn_eps, axis_name=self.axis_name)


# ---------------------------------------------------------------------------
# conv + BN + ReLU unit
# ---------------------------------------------------------------------------


def conv_bn_init(key, kernel, in_ch, out_ch, *, dims, param_dtype):
    kp, _ = jax.random.split(key)
    params = {"conv": conv_init(kp, kernel, in_ch, out_ch, dims=dims,
                                use_bias=False, param_dtype=param_dtype)}
    bn_p, bn_s = bn_init(out_ch, param_dtype)
    params["bn"] = bn_p
    return params, {"bn": bn_s}


def conv_bn_apply(ctx: BlockCtx, params, state, x, *, stride=1, train,
                  relu=True, transpose=False):
    if transpose:
        y = ctx.conv_t(x, params["conv"], stride=stride)
    else:
        y = ctx.conv(x, params["conv"], stride=stride)
    y, bn_s = ctx.bn(y, params["bn"], state["bn"], train)
    if relu:
        y = jax.nn.relu(y)
    return y, {"bn": bn_s}


# ---------------------------------------------------------------------------
# residual block
# ---------------------------------------------------------------------------


def resblock_init(key, in_ch, out_ch, *, dims, param_dtype):
    k1, k2, k3 = jax.random.split(key, 3)
    p1, s1 = conv_bn_init(k1, 3, in_ch, out_ch, dims=dims, param_dtype=param_dtype)
    p2, s2 = conv_bn_init(k2, 3, out_ch, out_ch, dims=dims, param_dtype=param_dtype)
    params = {"cb1": p1, "cb2": p2}
    state = {"cb1": s1, "cb2": s2}
    if in_ch != out_ch:
        params["proj"] = conv_init(k3, 1, in_ch, out_ch, dims=dims,
                                   use_bias=False, param_dtype=param_dtype)
    return params, state


def resblock_apply(ctx: BlockCtx, params, state, x, *, train):
    y, s1 = conv_bn_apply(ctx, params["cb1"], state["cb1"], x, train=train)
    y, s2 = conv_bn_apply(ctx, params["cb2"], state["cb2"], y, train=train,
                          relu=False)
    shortcut = x
    if "proj" in params:
        shortcut = ctx.conv(x, params["proj"])
    y = jax.nn.relu(y + shortcut.astype(y.dtype))
    return y, {"cb1": s1, "cb2": s2}
