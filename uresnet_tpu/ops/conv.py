"""N-D convolution primitives, NHWC/NDHWC in HBM (BASELINE.json north_star).

Capability parity: the reference's conv / strided-conv / `conv2d_transpose`
wrappers (SURVEY.md §2.1 "Layer builders", reference `lib/uresnet_layers.py`
[K:med]). TPU-first choices:

  * channels-last layouts so the channel dim rides the 128-lane axis;
  * bf16 operands with float32 MXU accumulation (`preferred_element_type`);
  * static shapes and SAME padding everywhere, so XLA tiles onto the MXU.

The transpose conv is `lax.conv_transpose` (fractionally-strided conv) — the
overlap-add semantics match TF's `conv2d_transpose` with SAME padding and a
(k, k, C_in, C_out) kernel layout of our own choosing (we never load TF
checkpoints, so TF's (k, k, out, in) layout is not mirrored).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _dim_numbers(dims: int) -> lax.ConvDimensionNumbers:
    if dims == 2:
        spec = ("NHWC", "HWIO", "NHWC")
    elif dims == 3:
        spec = ("NDHWC", "DHWIO", "NDHWC")
    else:
        raise ValueError(f"dims must be 2 or 3, got {dims}")
    return spec


def conv_init(
    key: jax.Array,
    kernel: int,
    in_ch: int,
    out_ch: int,
    *,
    dims: int = 2,
    use_bias: bool = True,
    param_dtype=jnp.float32,
) -> dict:
    """Glorot-uniform kernel (TF1 `tf.layers.conv2d` default) + zero bias."""
    shape = (kernel,) * dims + (in_ch, out_ch)
    fan_in = in_ch * kernel**dims
    fan_out = out_ch * kernel**dims
    limit = jnp.sqrt(6.0 / (fan_in + fan_out)).astype(param_dtype)
    w = jax.random.uniform(key, shape, param_dtype, -limit, limit)
    p = {"w": w}
    if use_bias:
        p["b"] = jnp.zeros((out_ch,), param_dtype)
    return p


def _precision(compute_dtype):
    # f32 compute means *true* f32 numerics everywhere (parity/golden gates);
    # without HIGHEST the TPU lowers f32 convs through bf16 passes.
    return lax.Precision.HIGHEST if compute_dtype == jnp.float32 else None


def conv(
    x: jax.Array,
    params: dict,
    *,
    stride: int = 1,
    dims: int = 2,
    compute_dtype=jnp.bfloat16,
) -> jax.Array:
    """SAME-padded N-D conv in `compute_dtype`.

    bf16 mode: operands and output are bf16 — the MXU still accumulates in
    f32 internally, and keeping the output dtype equal to the operand dtype
    is required for the conv transpose (backward) rule, whose cotangent
    otherwise mismatches the operand dtype. Downstream BN re-does its
    statistics in f32. f32 mode requests HIGHEST precision (true f32 passes
    on TPU) for the golden/parity gates.
    """
    w = params["w"]
    out = lax.conv_general_dilated(
        x.astype(compute_dtype),
        w.astype(compute_dtype),
        window_strides=(stride,) * dims,
        padding="SAME",
        dimension_numbers=_dim_numbers(dims),
        precision=_precision(compute_dtype),
    )
    if "b" in params:
        out = out + params["b"].astype(out.dtype)
    return out


def conv_transpose(
    x: jax.Array,
    params: dict,
    *,
    stride: int = 2,
    dims: int = 2,
    compute_dtype=jnp.bfloat16,
) -> jax.Array:
    """SAME-padded fractionally-strided conv: (B, *S, C) -> (B, *S*stride, C')."""
    w = params["w"]
    out = lax.conv_transpose(
        x.astype(compute_dtype),
        w.astype(compute_dtype),
        strides=(stride,) * dims,
        padding="SAME",
        dimension_numbers=_dim_numbers(dims),
        precision=_precision(compute_dtype),
    )
    if "b" in params:
        out = out + params["b"].astype(out.dtype)
    return out
