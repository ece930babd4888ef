"""N-D convolution primitives, NHWC/NDHWC in HBM (BASELINE.json north_star).

Capability parity: the reference's conv / strided-conv / `conv2d_transpose`
wrappers (SURVEY.md §2.1 "Layer builders", reference `lib/uresnet_layers.py`
[K:med]). TPU-first choices:

  * channels-last layouts so the channel dim rides the 128-lane axis;
  * bf16 operands with float32 MXU accumulation (`preferred_element_type`);
  * static shapes and SAME padding everywhere, so XLA tiles onto the MXU.

The transpose conv is `lax.conv_transpose` (fractionally-strided conv) — the
overlap-add semantics match TF's `conv2d_transpose` with SAME padding and a
(k, k, C_in, C_out) kernel layout of our own choosing; TF's (k, k, out, in)
gradient-semantics kernels are converted at checkpoint-import time
(models/import_tf.py `tconv_kernel_from_tf`, the exact flip+swap).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

# probe flag (read once at import): f32-operand conv data-gradients —
# see benchmarks/probe_3d_bf16.py and _conv_f32wgrad_bwd below
_F32_DXGRAD = os.environ.get("URESNET_F32_DXGRAD", "") == "1"


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


# -- bf16 convs with UNQUANTIZED (f32) weight gradients ----------------------
#
# Stock AD of `conv(x.astype(bf16), w.astype(bf16))` quantizes the weight
# gradient to bf16: the conv-backward dw pass must emit the operand dtype
# (bf16), and only then does the `astype` transpose upcast to f32 — every
# weight grad loses its mantissa below 8 bits BEFORE Adam sees it. For the
# packed layouts this is amplified: each canonical weight of a stride-1
# kernel occupies 2^dims packed-kernel slots (ops/pack.py `_dim_tables`
# "same": 2 slots/dim), so its gradient is a sum of 2^dims INDEPENDENTLY
# bf16-quantized partials — ~sqrt(8)x the rounding noise of the canonical
# layout in 3D.
#
# The custom VJP keeps the forward and the data gradient EXACTLY as stock
# (bf16 in / bf16 out), but computes the weight gradient with f32 operands
# at DEFAULT precision — the TPU runs the same single bf16 MXU pass
# (identical products), just accumulating into an f32 output with no final
# bf16 rounding. Zero extra FLOPs; the only cost is the f32 copies the dw
# conv reads. The custom boundary includes the w.astype(bf16) cast so the
# returned cotangent is legally f32.
#
# Honest status (benchmarks/RESULTS.md "3D bf16"): this removes a real
# rounding amplifier and is kept as strictly-better-numerics-at-zero-cost,
# but it is measured NOT sufficient by itself to rescue packed-bf16 96^3
# training (which diverges at every seed while canonical-bf16 and
# packed-f32 converge) — see RESULTS.md for the follow-up investigation.
#
# NOTE (CLAUDE.md invariant): `preferred_element_type=f32` on a
# differentiated conv breaks the TPU backward — here it is never needed:
# both backward convs are first-order calls with uniform operand dtypes.


def _run_conv(kind, x, w, strides, padding, dn, precision):
    if kind == "conv":
        return lax.conv_general_dilated(
            x, w, window_strides=strides, padding=padding,
            dimension_numbers=dn, precision=precision)
    if kind == "convt":
        return lax.conv_transpose(
            x, w, strides=strides, padding=padding,
            dimension_numbers=dn, precision=precision)
    raise ValueError(kind)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _conv_f32wgrad(x, w32, kind, strides, padding, dn, cdt_name):
    return _run_conv(kind, x, w32.astype(jnp.dtype(cdt_name)), strides,
                     padding, dn, None)


def _conv_f32wgrad_fwd(x, w32, kind, strides, padding, dn, cdt_name):
    y = _conv_f32wgrad(x, w32, kind, strides, padding, dn, cdt_name)
    return y, (x, w32)


def _conv_f32wgrad_bwd(kind, strides, padding, dn, cdt_name, res, g):
    x, w32 = res
    cdt = jnp.dtype(cdt_name)
    if _F32_DXGRAD:
        # probe path (URESNET_F32_DXGRAD=1, benchmarks/probe_3d_bf16.py):
        # data gradient with f32 operands — f32 accumulation AND output,
        # one final rounding back to the activation dtype
        _, vjp_x = jax.vjp(
            lambda xx: _run_conv(kind, xx, w32.astype(jnp.float32), strides,
                                 padding, dn, None), x.astype(jnp.float32))
        dx32, = vjp_x(g.astype(jnp.float32))
        dx = dx32.astype(x.dtype)
    else:
        # dx: bit-identical to the stock backward (bf16 operands/output)
        _, vjp_x = jax.vjp(
            lambda xx: _run_conv(kind, xx, w32.astype(cdt), strides, padding,
                                 dn, None), x)
        dx, = vjp_x(g)
    # dw: f32 operands, DEFAULT precision = the same bf16 multiply pass,
    # f32 accumulation and OUTPUT — the weight grad is never bf16-rounded
    _, vjp_w = jax.vjp(
        lambda ww: _run_conv(kind, x.astype(jnp.float32), ww, strides,
                             padding, dn, None), w32.astype(jnp.float32))
    dw, = vjp_w(g.astype(jnp.float32))
    return dx, dw.astype(w32.dtype)


_conv_f32wgrad.defvjp(_conv_f32wgrad_fwd, _conv_f32wgrad_bwd)


def conv_general(x, w, *, strides, padding, dims, compute_dtype,
                 precision=None, kind="conv"):
    """The one conv entry point: same semantics as
    ``_run_conv(kind, x.astype(cdt), w.astype(cdt), ...)`` but in bf16 mode
    the weight gradient is computed in f32 (see above). f32 mode (or an
    explicit ``precision``) keeps the plain primitive so the golden / parity
    gates see true f32 numerics end to end."""
    cdt = jnp.dtype(compute_dtype)
    dn = _dim_numbers(dims)
    if isinstance(padding, tuple) and padding and isinstance(padding[0], int):
        padding = (padding,) * dims
    strides = strides if isinstance(strides, tuple) else (strides,) * dims
    if cdt == jnp.float32 or precision is not None:
        return _run_conv(kind, x.astype(cdt), w.astype(cdt), strides,
                         padding, dn,
                         precision if precision is not None else _precision(cdt))
    return _conv_f32wgrad(x.astype(cdt), w.astype(jnp.float32), kind,
                          strides, padding, dn, cdt.name)


def head_precision(head_dtype, compute_dtype):
    """Precision for a logits conv whose dtype is RAISED above the model's
    compute dtype (model.head_dtype, the packed-bf16 3D stability fix —
    benchmarks/RESULTS.md round 4): DEFAULT precision runs the same
    single bf16 MXU pass as the stock head (identical products — the
    inputs are bf16-rounded upstream anyway) but accumulates into an
    UNROUNDED f32 output, which is the entire point, at ~bf16 cost
    (HIGHEST would add multi-pass f32 multiplies for values that carry no
    extra information). Same-dtype heads keep the usual rules (None)."""
    hd, cd = jnp.dtype(head_dtype), jnp.dtype(compute_dtype)
    return lax.Precision.DEFAULT if hd != cd else None


def conv(
    x: jax.Array,
    params: dict,
    *,
    stride: int = 1,
    dims: int = 2,
    compute_dtype=jnp.bfloat16,
    precision=None,
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
    out = conv_general(x, w, strides=stride, padding="SAME", dims=dims,
                       compute_dtype=compute_dtype, precision=precision)
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
    out = conv_general(x, w, strides=stride, padding="SAME", dims=dims,
                       compute_dtype=compute_dtype, kind="convt")
    if "b" in params:
        out = out + params["b"].astype(out.dtype)
    return out
