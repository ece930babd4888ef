"""Golden-value unit tests for conv / transpose-conv / BN against independent
numpy oracles (SURVEY.md §4 rebuild test plan)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uresnet_tpu.ops.conv import conv, conv_init, conv_transpose
from uresnet_tpu.ops.norm import batch_norm, bn_init


def naive_conv2d_same(x, w, stride=1):
    """Correlation, SAME padding, NHWC/HWIO. Independent numpy oracle."""
    B, H, W, Ci = x.shape
    kh, kw, _, Co = w.shape
    oh, ow = -(-H // stride), -(-W // stride)
    pad_h = max((oh - 1) * stride + kh - H, 0)
    pad_w = max((ow - 1) * stride + kw - W, 0)
    xp = np.pad(x, ((0, 0), (pad_h // 2, pad_h - pad_h // 2),
                    (pad_w // 2, pad_w - pad_w // 2), (0, 0)))
    out = np.zeros((B, oh, ow, Co), np.float32)
    for i in range(oh):
        for j in range(ow):
            patch = xp[:, i * stride:i * stride + kh, j * stride:j * stride + kw, :]
            out[:, i, j, :] = np.tensordot(patch, w, axes=([1, 2, 3], [0, 1, 2]))
    return out


def naive_conv_transpose2d_same(x, w, stride=2):
    """lax.conv_transpose SAME semantics: lhs-dilate by `stride`, pad with
    (pad_a, pad_b) from lax's _conv_transpose_padding, stride-1 correlate."""
    B, H, W, Ci = x.shape
    k = w.shape[0]
    pad_len = k + stride - 2
    pad_a = k - 1 if stride > k - 1 else int(np.ceil(pad_len / 2))
    pad_b = pad_len - pad_a
    dh = (H - 1) * stride + 1
    dw = (W - 1) * stride + 1
    xd = np.zeros((B, dh, dw, Ci), np.float32)
    xd[:, ::stride, ::stride, :] = x
    xp = np.pad(xd, ((0, 0), (pad_a, pad_b), (pad_a, pad_b), (0, 0)))
    Co = w.shape[-1]
    oh, ow = H * stride, W * stride
    out = np.zeros((B, oh, ow, Co), np.float32)
    for i in range(oh):
        for j in range(ow):
            patch = xp[:, i:i + k, j:j + k, :]
            out[:, i, j, :] = np.tensordot(patch, w, axes=([1, 2, 3], [0, 1, 2]))
    return out


@pytest.mark.parametrize("stride", [1, 2])
def test_conv_matches_numpy(rng, stride):
    x = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
    w = rng.standard_normal((3, 3, 3, 5)).astype(np.float32) * 0.1
    got = conv(jnp.asarray(x), {"w": jnp.asarray(w)}, stride=stride,
               compute_dtype=jnp.float32)
    want = naive_conv2d_same(x, w, stride)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_conv_bias_and_shapes(rng):
    p = conv_init(jax.random.PRNGKey(0), 3, 2, 4, dims=2)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 2)).astype(np.float32))
    y = conv(x, p, compute_dtype=jnp.float32)
    assert y.shape == (1, 16, 16, 4)
    y2 = conv(x, p, stride=2, compute_dtype=jnp.float32)
    assert y2.shape == (1, 8, 8, 4)


@pytest.mark.parametrize("k,stride", [(3, 2), (2, 2)])
def test_conv_transpose_matches_numpy(rng, k, stride):
    x = rng.standard_normal((2, 4, 4, 3)).astype(np.float32)
    w = rng.standard_normal((k, k, 3, 2)).astype(np.float32) * 0.1
    got = conv_transpose(jnp.asarray(x), {"w": jnp.asarray(w)}, stride=stride,
                         compute_dtype=jnp.float32)
    want = naive_conv_transpose2d_same(x, w, stride)
    assert got.shape == (2, 8, 8, 2)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_conv3d_shape(rng):
    p = conv_init(jax.random.PRNGKey(1), 3, 1, 2, dims=3)
    x = jnp.ones((1, 8, 8, 8, 1))
    y = conv(x, p, dims=3, compute_dtype=jnp.float32)
    assert y.shape == (1, 8, 8, 8, 2)
    yt = conv_transpose(x, {"w": jnp.ones((2, 2, 2, 1, 1))}, dims=3,
                        compute_dtype=jnp.float32)
    assert yt.shape == (1, 16, 16, 16, 1)


def test_batchnorm_train_matches_numpy(rng):
    x = rng.standard_normal((4, 6, 6, 3)).astype(np.float32) * 3 + 1
    params, state = bn_init(3)
    params = {"scale": jnp.asarray([1.0, 2.0, 0.5]),
              "bias": jnp.asarray([0.0, -1.0, 3.0])}
    y, new_state = batch_norm(jnp.asarray(x), params, state, train=True,
                              momentum=0.9, eps=1e-3)
    mean = x.reshape(-1, 3).mean(0)
    var = x.reshape(-1, 3).var(0)  # biased, TF1-style
    want = (x - mean) / np.sqrt(var + 1e-3) * np.asarray(params["scale"]) \
        + np.asarray(params["bias"])
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-4, atol=1e-4)
    # moving-stat update: m' = m*mom + batch*(1-mom)
    np.testing.assert_allclose(np.asarray(new_state["mean"]), 0.1 * mean, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(new_state["var"]), 0.9 * 1.0 + 0.1 * var, rtol=1e-5)


def test_batchnorm_eval_uses_running_stats(rng):
    x = rng.standard_normal((2, 4, 4, 2)).astype(np.float32)
    params, state = bn_init(2)
    state = {"mean": jnp.asarray([1.0, -1.0]), "var": jnp.asarray([4.0, 0.25])}
    y, s2 = batch_norm(jnp.asarray(x), params, state, train=False, eps=0.0)
    want = (x - np.asarray(state["mean"])) / np.sqrt(np.asarray(state["var"]))
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-4, atol=1e-4)
    assert s2 is state


# -- bf16 convs with f32 weight gradients (ops/conv.py `_conv_f32wgrad`) -----
#
# The custom VJP must be invisible in the forward and in dx (bit-identical
# to stock AD of the bf16 conv) while removing the bf16 quantization of dw.
# Motivation: the packed "same" relabel puts each canonical weight in
# 2^dims kernel slots, so stock AD sums 2^dims INDEPENDENTLY bf16-rounded
# dw partials. (Strictly better numerics at zero cost; measured NOT
# sufficient alone to fix the packed-bf16 96^3 3D divergence —
# benchmarks/RESULTS.md "3D bf16".)


def _stock_bf16_conv(x, w, stride, dims, transpose=False):
    from uresnet_tpu.ops.conv import _dim_numbers
    from jax import lax
    xb, wb = x.astype(jnp.bfloat16), w.astype(jnp.bfloat16)
    if transpose:
        return lax.conv_transpose(xb, wb, (stride,) * dims, "SAME",
                                  dimension_numbers=_dim_numbers(dims))
    return lax.conv_general_dilated(xb, wb, (stride,) * dims, "SAME",
                                    dimension_numbers=_dim_numbers(dims))


@pytest.mark.parametrize("dims,stride,transpose", [
    (2, 1, False), (2, 2, False), (3, 2, False), (2, 2, True), (3, 2, True),
])
def test_f32wgrad_forward_and_dx_bit_identical(rng, dims, stride, transpose):
    from uresnet_tpu.ops.conv import conv_general
    shape = (2,) + (8,) * dims + (4,)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3,) * dims + (4, 6)), jnp.float32) * 0.1
    kind = "convt" if transpose else "conv"
    y = conv_general(x, w, strides=stride, padding="SAME", dims=dims,
                     compute_dtype=jnp.bfloat16, kind=kind)
    y_stock = _stock_bf16_conv(x, w, stride, dims, transpose)
    assert y.dtype == jnp.bfloat16
    assert bool((y == y_stock).all())

    def custom_sum(xx):
        return jnp.sum(conv_general(xx, w, strides=stride, padding="SAME",
                                    dims=dims, compute_dtype=jnp.bfloat16,
                                    kind=kind).astype(jnp.float32) ** 2)

    def stock_sum(xx):
        return jnp.sum(_stock_bf16_conv(xx, w, stride, dims,
                                        transpose).astype(jnp.float32) ** 2)

    dx_c = jax.grad(custom_sum)(x)
    dx_s = jax.grad(stock_sum)(x)
    assert bool((dx_c == dx_s).all())


def test_f32wgrad_dw_is_unquantized(rng):
    """dw from the custom path equals the f32-operand oracle exactly on CPU
    (where DEFAULT f32 convs are true f32), while stock AD's dw differs by
    bf16 quantization."""
    from uresnet_tpu.ops.conv import conv_general, _dim_numbers
    from jax import lax
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 4)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 4, 6)), jnp.float32) * 0.1

    def custom_loss(ww):
        return jnp.sum(conv_general(x, ww, strides=1, padding="SAME", dims=2,
                                    compute_dtype=jnp.bfloat16)
                       .astype(jnp.float32) ** 2)

    def stock_loss(ww):
        return jnp.sum(_stock_bf16_conv(x, ww, 1, 2).astype(jnp.float32) ** 2)

    dw_c = jax.grad(custom_loss)(w)
    dw_s = jax.grad(stock_loss)(w)
    assert dw_c.dtype == jnp.float32

    # oracle: identical cotangent chain, but the dw conv runs with f32
    # operands (bf16-rounded values) — what the custom bwd computes
    y = _stock_bf16_conv(x, w, 1, 2)
    g = (2.0 * y.astype(jnp.float32)).astype(jnp.bfloat16)  # cotangent at y
    _, vjp_w = jax.vjp(
        lambda ww: lax.conv_general_dilated(
            x.astype(jnp.bfloat16).astype(jnp.float32), ww, (1, 1), "SAME",
            dimension_numbers=_dim_numbers(2)),
        w)
    dw_oracle, = vjp_w(g.astype(jnp.float32))
    np.testing.assert_array_equal(np.asarray(dw_c), np.asarray(dw_oracle))
    # and stock differs from the oracle exactly by its bf16 rounding
    assert bool((dw_s != dw_oracle).any())
    np.testing.assert_array_equal(
        np.asarray(dw_s), np.asarray(dw_oracle.astype(jnp.bfloat16)
                                     .astype(jnp.float32)))


def test_f32_mode_bypasses_custom_vjp(rng):
    """f32 compute keeps the plain HIGHEST-precision primitive bitwise."""
    from uresnet_tpu.ops.conv import conv_general, _dim_numbers
    from jax import lax
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 3)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 5)), jnp.float32)
    y = conv_general(x, w, strides=1, padding="SAME", dims=2,
                     compute_dtype=jnp.float32)
    y_old = lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=_dim_numbers(2),
        precision=lax.Precision.HIGHEST)
    assert bool((y == y_old).all())
