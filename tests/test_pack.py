"""Space-to-depth packed ops == canonical lax ops, bit-level in f32
(the exactness gate for the packed level-0 fast path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from uresnet_tpu.ops.pack import (conv_packed, depth_to_space,
                                  pack_weight_concat, pack_weight_conv,
                                  pack_weight_down, pack_weight_up,
                                  space_to_depth)

DN = ("NHWC", "HWIO", "NHWC")
HI = lax.Precision.HIGHEST


def ref_conv(x, w, s=1):
    return lax.conv_general_dilated(x, w, (s, s), "SAME",
                                    dimension_numbers=DN, precision=HI)


def ref_convt(x, w, s=2):
    return lax.conv_transpose(x, w, (s, s), "SAME", dimension_numbers=DN,
                              precision=HI)


@pytest.fixture
def data(rng):
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)).astype(np.float32))
    return x


def test_s2d_d2s_roundtrip(data):
    xp = space_to_depth(data)
    assert xp.shape == (2, 8, 8, 12)
    np.testing.assert_array_equal(np.asarray(depth_to_space(xp)),
                                  np.asarray(data))
    # phase layout: channel ((p*2)+q)*C + c
    np.testing.assert_array_equal(np.asarray(xp[0, 0, 0, 3:6]),
                                  np.asarray(data[0, 0, 1, :]))  # p=0,q=1


@pytest.mark.parametrize("k", [1, 3])
def test_packed_conv_matches(rng, data, k):
    w = jnp.asarray(rng.standard_normal((k, k, 3, 5)).astype(np.float32) * .2)
    want = ref_conv(data, w)
    got = depth_to_space(conv_packed(
        space_to_depth(data), pack_weight_conv(w), padding="SAME",
        compute_dtype=jnp.float32, precision=HI))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-5)


def test_packed_down_matches(rng, data):
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 6)).astype(np.float32) * .2)
    want = ref_conv(data, w, s=2)
    got = conv_packed(space_to_depth(data), pack_weight_down(w),
                      padding=((0, 1), (0, 1)), compute_dtype=jnp.float32,
                      precision=HI)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-5)


def test_packed_up_matches(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 6)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 6, 4)).astype(np.float32) * .2)
    want = ref_convt(x, w)                       # (2, 16, 16, 4)
    got = depth_to_space(conv_packed(
        x, pack_weight_up(w), padding=((1, 0), (1, 0)),
        compute_dtype=jnp.float32, precision=HI))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-5)


DN3 = ("NDHWC", "DHWIO", "NDHWC")


def ref_conv3(x, w, s=1):
    return lax.conv_general_dilated(x, w, (s, s, s), "SAME",
                                    dimension_numbers=DN3, precision=HI)


def test_packed_conv3d_matches(rng):
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 8, 3)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 3, 4)).astype(np.float32) * .2)
    want = ref_conv3(x, w)
    got = depth_to_space(conv_packed(
        space_to_depth(x, dims=3), pack_weight_conv(w, dims=3),
        padding="SAME", dims=3, compute_dtype=jnp.float32, precision=HI),
        dims=3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-5)


def test_packed_down3d_matches(rng):
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 8, 2)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 2, 4)).astype(np.float32) * .2)
    want = ref_conv3(x, w, s=2)
    got = conv_packed(space_to_depth(x, dims=3), pack_weight_down(w, dims=3),
                      padding=(0, 1), dims=3, compute_dtype=jnp.float32,
                      precision=HI)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-5)


def test_packed_up3d_matches(rng):
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 4, 4)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 4, 2)).astype(np.float32) * .2)
    want = lax.conv_transpose(x, w, (2, 2, 2), "SAME",
                              dimension_numbers=DN3, precision=HI)
    got = depth_to_space(conv_packed(
        x, pack_weight_up(w, dims=3), padding=(1, 0), dims=3,
        compute_dtype=jnp.float32, precision=HI), dims=3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-5)


def test_s2d_h_pack_matches(rng, data):
    from uresnet_tpu.ops.pack import d2s_h, pack_weight_conv_h, s2d_h

    w = jnp.asarray(rng.standard_normal((3, 3, 3, 5)).astype(np.float32) * .2)
    want = ref_conv(data, w)
    got = d2s_h(conv_packed(s2d_h(data), pack_weight_conv_h(w),
                            padding="SAME", compute_dtype=jnp.float32,
                            precision=HI))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-5)


def test_packed_concat_matches(rng, data):
    x2 = jnp.asarray(rng.standard_normal((2, 16, 16, 5)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 4)).astype(np.float32) * .2)
    want = ref_conv(jnp.concatenate([data, x2], -1), w)
    xp = jnp.concatenate([space_to_depth(data), space_to_depth(x2)], -1)
    wp = pack_weight_concat([w[:, :, :3], w[:, :, 3:]])
    got = depth_to_space(conv_packed(xp, wp, padding="SAME",
                                     compute_dtype=jnp.float32, precision=HI))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-5)


def test_packed_down_h_matches(rng):
    """H-pack-resident down conv: consumes H-PACKED packed input, emits the
    H-PACKED canonical stride-2 down output (k=2 pad (0,1) on both grids)."""
    from uresnet_tpu.ops.pack import d2s_h, pack_weight_down_h, s2d_h

    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 5)).astype(np.float32) * .2)
    want = ref_conv(x, w, s=2)                   # (2, 8, 8, 5)
    xp = space_to_depth(x)                       # (2, 8, 8, 12)
    xh = s2d_h(xp)                               # (2, 4, 8, 24)
    wdh = pack_weight_down_h(pack_weight_down(w))
    assert wdh.shape == (2, 2, 24, 10)
    got = d2s_h(conv_packed(xh, wdh, padding=(0, 1),
                            compute_dtype=jnp.float32, precision=HI))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-5)


def test_packed_up_h_matches(rng):
    """H-pack-resident up conv: consumes the UNPACKED coarse input, emits
    the H-PACKED packed transpose-conv output (k=3 H-stride-2 pad (1,0))."""
    from uresnet_tpu.ops.pack import d2s_h, pack_weight_up_h

    x = jnp.asarray(rng.standard_normal((2, 8, 8, 6)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 6, 4)).astype(np.float32) * .2)
    want = ref_convt(x, w)                       # (2, 16, 16, 4)
    wuh = pack_weight_up_h(pack_weight_up(w))
    assert wuh.shape == (3, 2, 6, 32)
    goth = conv_packed(x, wuh, padding=((1, 0), (1, 0)), stride=(2, 1),
                       compute_dtype=jnp.float32, precision=HI)
    assert goth.shape == (2, 4, 8, 32)           # H-packed packed output
    got = depth_to_space(d2s_h(goth))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-5)


@pytest.mark.parametrize("dims", [2, 3])
@pytest.mark.parametrize("C", [64, 128])
def test_s2d_d2s_reshape_path_equals_transpose_path(dims, C):
    """The >=128-lane reshape fast paths must stay bit-identical to the
    generic transpose path at TRIGGERING channel counts (round-2 advisor
    coverage gap: production 3D configs were the only exercise of the
    dims=3 reshape branch)."""
    rng = np.random.default_rng(17)
    S = (8,) * dims
    x = jnp.asarray(rng.standard_normal((2,) + S + (C,)), jnp.float32)
    a = space_to_depth(x, dims=dims, _force_path="reshape")
    b = space_to_depth(x, dims=dims, _force_path="transpose")
    assert C * 2 >= 128  # the auto heuristic picks the reshape path here
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # inverse: both branches, and the roundtrip, bit-exact
    ya = depth_to_space(a, dims=dims, _force_path="reshape")
    yb = depth_to_space(a, dims=dims, _force_path="transpose")
    np.testing.assert_array_equal(np.asarray(ya), np.asarray(yb))
    np.testing.assert_array_equal(np.asarray(ya), np.asarray(x))


@pytest.mark.parametrize("dims", [2, 3])
def test_einsum_pack_exact_forward_and_backward(dims):
    """The weight-pack einsums must be EXACT — forward (a pure relabeling:
    every packed slot selects exactly one canonical weight or 0) AND
    backward (f32 partial sums). This pins the Precision.HIGHEST fix for
    the packed-bf16 3D divergence: at DEFAULT precision the TPU lowers
    these einsums through single-pass bf16 dots, which is invisible in the
    forward (the conv casts kernels to bf16 anyway) but quantizes every
    weight-grad partial to bf16 BEFORE the sum into the canonical slot —
    the asymmetry (canonical path: exact f32 dw via ops/conv.py) that made
    packed-bf16 3D training diverge while canonical-bf16 and packed-f32
    converged (benchmarks/RESULTS.md "3D bf16" root cause). On CPU this
    test passes even at DEFAULT precision; it pins the contract so TPU
    test runs (and any future lowering change) catch a regression."""
    from uresnet_tpu.ops.pack import _dim_T, _einsum_pack

    k, ci, co = 3, 5, 7
    rng = np.random.default_rng(11)
    w = jnp.asarray(rng.standard_normal((k,) * dims + (ci, co)), jnp.float32)
    T = _dim_T("same", k).astype(np.float64)
    if dims == 2:
        ex = np.einsum("aupd,bvqe,deio->abuvipqo", T, T,
                       np.asarray(w, np.float64))
    else:
        ex = np.einsum("aupd,bvqe,cwrf,defio->abcuvwipqro", T, T, T,
                       np.asarray(w, np.float64))
    P = 2 ** dims
    ex = ex.reshape((k,) * dims + (P * ci, P * co))
    got = np.asarray(jax.jit(lambda w: _einsum_pack(w, "same", dims))(w),
                     np.float64)
    # forward: bit-exact relabeling (each output = one f32 input or 0)
    np.testing.assert_array_equal(got, ex)

    ct = jnp.asarray(rng.standard_normal(got.shape), jnp.float32)
    _, vjp = jax.vjp(lambda ww: _einsum_pack(ww, "same", dims), w)
    dw = np.asarray(vjp(ct)[0], np.float64)
    if dims == 2:
        dex = np.einsum("aupd,bvqe,abuvipqo->deio", T, T,
                        np.asarray(ct, np.float64).reshape(
                            (k, k, 2, 2, ci, 2, 2, co)))
    else:
        dex = np.einsum("aupd,bvqe,cwrf,abcuvwipqro->defio", T, T, T,
                        np.asarray(ct, np.float64).reshape(
                            (k, k, k, 2, 2, 2, ci, 2, 2, 2, co)))
    # backward: f32 partial sums (tolerance = f32 accumulation order only;
    # a bf16-quantized backward fails this by ~4 orders of magnitude)
    np.testing.assert_allclose(dw, dex, rtol=1e-5, atol=1e-6)


def _dot_precisions(jaxpr, out):
    """Collect every dot_general precision param, recursing into sub-jaxprs."""
    for eq in jaxpr.eqns:
        if eq.primitive.name == "dot_general":
            out.append(eq.params.get("precision"))
        for v in eq.params.values():
            for vv in (v if isinstance(v, (tuple, list)) else (v,)):
                if hasattr(vv, "jaxpr"):
                    _dot_precisions(vv.jaxpr, out)
    return out


@pytest.mark.parametrize("dims", [2, 3])
def test_pack_einsums_carry_highest_precision_fwd_and_bwd(dims):
    """Structural pin of the packed-bf16 divergence fix: EVERY dot in the
    weight-relabel einsums — forward AND the grad transpose — must carry
    Precision.HIGHEST. The value-level exactness test above cannot catch a
    precision regression on CPU CI (CPU default dots are already f32-exact);
    this jaxpr check does, platform-independently."""
    from uresnet_tpu.ops.pack import (pack_weight_conv_h, pack_weight_down_h,
                                      pack_weight_up_h)

    cases = [
        (lambda w: pack_weight_conv(w, dims), (3,) * dims + (4, 8)),
        (lambda w: pack_weight_down(w, dims), (3,) * dims + (4, 8)),
        (lambda w: pack_weight_up(w, dims), (3,) * dims + (4, 8)),
    ]
    if dims == 2:
        cases += [
            (lambda w: pack_weight_conv_h(pack_weight_conv(w, 2)), (3, 3, 4, 8)),
            (lambda w: pack_weight_down_h(pack_weight_down(w, 2)), (3, 3, 4, 8)),
            (lambda w: pack_weight_up_h(pack_weight_up(w, 2)), (3, 3, 4, 8)),
        ]
    hi = (lax.Precision.HIGHEST, lax.Precision.HIGHEST)
    for fn, shape in cases:
        w = jnp.zeros(shape, jnp.float32)
        jx = jax.make_jaxpr(jax.grad(lambda ww: fn(ww).sum()))(w)
        precs = _dot_precisions(jx.jaxpr, [])
        assert precs, "pack transform no longer lowers to dot_general"
        assert all(p == hi for p in precs), precs
