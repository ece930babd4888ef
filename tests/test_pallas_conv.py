"""Pallas fused conv kernel vs XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from uresnet_tpu.ops.pallas.conv2d import (fused_conv3x3_bn_relu,
                                           fused_conv3x3_bn_relu_v2)

DN = ("NHWC", "HWIO", "NHWC")


def ref(x, w, scale, bias, residual=None, relu=True):
    y = lax.conv_general_dilated(x, w, (1, 1), "SAME", dimension_numbers=DN,
                                 preferred_element_type=jnp.float32,
                                 precision=lax.Precision.HIGHEST)
    y = y * scale + bias
    if residual is not None:
        y = y + residual.astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(x.dtype)


@pytest.mark.parametrize("relu", [True, False])
def test_fused_conv_matches_xla(rng, relu):
    x = jnp.asarray(rng.standard_normal((2, 16, 8, 8)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 8)).astype(np.float32) * .2)
    scale = jnp.asarray(rng.uniform(0.5, 2.0, 8).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(8).astype(np.float32))
    got = fused_conv3x3_bn_relu(x, w, scale, bias, relu=relu, block_h=8,
                                interpret=True)
    want = ref(x, w, scale, bias, relu=relu)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4,
                               atol=1e-4)


@pytest.mark.parametrize("relu", [True, False])
def test_fused_conv_v2_matches_xla(rng, relu):
    """v2 (full-row DMA, value-level W shifts) — the variant that COMPILES
    on real TPU at 128-lane shapes (benchmarks/pallas_probe.py)."""
    x = jnp.asarray(rng.standard_normal((2, 16, 8, 8)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 8)).astype(np.float32) * .2)
    scale = jnp.asarray(rng.uniform(0.5, 2.0, 8).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(8).astype(np.float32))
    res = jnp.asarray(rng.standard_normal((2, 16, 8, 8)).astype(np.float32))
    got = fused_conv3x3_bn_relu_v2(x, w, scale, bias, res, relu=relu,
                                   block_h=8, interpret=True)
    want = ref(x, w, scale, bias, res, relu=relu)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4,
                               atol=1e-4)


def test_fused_conv_residual(rng):
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 8)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 8)).astype(np.float32) * .2)
    res = jnp.asarray(rng.standard_normal((1, 8, 8, 8)).astype(np.float32))
    one = jnp.ones(8, jnp.float32)
    zero = jnp.zeros(8, jnp.float32)
    got = fused_conv3x3_bn_relu(x, w, one, zero, res, block_h=4,
                                interpret=True)
    want = ref(x, w, one, zero, res)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4,
                               atol=1e-4)
