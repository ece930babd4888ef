"""BN-folded inference forward == eval-mode forward (f32, SURVEY.md §2.2
conv-BN-ReLU fusion target)."""

import jax
import jax.numpy as jnp
import numpy as np

from uresnet_tpu.config import ModelConfig
from uresnet_tpu.models.fold import fold_batchnorm, uresnet_apply_folded
from uresnet_tpu.models.uresnet import uresnet_apply, uresnet_init


def test_folded_matches_eval_forward():
    cfg = ModelConfig(depth=2, base_filters=4, num_class=3,
                      compute_dtype="float32")
    params, state = uresnet_init(jax.random.PRNGKey(11), cfg)
    # give the BN stats non-trivial values via a train step
    x_warm = jax.random.uniform(jax.random.PRNGKey(12), (2, 16, 16, 1))
    _, state = uresnet_apply(params, state, x_warm, cfg=cfg, train=True)

    x = jax.random.uniform(jax.random.PRNGKey(13), (2, 16, 16, 1))
    want, _ = uresnet_apply(params, state, x, cfg=cfg, train=False)
    folded = fold_batchnorm(params, state, cfg)
    got = uresnet_apply_folded(folded, x, cfg=cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4,
                               atol=1e-4)


def test_folded_3d():
    cfg = ModelConfig(dims=3, depth=2, base_filters=2, num_class=3,
                      compute_dtype="float32")
    params, state = uresnet_init(jax.random.PRNGKey(14), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(15), (1, 8, 8, 8, 1))
    want, _ = uresnet_apply(params, state, x, cfg=cfg, train=False)
    folded = fold_batchnorm(params, state, cfg)
    got = uresnet_apply_folded(folded, x, cfg=cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4,
                               atol=1e-4)


def test_folded_pallas_backend_matches_xla():
    """model.kernel_backend='pallas' routes eligible units (2D 3x3 stride-1,
    128-lane channels) through the fused Pallas kernel (interpret mode on
    CPU) and must match the XLA folded forward (the A/B path the knob
    exists for — round-2 review: the knob must have a consumer)."""
    import dataclasses

    cfg = ModelConfig(depth=1, base_filters=128, blocks_per_level=1,
                      num_class=3, compute_dtype="float32")
    params, state = uresnet_init(jax.random.PRNGKey(21), cfg)
    x_warm = jax.random.uniform(jax.random.PRNGKey(22), (1, 16, 16, 1))
    _, state = uresnet_apply(params, state, x_warm, cfg=cfg, train=True)

    x = jax.random.uniform(jax.random.PRNGKey(23), (1, 16, 16, 1))
    folded = fold_batchnorm(params, state, cfg)
    want = uresnet_apply_folded(folded, x, cfg=cfg)
    got = uresnet_apply_folded(
        folded, x, cfg=dataclasses.replace(cfg, kernel_backend="pallas"))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-5)


def test_kernel_backend_validated():
    import dataclasses
    import pytest

    cfg = ModelConfig(depth=1, base_filters=4, compute_dtype="float32")
    params, state = uresnet_init(jax.random.PRNGKey(2), cfg)
    folded = fold_batchnorm(params, state, cfg)
    x = jnp.zeros((1, 8, 8, 1))
    with pytest.raises(ValueError, match="kernel_backend"):
        uresnet_apply_folded(
            folded, x, cfg=dataclasses.replace(cfg, kernel_backend="cuda"))
