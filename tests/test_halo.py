"""Spatial-partition (halo exchange) correctness: sharded SAME conv ==
unsharded SAME conv (SURVEY.md §4 distributed tests, §2.3 CP analog)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from uresnet_tpu.parallel.halo import same_halo, sharded_conv
from uresnet_tpu.parallel.mesh import make_mesh


def unsharded_conv(x, w, stride, dims=2):
    dn = ("NHWC", "HWIO", "NHWC") if dims == 2 else ("NDHWC", "DHWIO", "NDHWC")
    return lax.conv_general_dilated(
        x, w, (stride,) * dims, "SAME", dimension_numbers=dn,
        preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST)


def test_same_halo_values():
    assert same_halo(3, 1) == (1, 1)
    assert same_halo(3, 2) == (0, 1)
    assert same_halo(1, 1) == (0, 0)
    assert same_halo(5, 1) == (2, 2)


@pytest.mark.parametrize("stride", [1, 2])
@pytest.mark.parametrize("k", [1, 3, 5])
def test_sharded_conv2d_matches(stride, k):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 32, 16, 3)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((k, k, 3, 4)).astype(np.float32))
    mesh = make_mesh(1, 4)
    got = sharded_conv(x, w, mesh=mesh, stride=stride, dims=2, spatial_dim=1)
    want = unsharded_conv(x, w, stride)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-5)


def test_halo_wider_than_shard_raises():
    """Receptive field spanning beyond the immediate neighbor shard must
    fail loudly (multi-hop halo is unsupported, not silently wrong)."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 2)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((9, 9, 2, 2)).astype(np.float32))
    mesh = make_mesh(1, 4)  # 2-row shards; k=9 needs 4-row halos
    with pytest.raises(ValueError, match="halo"):
        sharded_conv(x, w, mesh=mesh, stride=1, dims=2, spatial_dim=1)


def test_sharded_conv3d_matches():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 16, 8, 8, 2)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 2, 3)).astype(np.float32))
    mesh = make_mesh(1, 4)
    got = sharded_conv(x, w, mesh=mesh, stride=1, dims=3, spatial_dim=1)
    want = unsharded_conv(x, w, 1, dims=3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-5)


def test_sharded_conv_with_data_axis_too():
    """2x4 (data x spatial) mesh: batch and H sharded simultaneously."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((4, 16, 8, 2)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 2, 2)).astype(np.float32))
    mesh = make_mesh(2, 4)
    from jax.sharding import NamedSharding, PartitionSpec as P
    xs = jax.device_put(x, NamedSharding(mesh, P("data", "spatial")))
    got = sharded_conv(xs, w, mesh=mesh, stride=1, dims=2, spatial_dim=1,
                       data_sharded=True)
    want = unsharded_conv(x, w, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-5)
