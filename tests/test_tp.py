"""TP hook: column/row channel-sharded conv pair == unsharded pair with one
allreduce (SURVEY.md §2.3)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from uresnet_tpu.parallel.mesh import make_mesh
from uresnet_tpu.parallel.tp import conv_col, conv_row

HI = lax.Precision.HIGHEST
DN = ("NHWC", "HWIO", "NHWC")


def ref(x, w):
    return lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                    dimension_numbers=DN, precision=HI)


def test_col_row_pair_matches_unsharded():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 4)).astype(np.float32))
    w1 = jnp.asarray(rng.standard_normal((3, 3, 4, 8)).astype(np.float32) * .2)
    w2 = jnp.asarray(rng.standard_normal((3, 3, 8, 4)).astype(np.float32) * .2)

    want = ref(jax.nn.relu(ref(x, w1)), w2)

    mesh = make_mesh(n_data=1, n_spatial=1, n_model=4)
    h = conv_col(x, w1, mesh=mesh, precision=HI)
    h = jax.nn.relu(h)
    got = conv_row(h, w2, mesh=mesh, precision=HI)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-5)


def test_mesh_three_axes():
    mesh = make_mesh(2, 2, 2)
    assert mesh.devices.shape == (2, 2, 2)
    assert mesh.axis_names == ("data", "spatial", "model")
