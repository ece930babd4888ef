"""Tensor (channel) parallelism hook for conv stacks.

SURVEY.md §2.3: TP is absent in the reference and optional in the rebuild —
"shard conv channels over a 'model' axis for large 3D nets; design the mesh
API so it's a second axis, not a rewrite". This module is that hook: a pair
of shard_map conv wrappers implementing the Megatron-style column/row split
for back-to-back convs (e.g. the two 3x3 convs of a residual block):

  * `conv_col`: output channels sharded over 'model' — each device computes
    its Cout/n slice with the full input; no communication.
  * `conv_row`: input channels sharded over 'model' — each device contracts
    its Cin/n slice; partial sums are combined with one `psum` over ICI.

conv_col -> (elementwise) -> conv_row reproduces the unsharded pair with a
single allreduce, verified in tests/test_tp.py on the virtual CPU mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from uresnet_tpu.parallel.mesh import MODEL_AXIS


def _conv(x, w, dims, compute_dtype, precision):
    from uresnet_tpu.ops.conv import _dim_numbers, _precision

    if precision is None:
        # same defaulting as ops/conv.py: f32 compute means TRUE f32
        # numerics (HIGHEST) — without it the TPU lowers f32 convs through
        # bf16 passes and the documented equality with the unsharded pair
        # fails on hardware (round-3 review)
        precision = _precision(compute_dtype)
    return lax.conv_general_dilated(
        x.astype(compute_dtype), w.astype(compute_dtype),
        window_strides=(1,) * dims, padding="SAME",
        dimension_numbers=_dim_numbers(dims), precision=precision)


def conv_col(x, w, *, mesh: Mesh, dims: int = 2,
             compute_dtype=jnp.float32, precision=None):
    """Column-parallel conv: w sharded on Cout; output channel-sharded."""
    from jax.experimental.shard_map import shard_map

    nd = dims + 2
    w_spec = P(*([None] * (dims + 1) + [MODEL_AXIS]))
    x_spec = P(*([None] * nd))
    y_spec = P(*([None] * (nd - 1) + [MODEL_AXIS]))

    def local(x, w):
        return _conv(x, w, dims, compute_dtype, precision)

    return shard_map(local, mesh=mesh, in_specs=(x_spec, w_spec),
                     out_specs=y_spec)(x, w)


def conv_row(x, w, *, mesh: Mesh, dims: int = 2,
             compute_dtype=jnp.float32, precision=None):
    """Row-parallel conv: w sharded on Cin, x channel-sharded; one psum."""
    from jax.experimental.shard_map import shard_map

    nd = dims + 2
    w_spec = P(*([None] * dims + [MODEL_AXIS, None]))
    x_spec = P(*([None] * (nd - 1) + [MODEL_AXIS]))
    y_spec = P(*([None] * nd))

    def local(x, w):
        y = _conv(x, w, dims, compute_dtype, precision)
        return lax.psum(y, MODEL_AXIS)

    return shard_map(local, mesh=mesh, in_specs=(x_spec, w_spec),
                     out_specs=y_spec)(x, w)
