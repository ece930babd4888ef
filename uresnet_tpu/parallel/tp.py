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

Full-model TP (`tp_state_shardings`): the GSPMD route — annotate every conv
kernel's output-channel dim (and the channel dim of its BN/bias vectors)
with the 'model' axis and let the partitioner place the collectives, per
the scaling-book recipe ("pick a mesh, annotate shardings, let XLA insert
collectives"). Storage (params, BN stats, Adam moments) is channel-sharded
over 'model'; activations become channel-sharded where the compiler keeps
the conv output-feature-partitioned. Enabled by `parallel.model > 1`
(engine/trainer.py); numerically equal to the unsharded step
(tests/test_tp.py, __graft_entry__.dryrun_multichip DPxTP leg). Canonical
layout only: the packed path derives its kernels by channel-phase
relabeling gathers (ops/pack.py) that contradict a channel sharding.
Composes with DP but NOT with spatial partitioning: XLA's SPMD partitioner
miscompiles convs that are both spatially and output-feature partitioned
(O(1)-wrong output everywhere; reproduced with raw lax.conv_general_dilated
on jax 0.9.0), so engine/trainer.py rejects spatial x model meshes — the
canary test_spatial_x_model_conv_miscompile flags when XLA is fixed.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from uresnet_tpu.parallel.mesh import MODEL_AXIS


def tp_spec(path, leaf) -> P:
    """PartitionSpec for one train-state leaf under full-model TP.

    Leaf-name rule (the param trees of models/uresnet.py):
      * conv kernels  — dict key 'w', ndim >= 3, layout (*k, Cin, Cout):
        shard Cout over 'model' (column-parallel storage);
      * channel vectors — 'scale'/'bias' (BN), 'b' (conv bias),
        'mean'/'var' (BN running stats), ndim == 1: shard dim 0, matching
        the producing conv's output sharding.
    Everything else (PRNG key, step counters, the num_class head whose Cout
    is not divisible) stays replicated. Adam moments mirror the param tree,
    so the same rule applied to their paths shards them identically.
    """
    name = None
    for entry in reversed(path):
        key = getattr(entry, "key", getattr(entry, "name", None))
        if isinstance(key, str):
            name = key
            break
    shape = getattr(leaf, "shape", ())
    if name == "w" and len(shape) >= 3:
        return P(*([None] * (len(shape) - 1) + [MODEL_AXIS]))
    if name in ("scale", "bias", "b", "mean", "var") and len(shape) == 1:
        return P(MODEL_AXIS)
    return P()


def tp_state_shardings(mesh: Mesh, tree):
    """NamedSharding pytree for a TrainState-like tree under full-model TP.

    `tree` may hold arrays or ShapeDtypeStructs (jax.eval_shape output).
    Leaves whose sharded dim is not divisible by the 'model' axis size fall
    back to replicated — e.g. the head conv (Cout = num_class).
    """
    from jax.sharding import NamedSharding

    n_model = dict(mesh.shape).get(MODEL_AXIS, 1)

    def one(path, leaf):
        spec = tp_spec(path, leaf)
        shape = getattr(leaf, "shape", ())
        for dim, axis in enumerate(spec):
            if axis is not None and shape[dim] % n_model:
                spec = P()
                break
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(one, tree)


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
