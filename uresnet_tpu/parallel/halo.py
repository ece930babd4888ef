"""Spatial-domain decomposition with ICI halo exchange.

SURVEY.md §2.3: the conv-net analog of sequence/context parallelism — for
3D volumes (192^3) whose activations exceed per-chip HBM at large batch,
shard one spatial dim (H in 2D, D in 3D) across the 'spatial' mesh axis and
exchange receptive-field halos between neighbors with `lax.ppermute` (pure
ICI neighbor traffic, no all-to-all). Ring attention / Ulysses are N/A for
this model family (no attention operator); this module is the morally
equivalent mechanism.

Correctness contract (tested in tests/test_halo.py): a spatially sharded
SAME conv over the mesh == the unsharded SAME conv, bit-for-bit in f32.

Derivation: a SAME conv with stride s, kernel k on global extent H
(H % s == 0) pads total = max(k - s, 0), split lo = total//2, hi = total-lo.
Global output o reads input rows [o*s - lo, o*s - lo + k). A shard owning
rows [r0, r0+Hl) with r0 % s == 0 owns outputs [r0/s, (r0+Hl)/s) and
therefore needs `lo` rows before r0 and `k - s - lo` rows after its end —
fetched from neighbors (zeros at the global boundary, mirroring SAME).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from uresnet_tpu.parallel.mesh import SPATIAL_AXIS


def same_halo(kernel: int, stride: int) -> Tuple[int, int]:
    """(halo_lo, halo_hi) a shard needs along the sharded dim for SAME conv."""
    total = max(kernel - stride, 0)
    lo = total // 2
    hi = total - lo
    return lo, hi


def halo_exchange(
    x: jax.Array,
    *,
    lo: int,
    hi: int,
    axis: int,
    axis_name: str = SPATIAL_AXIS,
) -> jax.Array:
    """Extend the local shard with `lo` slices from the previous neighbor and
    `hi` slices from the next (zeros at the global boundary)."""
    if lo == 0 and hi == 0:
        return x
    if max(lo, hi) > x.shape[axis]:
        # halos are fetched from IMMEDIATE neighbors only; a kernel whose
        # receptive field spans more than one neighboring shard would need
        # multi-hop exchange (not a U-ResNet op — fail loudly, SURVEY.md §4)
        raise ValueError(
            f"halo ({lo},{hi}) exceeds the local shard extent "
            f"{x.shape[axis]} along axis {axis}; use fewer 'spatial' shards "
            f"or a smaller kernel")
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)

    def take(a, sl):
        slices = [slice(None)] * a.ndim
        slices[axis] = sl
        return a[tuple(slices)]

    parts = []
    if lo:
        # receive the previous shard's last `lo` slices
        fwd = [(i, (i + 1) % n) for i in range(n)]
        from_prev = lax.ppermute(take(x, slice(-lo, None)), axis_name, fwd)
        parts.append(jnp.where(idx == 0, jnp.zeros_like(from_prev), from_prev))
    parts.append(x)
    if hi:
        # receive the next shard's first `hi` slices
        bwd = [(i, (i - 1) % n) for i in range(n)]
        from_next = lax.ppermute(take(x, slice(0, hi)), axis_name, bwd)
        parts.append(jnp.where(idx == n - 1, jnp.zeros_like(from_next),
                               from_next))
    return jnp.concatenate(parts, axis=axis)


def sharded_conv(
    x: jax.Array,       # global (B, *S, C); `spatial_dim` sharded over 'spatial'
    w: jax.Array,       # (*k, Cin, Cout)
    *,
    mesh: Mesh,
    stride: int = 1,
    dims: int = 2,
    spatial_dim: int = 1,
    compute_dtype=jnp.float32,
    data_sharded: bool = False,
) -> jax.Array:
    """SAME conv with one spatial dim sharded over the 'spatial' mesh axis.

    Requires the local shard extent divisible by `stride` (stride phase then
    aligns on every shard). Numerically equal to the unsharded SAME conv.
    Set `data_sharded` when the batch dim is also sharded over 'data'
    (DP x CP mesh) — the conv is batch-local so nothing else changes.
    """
    from jax.experimental.shard_map import shard_map

    from uresnet_tpu.parallel.mesh import DATA_AXIS

    from uresnet_tpu.ops.conv import _dim_numbers, _precision

    k = w.shape[spatial_dim - 1]
    lo, hi = same_halo(k, stride)
    dn = _dim_numbers(dims)

    in_spec = [None] * (dims + 2)
    in_spec[spatial_dim] = SPATIAL_AXIS
    if data_sharded:
        in_spec[0] = DATA_AXIS
    spec = P(*in_spec)

    def local(xl, w):
        xl = halo_exchange(xl, lo=lo, hi=hi, axis=spatial_dim)
        pads = []
        for d in range(dims):
            if d == spatial_dim - 1:
                pads.append((0, 0))  # halo already supplied the SAME context
            else:
                kk = w.shape[d]
                total = max(kk - stride, 0)
                pads.append((total // 2, total - total // 2))
        # output dtype == operand dtype, like ops/conv.py: forcing
        # preferred_element_type=f32 under bf16 operands breaks the conv
        # BACKWARD on TPU (cotangent dtype mismatch — CLAUDE.md invariant);
        # the MXU accumulates in f32 internally either way
        return lax.conv_general_dilated(
            xl.astype(compute_dtype), w.astype(compute_dtype),
            window_strides=(stride,) * dims, padding=pads,
            dimension_numbers=dn, precision=_precision(compute_dtype))

    f = shard_map(local, mesh=mesh, in_specs=(spec, P()), out_specs=spec)
    return f(x, w)
