"""Device mesh + sharding helpers — the rebuild's "communication backend".

Capability parity (SURVEY.md §2.4): the reference has no custom comm layer
(single tf.Session); the rebuild's backend is this mesh/axis abstraction plus
XLA collectives compiled by pjit — psum for gradient/BN allreduce,
all_gather for eval metrics, ppermute for spatial halo exchange — riding ICI
within a slice. No hand-written transport.

Axes:
  * 'data'    — data parallelism (batch dim). Gradients/BN stats allreduce
                automatically under pjit because the reductions span the
                sharded batch dim.
  * 'spatial' — spatial-domain decomposition (conv-net analog of context
                parallelism, SURVEY.md §2.3): shard H (2D) or D (3D) with
                halo exchange (`uresnet_tpu.parallel.halo`).

Multi-host SPMD: call `jax.distributed.initialize()` before `make_mesh()`;
`jax.devices()` then spans all hosts and the same code runs unchanged.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"
MODEL_AXIS = "model"


def make_mesh(
    n_data: Optional[int] = None,
    n_spatial: int = 1,
    n_model: int = 1,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Mesh of shape (data, spatial, model). Defaults: all devices on the
    data axis. The model axis is the TP hook (SURVEY.md §2.3): channel-
    sharded convs via `uresnet_tpu.parallel.tp`."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None or n_data <= 0:
        n_data = len(devices) // (n_spatial * n_model)
        if n_data < 1:
            # without this, need = 0 passes the check below and Mesh gets
            # an empty (0, spatial, model) grid -> cryptic downstream error
            raise ValueError(
                f"mesh needs at least {n_spatial * n_model} devices for "
                f"spatial={n_spatial} x model={n_model}, have "
                f"{len(devices)}")
    need = n_data * n_spatial * n_model
    if need > len(devices):
        raise ValueError(f"mesh {n_data}x{n_spatial}x{n_model} needs {need} "
                         f"devices, have {len(devices)}")
    grid = np.array(devices[:need]).reshape(n_data, n_spatial, n_model)
    return Mesh(grid, (DATA_AXIS, SPATIAL_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh, *, spatial_dim: Optional[int] = None) -> NamedSharding:
    """Batch arrays: shard dim 0 over 'data' (and optionally one spatial dim
    over 'spatial')."""
    if spatial_dim is None:
        return NamedSharding(mesh, P(DATA_AXIS))
    spec = [DATA_AXIS] + [None] * spatial_dim
    spec[spatial_dim] = SPATIAL_AXIS
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
