"""Device-side augmentation: random flips / 90-degree rotations, inside jit.

BASELINE.json config 3 requires "device-side prefetch + augmentation".
Flips and rot90 are the physically valid symmetries for wire-plane images
(charge is orientation-covariant); they apply identically to data, label and
weight maps. Everything is `jnp.where`-selected so shapes stay static under
jit (no data-dependent control flow, per the XLA compilation model).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def augment_batch(key: jax.Array, batch: Dict[str, jax.Array], *, dims: int = 2
                  ) -> Dict[str, jax.Array]:
    """Random per-batch flip along each spatial axis + (2D) rot90.

    Spatial axes are 1..dims for (B, *S) arrays; data has a trailing channel.
    """
    kf = jax.random.split(key, dims + 1)
    data, label, weight = batch["data"], batch["label"], batch["weight"]

    for ax in range(dims):
        do = jax.random.bernoulli(kf[ax])
        sl_ax = 1 + ax
        data = jnp.where(do, jnp.flip(data, axis=sl_ax), data)
        label = jnp.where(do, jnp.flip(label, axis=sl_ax), label)
        weight = jnp.where(do, jnp.flip(weight, axis=sl_ax), weight)

    if dims == 2 and data.shape[1] == data.shape[2]:
        do = jax.random.bernoulli(kf[dims])
        rot = lambda a: jnp.rot90(a, k=1, axes=(1, 2))
        data = jnp.where(do, rot(data), data)
        label = jnp.where(do, rot(label), label)
        weight = jnp.where(do, rot(weight), weight)

    out = dict(batch)
    out.update(data=data, label=label, weight=weight)
    return out
