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
    """Random PER-IMAGE flip along each spatial axis + (2D) rot90.

    Spatial axes are 1..dims for (B, *S) arrays; data has a trailing
    channel. Decisions are independent per batch row ((2^(dims+1))^B
    augmentation states, not 2^(dims+1) — round-2 review: one decision per
    BATCH was statistically weak). The key/decision sequence (split into
    dims+1 keys, one (B,)-bernoulli per axis, then the 2D rot90) is
    mirrored EXACTLY by the in-scatter path
    (data/device_pipeline.densify_on_device augment_key), pinned
    bit-for-bit in tests/test_device_pipeline.py.
    """
    kf = jax.random.split(key, dims + 1)
    data, label, weight = batch["data"], batch["label"], batch["weight"]
    B = data.shape[0]

    def sel(do, a, b):
        """Per-image select: broadcast the (B,) decision over the rest."""
        return jnp.where(do.reshape((B,) + (1,) * (a.ndim - 1)), a, b)

    for ax in range(dims):
        do = jax.random.bernoulli(kf[ax], shape=(B,))
        sl_ax = 1 + ax
        data = sel(do, jnp.flip(data, axis=sl_ax), data)
        label = sel(do, jnp.flip(label, axis=sl_ax), label)
        weight = sel(do, jnp.flip(weight, axis=sl_ax), weight)

    if dims == 2 and data.shape[1] == data.shape[2]:
        do = jax.random.bernoulli(kf[dims], shape=(B,))
        rot = lambda a: jnp.rot90(a, k=1, axes=(1, 2))
        data = sel(do, rot(data), data)
        label = sel(do, rot(label), label)
        weight = sel(do, rot(weight), weight)

    out = dict(batch)
    out.update(data=data, label=label, weight=weight)
    return out
