"""On-device dense-ification: padded sparse events -> model-ready batches,
inside jit.

BASELINE.json north_star: "the larcv-style data path (image2d decode,
crop/pad to power-of-two, pixel-value normalization, label/weight-map
construction) moves ON-DEVICE with host-side double-buffered prefetch".
Measured motivation (benchmarks/RESULTS.md): a dense 512^2 x batch-32 batch
is ~100 MB of host->device traffic per step, which starves the device
through the relay; the padded sparse form is ~2 MB (LArTPC images are ~99%
empty, SURVEY.md §2.1).

The host (C++ decoder or Python loader in sparse mode) ships per batch:
    coords  (B, P, dims) int32   event pixel coordinates (padded)
    values  (B, P)       float32 charge
    labels  (B, P)       int32
    npoints (B,)         int32   valid prefix length
    shape   (B, dims)    int32   source detector image extent
and this module reproduces `uresnet_tpu.data.pipeline.densify_plane`
EXACTLY on device (tested bit-level in tests/test_device_pipeline.py):
centroid crop with half-up rounding and window clamping, normalization with
clipping, label map, and the configured weight map.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=(
    "image_size", "num_class", "normalize_scale", "normalize_clip",
    "weight_mode", "nonzero_boost"))
def densify_on_device(
    sparse: Dict[str, jax.Array],
    *,
    image_size: int,
    num_class: int = 3,
    normalize_scale: float = 0.01,
    normalize_clip: float = 10.0,
    weight_mode: str = "class_balance",
    nonzero_boost: float = 1.0,
) -> Dict[str, jax.Array]:
    coords = sparse["coords"].astype(jnp.int32)      # (B, P, D)
    values = sparse["values"].astype(jnp.float32)    # (B, P)
    labels = sparse["labels"].astype(jnp.int32)      # (B, P)
    npoints = sparse["npoints"].astype(jnp.int32)    # (B,)
    shape = sparse["shape"].astype(jnp.int32)        # (B, D)
    B, P, D = coords.shape
    T = image_size

    mask = (jnp.arange(P)[None, :] < npoints[:, None])           # (B, P)

    # crop origin, identical to pipeline.crop_or_pad_coords: charge-weighted
    # centroid (half-up rounding), clamped so the max-charge pixel stays in
    # the window (an unweighted centroid can whiff between tracks), then to
    # the image.
    vmask = values * mask
    vsum = jnp.sum(vmask, axis=1)                                 # (B,)
    w = vmask / jnp.maximum(vsum, 1e-30)[:, None]
    center_w = jnp.sum(coords.astype(jnp.float32) * w[..., None], axis=1)
    n = jnp.maximum(npoints, 1).astype(jnp.float32)
    center_u = (jnp.sum(coords * mask[..., None], axis=1).astype(jnp.float32)
                / n[:, None])
    center = jnp.where((vsum > 0)[:, None], center_w, center_u)
    center = jnp.where((npoints > 0)[:, None], center,
                       shape.astype(jnp.float32) / 2.0)
    # anchor: coordinate of the max-charge point (first point if no charge)
    amax = jnp.argmax(jnp.where(mask, values, -jnp.inf), axis=1)  # (B,)
    anchor = jnp.take_along_axis(coords, amax[:, None, None], axis=1)[:, 0]
    lo = jnp.floor(center - T / 2.0 + 0.5).astype(jnp.int32)
    lo = jnp.clip(lo, anchor - T + 1, anchor)
    hi = jnp.maximum(shape - T, 0)
    origin = jnp.where((npoints > 0)[:, None], jnp.clip(lo, 0, hi),
                       jnp.clip(jnp.floor(
                           shape.astype(jnp.float32) / 2.0 - T / 2.0 + 0.5
                       ).astype(jnp.int32), 0, hi))               # (B, D)

    shifted = coords - origin[:, None, :]
    in_win = jnp.all((shifted >= 0) & (shifted < T), axis=-1) & mask

    # flatten window coords; out-of-window points -> T^D (dropped)
    flat = jnp.zeros((B, P), jnp.int32)
    for d in range(D):
        flat = flat * T + jnp.clip(shifted[..., d], 0, T - 1)
    npix = T ** D
    flat = jnp.where(in_win, flat, npix)

    vals = jnp.clip(values * normalize_scale, 0.0, normalize_clip)

    def scatter_one(flat_i, vals_i, labs_i):
        data = jnp.zeros((npix + 1,), jnp.float32).at[flat_i].set(
            vals_i, mode="drop")
        lab = jnp.zeros((npix + 1,), jnp.int32).at[flat_i].set(
            labs_i, mode="drop")
        return data[:npix], lab[:npix]

    data, label = jax.vmap(scatter_one)(flat, vals, labels)
    data = data.reshape((B,) + (T,) * D)
    label = label.reshape((B,) + (T,) * D)

    if weight_mode == "ones":
        weight = jnp.ones_like(data)
    elif weight_mode == "nonzero":
        weight = jnp.where(data > 0, 1.0 + nonzero_boost, 1.0)
    elif weight_mode == "class_balance":
        flat_lab = label.reshape(B, -1)
        one_hot = jax.nn.one_hot(flat_lab, num_class, dtype=jnp.float32)
        counts = one_hot.sum(axis=1)                              # (B, C)
        total = float(npix)
        w_class = jnp.where(counts > 0, total / (num_class * counts), 0.0)
        # one-hot contraction, not take_along_axis (gather is scalar-slow
        # on TPU — see engine/losses.py)
        weight = jnp.einsum("bpc,bc->bp", one_hot, w_class)
        weight = weight.reshape(data.shape)
    else:
        raise ValueError(f"unknown weight mode {weight_mode!r}")

    return {"data": data[..., None], "label": label, "weight": weight}
