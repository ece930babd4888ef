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


def _crop_window(sparse: Dict[str, jax.Array], image_size: int):
    """Shared crop math (identical to pipeline.crop_or_pad_coords, tested
    bit-level): returns (shifted coords (B,P,D) int32, in_window (B,P) bool,
    point-validity mask (B,P) bool, origin (B,D) int32) for a padded sparse
    batch. The origin is exported by the ana steps so the host rebuilds the
    SAME window with pure integer math instead of recomputing the f32
    centroid (engine/evaluator.py) — host and device floor/clamp could
    otherwise disagree by one pixel at a rounding boundary."""
    coords = sparse["coords"].astype(jnp.int32)      # (B, P, D)
    values = sparse["values"].astype(jnp.float32)    # (B, P)
    npoints = sparse["npoints"].astype(jnp.int32)    # (B,)
    shape = sparse["shape"].astype(jnp.int32)        # (B, D)
    B, P, D = coords.shape
    T = image_size

    mask = (jnp.arange(P)[None, :] < npoints[:, None])           # (B, P)

    # crop origin: charge-weighted centroid (half-up rounding), clamped so
    # the max-charge pixel stays in the window (an unweighted centroid can
    # whiff between tracks), then to the image.
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
    return shifted, in_win, mask, origin


def crop_origin(sparse: Dict[str, jax.Array], *, image_size: int) -> jax.Array:
    """(B, D) int32 crop origin the device pipeline uses for this batch —
    exported by the ana steps so host-side score export applies the exact
    device window (integer subtraction, no recomputed centroid)."""
    return _crop_window(sparse, image_size)[3]


@functools.partial(jax.jit, static_argnames=(
    "image_size", "num_class", "normalize_scale", "normalize_clip",
    "weight_mode", "nonzero_boost", "target_phases", "target_hpack"))
def densify_on_device(
    sparse: Dict[str, jax.Array],
    *,
    image_size: int,
    num_class: int = 3,
    normalize_scale: float = 0.01,
    normalize_clip: float = 10.0,
    weight_mode: str = "class_balance",
    nonzero_boost: float = 1.0,
    augment_key: jax.Array = None,
    target_phases: int = 1,
    target_hpack: bool = False,
) -> Dict[str, jax.Array]:
    """See module docstring. Two round-2 extensions, both pure index math on
    the ~4k points per image (so they cost ~nothing vs the full-image
    passes they replace — benchmarks/RESULTS.md):

    * ``augment_key``: apply engine.augment.augment_batch's random
      flips/rot90 INSIDE the scatter by transforming the window coordinates
      — bit-identical to augmenting the densified images with the same key
      (flip/rot are bijections of the crop window), at point-cloud cost.
    * ``target_phases``/``target_hpack``: scatter label and weight directly
      into the PACKED loss layout (models/packed.py loss_layout_phases /
      pack_like_logits order), enabling the d2s-free packed train loss
      without any full-resolution target relayout. ``data`` stays canonical
      (the packed model does its own stem s2d)."""
    values = sparse["values"].astype(jnp.float32)    # (B, P)
    labels = sparse["labels"].astype(jnp.int32)      # (B, P)
    B, P, D = sparse["coords"].shape
    T = image_size

    shifted, in_win, mask, _ = _crop_window(sparse, image_size)

    if augment_key is not None:
        # Mirror augment_batch's key/decision sequence EXACTLY (one
        # (B,)-bernoulli PER IMAGE per spatial axis, then the 2D rot90) so
        # densify(aug_key) == augment_batch(aug_key, densify(...))
        # bit-for-bit (tests/test_device_pipeline.py). Per-image decisions
        # are index math on the (B,) axis — still point-cloud cost.
        kf = jax.random.split(augment_key, D + 1)
        s = jnp.clip(shifted, 0, T - 1)
        comps = []
        for d in range(D):
            do = jax.random.bernoulli(kf[d], shape=(B,))
            comps.append(jnp.where(do[:, None], T - 1 - s[..., d],
                                   s[..., d]))
        s = jnp.stack(comps, axis=-1)
        if D == 2:
            # np.rot90(a, 1, (1, 2)): out[i, j] = in[j, T-1-i]  =>  a point
            # at (y, x) lands at (T-1-x, y)
            do = jax.random.bernoulli(kf[D], shape=(B,))
            s = jnp.where(do[:, None, None],
                          jnp.stack([T - 1 - s[..., 1], s[..., 0]], -1), s)
        shifted = s

    # flatten window coords; out-of-window points -> npix (dropped)
    npix = T ** D
    flat = jnp.zeros((B, P), jnp.int32)
    for d in range(D):
        flat = flat * T + jnp.clip(shifted[..., d], 0, T - 1)
    flat = jnp.where(in_win, flat, npix)

    # packed-target flat index: position (coarse grid) major, then the
    # phase-major channel (hp, p_0, ..., p_{D-1}) — the exact order
    # pack_like_logits/space_to_depth[+s2d_h] produce
    if target_phases > 1:
        c = jnp.clip(shifted, 0, T - 1)
        blk = c // 2                                # per-dim coarse index
        ph = c % 2                                  # per-dim phase
        if target_hpack:
            hp = blk[..., 0] % 2
            row = blk[..., 0] // 2                  # H/4 grid
            pos = row
            for d in range(1, D):
                pos = pos * (T // 2) + blk[..., d]
            phase = hp
            for d in range(D):
                phase = phase * 2 + ph[..., d]
        else:
            pos = blk[..., 0]
            for d in range(1, D):
                pos = pos * (T // 2) + blk[..., d]
            phase = jnp.zeros_like(pos)
            for d in range(D):
                phase = phase * 2 + ph[..., d]
        flat_t = pos * target_phases + phase
        flat_t = jnp.where(in_win, flat_t, npix)
    else:
        flat_t = flat

    vals = jnp.clip(values * normalize_scale, 0.0, normalize_clip)

    def scatter_one(flat_i, flat_ti, vals_i, labs_i):
        data = jnp.zeros((npix + 1,), jnp.float32).at[flat_i].set(
            vals_i, mode="drop")
        lab = jnp.zeros((npix + 1,), jnp.int32).at[flat_ti].set(
            labs_i, mode="drop")
        return data[:npix], lab[:npix]

    data, label = jax.vmap(scatter_one)(flat, flat_t, vals, labels)
    data = data.reshape((B,) + (T,) * D)
    if target_phases > 1:
        h0 = T // (4 if target_hpack else 2)
        tshape = (B, h0) + (T // 2,) * (D - 1) + (target_phases,)
        label = label.reshape(tshape)
    else:
        label = label.reshape((B,) + (T,) * D)

    if weight_mode == "ones":
        weight = jnp.ones(label.shape, jnp.float32)
    elif weight_mode == "nonzero":
        if target_phases > 1:
            # nonzero mask in the TARGET layout: scatter the charge at the
            # packed index too (per-pixel bijection of the canonical mask)
            data_t = jax.vmap(lambda fi, vi: jnp.zeros(
                (npix + 1,), jnp.float32).at[fi].set(vi, mode="drop")[:npix]
            )(flat_t, vals).reshape(label.shape)
        else:
            data_t = data
        weight = jnp.where(data_t > 0, 1.0 + nonzero_boost, 1.0)
    elif weight_mode == "file":
        # file-driven weight product (USEF v2): scatter the per-point
        # weights at the (possibly packed) target index over a base of 1.0
        # (background weight — see data/pipeline.py 'file' mode). Padded
        # rows carry flat_t == npix, so the base survives them via drop.
        fw = sparse["weights"].astype(jnp.float32)
        weight = jax.vmap(lambda fi, wi: jnp.ones(
            (npix + 1,), jnp.float32).at[fi].set(wi, mode="drop")[:npix]
        )(flat_t, fw).reshape(label.shape)
    elif weight_mode == "class_balance":
        # per-pixel function of the label map — layout-invariant (the pixel
        # multiset is identical in canonical and packed target layouts)
        flat_lab = label.reshape(B, -1)
        one_hot = jax.nn.one_hot(flat_lab, num_class, dtype=jnp.float32)
        counts = one_hot.sum(axis=1)                              # (B, C)
        total = float(npix)
        w_class = jnp.where(counts > 0, total / (num_class * counts), 0.0)
        # one-hot contraction, not take_along_axis (gather is scalar-slow
        # on TPU — see engine/losses.py). Precision.HIGHEST: each pixel
        # selects exactly ONE class weight, so true-f32 passes make the
        # selection EXACT; at DEFAULT the TPU's bf16 dot pass would round
        # the weight map and break host==device weight equality on TPU
        # (same failure class as ops/pack.py _einsum_pack — see there)
        weight = jnp.einsum("bpc,bc->bp", one_hot, w_class,
                            precision=jax.lax.Precision.HIGHEST)
        weight = weight.reshape(label.shape)
    else:
        raise ValueError(f"unknown weight mode {weight_mode!r}")

    return {"data": data[..., None], "label": label, "weight": weight}


def scores_at_points(
    sparse: Dict[str, jax.Array],
    scores: jax.Array,            # (B, *S, C) per-pixel score maps
    *,
    image_size: int,
) -> jax.Array:
    """Gather per-pixel scores back at the sparse batch's point coordinates
    (the crop window math shared with `densify_on_device`). Returns
    (B, P, C); rows for padded/out-of-window points carry garbage — mask
    them with the window rebuilt from the exported `crop_origin` (integer
    math, exactly the device window).

    This is the ana-export fast path (SURVEY.md §3.2): the reference's
    score writeback only needs scores AT the charge pixels, so reading back
    (B, P, C) instead of the dense (B, *S, C) volumes cuts the
    device->host transfer ~60x at 512^2/4k points — the relay link, not
    the forward, bounds end-to-end inference (benchmarks/RESULTS.md).
    The gather is (B, P) indices — point-cloud sized, nothing like the
    full-image take_along_axis the loss once lost 30% of a step to."""
    T = image_size
    B, P, D = sparse["coords"].shape
    shifted, in_win, _, _ = _crop_window(sparse, T)
    flat = jnp.zeros((B, P), jnp.int32)
    for d in range(D):
        flat = flat * T + jnp.clip(shifted[..., d], 0, T - 1)
    flat = jnp.where(in_win, flat, 0)
    C = scores.shape[-1]
    flat_scores = scores.reshape(B, T ** D, C)
    return jnp.take_along_axis(flat_scores, flat[..., None], axis=1)
