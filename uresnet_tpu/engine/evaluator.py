"""Inference / analysis path.

Capability parity (SURVEY.md §3.2 `ana_step`): stream events sequentially
(RandomAccess=false), run the batched multi-plane forward pass, and write
per-pixel softmax score maps back out per event — the reference does this
via larcv output Image2D per class; here scores are exported sparsely (at
charge pixels, where the physics lives) plus the predicted label map, into
a compressed .npz per input file. Also provides whole-dataset metric
evaluation (mIoU / accuracies) for the BASELINE parity gate.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import numpy as np

from uresnet_tpu.data import events as ev
from uresnet_tpu.data.pipeline import crop_or_pad_coords, densify_batch
from uresnet_tpu.engine.trainer import Trainer, TrainState


def score_plane_id(plane_id: int, cls: int, num_class: int) -> int:
    """USEF score-export plane-id convention: the per-class score image of
    input plane `p` is stored as plane_id = p * num_class + cls (the
    reference writes one larcv Image2D per class, SURVEY.md §3.2)."""
    return plane_id * num_class + cls


def _write_export(output_file, fmt, *, dims, num_class, usef_events,
                  npz_columns):
    """Atomic export writer shared by the dense and sparse-export paths:
    fmt='usef' writes the score-plane events; fmt='npz' concatenates the
    accumulated per-plane column lists (empty-safe)."""
    if fmt == "usef":
        tmpu = output_file + ".tmp"
        ev.write_events(tmpu, usef_events, ndims=dims)
        os.replace(tmpu, output_file)
        return
    out_event, out_plane, out_coords, out_scores, out_pred, out_label = \
        npz_columns
    result = {
        "event_id": (np.concatenate(out_event) if out_event
                     else np.zeros(0, np.int32)),
        "plane_id": (np.concatenate(out_plane) if out_plane
                     else np.zeros(0, np.int32)),
        "coords": (np.concatenate(out_coords) if out_coords
                   else np.zeros((0, dims), np.int32)),
        "scores": (np.concatenate(out_scores) if out_scores
                   else np.zeros((0, num_class), np.float32)),
        "pred": (np.concatenate(out_pred) if out_pred
                 else np.zeros(0, np.int32)),
        "label": (np.concatenate(out_label) if out_label
                  else np.zeros(0, np.int32)),
    }
    tmp = output_file + ".tmp"
    with open(tmp, "wb") as f:
        np.savez_compressed(f, **result)
    os.replace(tmp, output_file)


def _select_export_pixels(coords, values, extents, *, scale, clip):
    """npz export pixel selection — THE one copy of the recipe shared by the
    single-window and tiled paths (round-3 review: two hand-kept copies of
    load-bearing logic): dedupe colliding points LAST-WINS at their pixel
    (densify scatters in file order, so the last assignment sticks), then
    keep pixels whose clipped normalized value is positive, in sorted
    flat-index (np.argwhere) order. `coords` are non-negative integer
    positions inside a box of per-dimension `extents` (the model window for
    the single-window path, the detector plane for the tiled path). Returns
    selected indices into `coords`."""
    npt = len(coords)
    if npt == 0:
        return np.zeros(0, np.int64)
    flat = np.zeros(npt, np.int64)
    for d, ext in enumerate(extents):
        flat = flat * int(ext) + coords[:, d]
    order = np.argsort(flat, kind="stable")
    flat_s = flat[order]
    keep = np.ones(npt, bool)
    keep[:-1] = flat_s[1:] != flat_s[:-1]      # keep the LAST of each run
    sel = order[keep]
    return sel[np.clip(values[sel] * scale, 0.0, clip) > 0]


def _make_ana_step(trainer: Trainer):
    """Jitted ana step: (sparse or dense) batch -> densified data/label +
    softmax scores in ONE dispatch — the streamed inference path reuses the
    training data plane (device densify + prefetch) instead of serial host
    densification (round-2 review: the ana path re-serialized everything
    the data plane solved)."""
    from uresnet_tpu.models.uresnet import uresnet_apply

    def step(ts: TrainState, batch):
        out = {}
        if "coords" in batch:
            from uresnet_tpu.data.device_pipeline import (crop_origin,
                                                          densify_on_device)

            d = trainer.cfg.data
            dense = densify_on_device(
                batch, image_size=d.image_size,
                num_class=trainer.cfg.model.num_class,
                normalize_scale=d.normalize_scale,
                normalize_clip=d.normalize_clip, weight_mode="ones")
            # export the crop origin so the host rebuilds the EXACT device
            # window with integer math (a recomputed host centroid can
            # disagree by one pixel at a rounding boundary — round-3 review)
            out["origin"] = crop_origin(batch, image_size=d.image_size)
        else:
            dense = batch
        logits, _ = uresnet_apply(ts.params, ts.model_state, dense["data"],
                                  cfg=trainer.cfg.model, train=False)
        out.update(data=dense["data"], label=dense["label"],
                   scores=jax.nn.softmax(logits, axis=-1))
        return out

    if "ana_step" not in trainer._compiled:  # one executable per trainer
        trainer._compiled["ana_step"] = jax.jit(
            step, in_shardings=(trainer._ts_sh, None),
            out_shardings=trainer._bsh_data_only)
    return trainer._compiled["ana_step"]


def _produce_host(trainer, ts, input_file, n, bs_events):
    """Legacy synchronous producer: host densify + trainer.forward."""
    cfg = trainer.cfg
    planes = tuple(cfg.data.planes)
    for start in range(0, n, bs_events):
        idxs = list(range(start, min(start + bs_events, n)))
        events = ev.read_events(input_file, idxs)
        # pad the trailing batch so the jitted forward sees a static shape
        pad = bs_events - len(events)
        batch = densify_batch(
            events + [events[-1]] * pad,
            image_size=cfg.data.image_size,
            planes=planes,
            normalize_scale=cfg.data.normalize_scale,
            normalize_clip=cfg.data.normalize_clip,
            weight_mode="ones",
            num_class=cfg.model.num_class,
        )
        scores = np.asarray(trainer.forward(ts, batch["data"]))
        yield idxs, events, {"data": batch["data"], "label": batch["label"],
                             "scores": scores}


def _produce_streamed(trainer, ts, input_file, n, bs_events,
                      max_points, *, sparse_export=False,
                      readback_group: int = 1):
    """Streamed producer: threaded loader (C++ decoder when built) ->
    sparse transfer -> device densify fused with the forward -> a
    prefetch_depth-deep readback pipeline, so decode/transfer/compute
    overlap while the export of earlier batches runs on the host.

    Yields (idxs, events, out) with `out` the host copy of the ana step
    result: dense mode {'data','label','scores'} (_make_ana_step);
    ``sparse_export=True`` switches to the sparse wire + per-point step
    (_make_ana_step_sparse), masks the wrapped tail rows of the final
    batch out of the on-device confusion counts via 'row_valid', and
    yields {'pscores', <confusion counts>}. ONE producer serves both modes
    so the pipeline-depth/teardown logic cannot diverge (round-3 review).

    ``readback_group=K``: device->host readbacks are issued for K batches
    AT ONCE (one jax.device_get over K output pytrees — every leaf's
    copy_to_host_async goes out in one wave), dividing the per-readback
    relay round-trip count by K. The e2e ana wall on tunneled hosts is
    round-trip latency, not bandwidth (benchmarks/RESULTS.md round 3/4);
    K only changes when hosts syncs happen, never the results."""
    import collections
    import dataclasses

    from uresnet_tpu.data.loader import device_prefetch, make_batch_loader

    cfg = trainer.cfg
    n_planes = len(cfg.data.planes)
    dcfg = dataclasses.replace(
        cfg.data, input_files=(input_file,), synthetic=False,
        random_access=False, weight_mode="ones", max_points=max_points,
        batch_size=bs_events * n_planes,
        **({"transfer": "sparse"} if sparse_export else {}))
    loader = make_batch_loader(dcfg, num_class=cfg.model.num_class,
                               train=False, ndims=cfg.model.dims)
    loader.start()
    step = (_make_ana_step_sparse(trainer) if sparse_export
            else _make_ana_step(trainer))
    n_batches = -(-n // bs_events)
    try:
        it = device_prefetch(iter(loader), sharding=trainer._leaf_sharding,
                             depth=cfg.data.prefetch_depth)
        # keep prefetch_depth dispatches in flight so the per-batch
        # device->host readback round-trips overlap (the relay link has
        # O(100ms) latency per sync — see benchmarks/RESULTS.md)
        K = max(1, int(readback_group))
        pending = collections.deque()   # device-side (idxs, events, out)
        done = collections.deque()      # host-side triples ready to yield

        def drain_group():
            take = [pending.popleft() for _ in range(min(K, len(pending)))]
            # ONE device_get over the whole group: all leaves of all K
            # outputs start their host copies together (single sync wave)
            outs = jax.device_get([t[2] for t in take])
            for (p_idxs, p_events, _), host in zip(take, outs):
                done.append((p_idxs, p_events, host))

        for k in range(n_batches):
            batch = next(it)
            batch.pop("cursor", None)
            idxs = list(range(k * bs_events, min((k + 1) * bs_events, n)))
            if sparse_export:
                batch["row_valid"] = jax.device_put(
                    (np.arange(bs_events * n_planes) // n_planes
                     < len(idxs)).astype(np.float32))
            out = step(ts, batch)              # async dispatch
            events = ev.read_events(input_file, idxs)
            pending.append((idxs, events, out))
            if len(pending) >= K + max(1, cfg.data.prefetch_depth):
                drain_group()
            while done:
                yield done.popleft()
        while pending:
            drain_group()
            while done:
                yield done.popleft()
    finally:
        loader.stop()
        if hasattr(loader, "close"):
            loader.close()


def _make_ana_step_sparse(trainer: Trainer):
    """Sparse-export ana step: densify + forward + gather the softmax
    scores back AT the point coordinates (device_pipeline.scores_at_points)
    and reduce the metrics to confusion counts ON DEVICE — the readback is
    (B, P, C) points + a handful of scalars instead of dense score volumes
    (~60x less device->host traffic; the relay link bounds e2e ana)."""
    import jax.numpy as jnp

    from uresnet_tpu.data.device_pipeline import (densify_on_device,
                                                  scores_at_points)
    from uresnet_tpu.engine.metrics import segmentation_counts
    from uresnet_tpu.models.uresnet import uresnet_apply

    def step(ts: TrainState, batch):
        from uresnet_tpu.data.device_pipeline import crop_origin

        row_valid = batch["row_valid"].astype(jnp.float32)
        d = trainer.cfg.data
        sparse = {k: v for k, v in batch.items() if k != "row_valid"}
        dense = densify_on_device(
            sparse, image_size=d.image_size,
            num_class=trainer.cfg.model.num_class,
            normalize_scale=d.normalize_scale,
            normalize_clip=d.normalize_clip, weight_mode="ones")
        logits, _ = uresnet_apply(ts.params, ts.model_state, dense["data"],
                                  cfg=trainer.cfg.model, train=False)
        scores = jax.nn.softmax(logits, axis=-1)
        counts = segmentation_counts(
            logits, dense["label"], dense["data"],
            num_class=trainer.cfg.model.num_class, row_valid=row_valid)
        pscores = scores_at_points(sparse, scores,
                                   image_size=d.image_size)
        # origin: see _make_ana_step — the host export must apply the exact
        # device window, not a recomputed centroid (XLA CSEs this with the
        # identical crop math inside scores_at_points)
        return {"pscores": pscores,
                "origin": crop_origin(sparse, image_size=d.image_size),
                **counts}

    if "ana_step_sparse" not in trainer._compiled:
        trainer._compiled["ana_step_sparse"] = jax.jit(
            step, in_shardings=(trainer._ts_sh, None),
            out_shardings=trainer._rep)
    return trainer._compiled["ana_step_sparse"]


def _make_ana_step_points(trainer: Trainer):
    """Points-only ana step for the tiled pass: densify + forward + softmax
    + per-point score gather + crop origin — WITHOUT the on-device
    segmentation_counts reduction of _make_ana_step_sparse, whose dense
    (n_rows, S^D) confusion pass the tiled host loop would discard anyway
    (it rebuilds metrics from the exported points; round-3 review)."""
    from uresnet_tpu.data.device_pipeline import (crop_origin,
                                                  densify_on_device,
                                                  scores_at_points)
    from uresnet_tpu.models.uresnet import uresnet_apply

    def step(ts: TrainState, batch):
        d = trainer.cfg.data
        dense = densify_on_device(
            batch, image_size=d.image_size,
            num_class=trainer.cfg.model.num_class,
            normalize_scale=d.normalize_scale,
            normalize_clip=d.normalize_clip, weight_mode="ones")
        logits, _ = uresnet_apply(ts.params, ts.model_state, dense["data"],
                                  cfg=trainer.cfg.model, train=False)
        scores = jax.nn.softmax(logits, axis=-1)
        return {"pscores": scores_at_points(batch, scores,
                                            image_size=d.image_size),
                "origin": crop_origin(batch, image_size=d.image_size)}

    if "ana_step_points" not in trainer._compiled:
        trainer._compiled["ana_step_points"] = jax.jit(
            step, in_shardings=(trainer._ts_sh, None),
            out_shardings=trainer._rep)
    return trainer._compiled["ana_step_points"]


def _run_inference_sparse(trainer, ts, input_file, output_file, *,
                          fmt, bs_events, max_points,
                          readback_group: int = 1) -> Dict[str, float]:
    """Sparse-export pass (see run_inference ``export='sparse'``): the
    device ships per-POINT scores + confusion counts + its crop ORIGINS;
    the host rebuilds the byte-identical export by applying the exported
    origin with integer math — never a recomputed centroid, which could
    disagree with the device window by one pixel at a rounding boundary
    (round-3 review; window equality itself is still pinned bit-level in
    tests/test_device_pipeline.py)."""
    from uresnet_tpu.engine.metrics import (metrics_from_counts,
                                            reduce_counts)

    cfg = trainer.cfg
    n = ev.num_events(input_file)
    planes = tuple(cfg.data.planes)
    num_class = cfg.model.num_class
    S = cfg.data.image_size
    P = max_points
    scale, clip = cfg.data.normalize_scale, cfg.data.normalize_clip

    out_event, out_plane, out_coords = [], [], []
    out_scores, out_pred, out_label = [], [], []
    usef_events = []
    n_exported = 0
    agg_counts: Dict[str, np.ndarray] = {}

    for idxs, events, out in _produce_streamed(
            trainer, ts, input_file, n, bs_events, P, sparse_export=True,
            readback_group=readback_group):
        pscores = out.pop("pscores")
        origin_b = out.pop("origin")        # (B, D) device crop origins
        for key, v in reduce_counts(out).items():
            agg_counts[key] = agg_counts.get(key, 0.0) + v
        rows_per_event = len(planes)
        for bi, (eidx, evt) in enumerate(zip(idxs, events)):
            by_id = {p.plane_id: p for p in evt.planes}
            score_planes = []
            for pi, pid in enumerate(planes):
                row = bi * rows_per_event + pi
                pl = by_id[pid]
                # P >= max_plane_points(selected planes), so this is always
                # the full point list — the min() only guards hand-passed P
                npt = min(len(pl.values), P)
                c = pl.coords[:npt]
                v = pl.values[:npt]
                l = pl.labels[:npt]
                if len(l) and int(l.max()) >= num_class:
                    raise ValueError(
                        f"label {int(l.max())} >= model.num_class="
                        f"{num_class} in event {eidx} plane {pid} of "
                        f"{input_file!r} — wrong num_class or corrupt file")
                # rebuild the EXACT window the device used from its exported
                # origin — pure integer math, so the host mask can never
                # pair device-gathered scores with a different window
                shifted = c.astype(np.int64) - origin_b[row].astype(np.int64)
                inwin = np.all((shifted >= 0) & (shifted < S), axis=1)
                sc_all = np.asarray(pscores[row, :npt], np.float32)
                pred_pts = sc_all.argmax(-1)
                # npz export set == dense path's per-PIXEL view, via the
                # shared selection recipe (_select_export_pixels)
                win_all = shifted[inwin]
                v_in, l_in = v[inwin], l[inwin]
                sc_in, pr_in = sc_all[inwin], pred_pts[inwin]
                ndim_w = win_all.shape[1] if win_all.ndim == 2 else 0
                sel = _select_export_pixels(win_all, v_in, (S,) * ndim_w,
                                            scale=scale, clip=clip)
                out_event.append(np.full(len(sel), eidx, np.int32))
                out_plane.append(np.full(len(sel), pid, np.int32))
                out_coords.append(win_all[sel].astype(np.int32))
                out_scores.append(sc_in[sel])
                out_pred.append(pr_in[sel].astype(np.int32))
                out_label.append(l_in[sel].astype(np.int32))
                n_exported += int(len(sel))
                if fmt == "usef":
                    # usef writeback keeps FILE order over in-window points
                    orig = c[inwin].astype(np.int32)
                    sc = sc_all[inwin]
                    pr = pred_pts[inwin].astype(np.uint8)
                    for cls in range(num_class):
                        score_planes.append(ev.SparsePlane(
                            plane_id=score_plane_id(pid, cls, num_class),
                            shape=tuple(pl.shape),
                            coords=orig,
                            values=sc[:, cls].astype(np.float32),
                            labels=pr))
            if fmt == "usef":
                usef_events.append(ev.SparseEvent(planes=score_planes))

    metrics = metrics_from_counts(agg_counts)
    metrics.update(n_events=n, n_pixels=n_exported)
    _write_export(output_file, fmt, dims=trainer.cfg.model.dims,
                  num_class=num_class, usef_events=usef_events,
                  npz_columns=(out_event, out_plane, out_coords, out_scores,
                               out_pred, out_label))
    return metrics


def _tile_rows_for_plane(pl, S: int):
    """Tile cover of a plane for full-coverage inference: grid tiles of
    side `S` aligned to multiples of S (the last tile per dim clamped to the
    detector edge), keeping only tiles that OWN at least one point. Every
    point is owned by exactly one tile (per-dim index ``min(c // S, k-1)``);
    a tile's row also carries the CONTEXT points of neighbouring tiles that
    fall inside its (possibly clamped) window, so the network sees the same
    local evidence a centered crop would.

    Returns a list of dicts with 'origin' (D,) int64, 'ctx_idx' (m,) point
    indices inside the window (file order), and 'owned' (m,) bool marking
    the points this tile exports."""
    c = pl.coords.astype(np.int64)
    n = len(pl.values)
    if n == 0:
        return []
    D = c.shape[1]
    ks = [max(1, -(-int(s) // S)) for s in pl.shape]
    origins = [[min(i * S, max(int(s) - S, 0)) for i in range(k)]
               for s, k in zip(pl.shape, ks)]
    tile = np.minimum(c // S, np.array([k - 1 for k in ks])[None, :])
    owner = np.zeros(n, np.int64)
    for d in range(D):
        owner = owner * ks[d] + tile[:, d]
    rows = []
    for tid in np.unique(owner):                    # sorted -> deterministic
        rem, tdims = int(tid), []
        for d in reversed(range(D)):
            tdims.append(rem % ks[d])
            rem //= ks[d]
        o = np.array([origins[d][td] for d, td in
                      zip(range(D), reversed(tdims))], np.int64)
        ctx_idx = np.nonzero(np.all((c >= o) & (c < o + S), axis=1))[0]
        rows.append({"origin": o, "ctx_idx": ctx_idx,
                     "owned": owner[ctx_idx] == tid})
    return rows


def _run_inference_tiled(trainer, ts, input_file, output_file, *,
                         fmt, bs_events) -> Dict[str, float]:
    """Full-coverage tiled pass (run_inference ``tiled=True``): EVERY charge
    point receives a score, regardless of how far the event extends beyond
    one `image_size` window — the single-crop paths drop out-of-window
    points by construction (the reference crops upstream in larcv and has
    the same blind spot; this mode exceeds it, SURVEY.md §3.2).

    Mechanics: each occupied grid tile becomes one sparse batch row with
    coords pre-shifted by the tile origin and the declared shape set to
    image_size — `device_pipeline._crop_window` then clamps the device crop
    origin to exactly 0 (shape == target), so the fused points ana step
    (densify + forward + softmax + point gather, _make_ana_step_points)
    scores the tile and the host maps points back with pure integer math. Context points from
    neighbouring tiles ride along in the window (network context) but only
    the owning tile exports a point.

    Metrics are over the EXPORTED charge pixels (each exactly once; there is
    no well-defined dense-window pixel set under clamped-tile overlap), so
    acc_all == acc_nonzero and the IoUs are charge-pixel IoUs here."""
    import collections

    cfg = trainer.cfg
    S = cfg.data.image_size
    D = cfg.model.dims
    planes_sel = tuple(cfg.data.planes)
    num_class = cfg.model.num_class
    n = ev.num_events(input_file)
    n_rows = bs_events * len(planes_sel)
    scale, clip = cfg.data.normalize_scale, cfg.data.normalize_clip
    # pre-pass: the pad length only needs to cover the busiest TILE window
    # (plus its context), not the busiest whole plane — padding every tile
    # row to the file-wide plane max inflated transfer, densify scatter and
    # the (n_rows, P, C) score readback by the plane/tile occupancy ratio
    # on exactly the oversized events this mode exists for (round-3
    # review). Memory stays flat: only the max survives the pass; the tile
    # math is recomputed per chunk below (host decode has ~240x headroom
    # over the relay-bound device loop, benchmarks/RESULTS.md).
    needed = 0
    for start in range(0, n, bs_events):
        for evt in ev.read_events(
                input_file, list(range(start, min(start + bs_events, n)))):
            by_id = {p.plane_id: p for p in evt.planes}
            for pid in planes_sel:
                for r in _tile_rows_for_plane(by_id[pid], S):
                    needed = max(needed, len(r["ctx_idx"]))
    P = max(256, ((needed + 255) // 256) * 256)
    step = _make_ana_step_points(trainer)

    out_event, out_plane, out_coords = [], [], []
    out_scores, out_pred, out_label = [], [], []
    usef_events = []
    n_exported = 0
    n_tiles = 0
    conf = np.zeros((num_class, num_class), np.float64)

    for start in range(0, n, bs_events):
        idxs = list(range(start, min(start + bs_events, n)))
        events = ev.read_events(input_file, idxs)
        rows = []                       # (eidx, pid, plane, tile-row dict)
        for eidx, evt in zip(idxs, events):
            by_id = {p.plane_id: p for p in evt.planes}
            for pid in planes_sel:
                pl = by_id[pid]
                labs = np.asarray(pl.labels)
                if labs.size and int(labs.max()) >= num_class:
                    raise ValueError(
                        f"label {int(labs.max())} >= model.num_class="
                        f"{num_class} in event {eidx} plane {pid} of "
                        f"{input_file!r} — wrong num_class or corrupt file")
                for r in _tile_rows_for_plane(pl, S):
                    if len(r["ctx_idx"]) > P:
                        raise RuntimeError(
                            f"tile holds {len(r['ctx_idx'])} points > pad "
                            f"length {P} (internal: the pre-pass sizes P "
                            f"over every tile, so this cannot happen unless "
                            f"the file changed mid-run)")
                    rows.append((eidx, pid, pl, r))
        n_tiles += len(rows)
        # dispatch the chunk's batches through a BOUNDED in-flight queue
        # (prefetch_depth deep, like _produce_streamed): the tile count is
        # data-dependent, so an unbounded dispatch queue could pin O(file)
        # device buffers for a pathologically large event
        pending: collections.deque = collections.deque()
        # per-(event, plane) score buffers filled from the owning tiles
        buf: Dict[tuple, np.ndarray] = {}

        def drain_one():
            rb, out = pending.popleft()
            got = jax.device_get(out)
            if np.any(np.asarray(got["origin"])[:len(rb)]):
                # hard invariant (NOT an assert — python -O must not strip
                # it into silently mis-paired scores): tile rows declare
                # shape == image_size, so the device crop must clamp to 0
                raise RuntimeError(
                    "tiled invariant violated: device crop origin != 0 for "
                    "a tile row (shape == image_size should clamp it)")
            ps = np.asarray(got["pscores"], np.float32)
            for ri, (eidx, pid, pl, r) in enumerate(rb):
                key = (eidx, pid)
                if key not in buf:
                    buf[key] = np.full((len(pl.values), num_class), np.nan,
                                       np.float32)
                ci = r["ctx_idx"]
                buf[key][ci[r["owned"]]] = ps[ri, :len(ci)][r["owned"]]

        for b0 in range(0, len(rows), n_rows):
            rb = rows[b0:b0 + n_rows]
            coords = np.zeros((n_rows, P, D), np.int16)
            values = np.zeros((n_rows, P), np.float32)
            labels = np.zeros((n_rows, P), np.uint8)
            npoints = np.zeros((n_rows,), np.int32)
            for ri, (_, _, pl, r) in enumerate(rb):
                ci = r["ctx_idx"]
                coords[ri, :len(ci)] = (pl.coords[ci].astype(np.int64)
                                        - r["origin"][None, :])
                values[ri, :len(ci)] = pl.values[ci]
                labels[ri, :len(ci)] = pl.labels[ci]
                npoints[ri] = len(ci)
            batch = {"coords": coords, "values": values, "labels": labels,
                     "npoints": npoints,
                     "shape": np.full((n_rows, D), S, np.int32)}
            dev = {k: jax.device_put(v, trainer._leaf_sharding(k))
                   for k, v in batch.items()}
            pending.append((rb, step(ts, dev)))
            if len(pending) > max(1, cfg.data.prefetch_depth):
                drain_one()
        while pending:
            drain_one()
        # finalize the chunk's events in order
        for eidx, evt in zip(idxs, events):
            by_id = {p.plane_id: p for p in evt.planes}
            score_planes = []
            for pid in planes_sel:
                pl = by_id[pid]
                npt = len(pl.values)
                sc = buf.get((eidx, pid),
                             np.zeros((0, num_class), np.float32))
                if np.isnan(sc).any():
                    # hard invariant (NOT an assert — under python -O a
                    # coverage hole would argmax NaN rows to confident
                    # class-0 exports with no error anywhere)
                    raise RuntimeError(
                        "tiled coverage hole: a point was owned by no tile "
                        f"(event {eidx} plane {pid})")
                pred_pts = (sc.argmax(-1) if npt else
                            np.zeros(0, np.int64))
                # npz export via the shared selection recipe, with the full
                # detector plane as the window (coords stay in ORIGINAL
                # detector space — a single window is ambiguous here)
                sel = _select_export_pixels(
                    pl.coords.astype(np.int64), pl.values, pl.shape,
                    scale=scale, clip=clip)
                out_event.append(np.full(len(sel), eidx, np.int32))
                out_plane.append(np.full(len(sel), pid, np.int32))
                out_coords.append(pl.coords[sel].astype(np.int32))
                out_scores.append(sc[sel])
                out_pred.append(pred_pts[sel].astype(np.int32))
                out_label.append(pl.labels[sel].astype(np.int32))
                n_exported += int(len(sel))
                if len(sel):
                    conf += np.bincount(
                        pred_pts[sel].astype(np.int64) * num_class
                        + pl.labels[sel].astype(np.int64),
                        minlength=num_class * num_class,
                    ).reshape(num_class, num_class)
                if fmt == "usef":
                    # usef writeback: ALL points in FILE order — full
                    # coverage is the point of this mode
                    pr = pred_pts.astype(np.uint8)
                    for cls in range(num_class):
                        score_planes.append(ev.SparsePlane(
                            plane_id=score_plane_id(pid, cls, num_class),
                            shape=tuple(pl.shape),
                            coords=pl.coords.astype(np.int32),
                            values=sc[:, cls].astype(np.float32)
                            if npt else np.zeros(0, np.float32),
                            labels=pr))
            if fmt == "usef":
                usef_events.append(ev.SparseEvent(planes=score_planes))

    from uresnet_tpu.engine.metrics import metrics_from_counts

    metrics = metrics_from_counts({
        "conf": conf, "n_pixels": float(n_exported),
        "correct_nonzero": float(np.trace(conf)),
        "n_nonzero": float(n_exported)})
    metrics.update(n_events=n, n_pixels=n_exported, n_tiles=n_tiles)
    _write_export(output_file, fmt, dims=trainer.cfg.model.dims,
                  num_class=num_class, usef_events=usef_events,
                  npz_columns=(out_event, out_plane, out_coords, out_scores,
                               out_pred, out_label))
    return metrics


def run_inference(
    trainer: Trainer,
    ts: TrainState,
    input_file: str,
    output_file: str,
    *,
    batch_events: Optional[int] = None,
    fmt: str = "npz",
    streamed: bool = True,
    export: str = "auto",
    tiled: bool = False,
    readback_group: int = 1,
) -> Dict[str, float]:
    """Sequential pass over `input_file`; writes per-pixel score export.

    fmt="npz" (sparse arrays, concatenated over all events):
      event_id (N,), plane_id (N,), coords (N, ndims),
      scores (N, num_class), pred (N,), label (N,)

    fmt="usef" (reference-style score-map writeback, SURVEY.md §3.2: the
    reference writes per-pixel per-class score images back to the data
    file): a USEF file readable by `data/events.py`, one event per input
    event; each input plane `p` emits `num_class` score planes with
    plane_id = p * num_class + cls (`score_plane_id`), coords in ORIGINAL
    detector space, values = softmax scores, labels = predicted class.

    ``streamed=True`` (default) drives the pass through the training data
    plane — threaded decode, sparse transfer, in-jit densify fused with the
    forward, one-deep readback pipeline; ``streamed=False`` is the legacy
    synchronous host-densify path (kept as the equality oracle,
    tests/test_inference.py). Exports are identical either way.

    ``export``: 'dense' reads back full score volumes; 'sparse' gathers
    scores at the point coordinates ON DEVICE and reduces metrics to
    confusion counts in-step (~60x less readback — the production TPU ana
    mode); 'auto' (default) picks 'sparse' when streamed. Exports are
    identical in all modes — the ana sparse wire auto-sizes its pad length
    to the file's largest plane (events.max_plane_points), so inference
    NEVER truncates events regardless of the training-time data.max_points.

    ``readback_group=K`` (streamed modes): issue device->host readbacks for
    K batches at once — one jax.device_get per K dispatches instead of one
    each. Results are identical; on high-latency links (the axon relay)
    this divides the round-trip count by K (measured sweep in
    benchmarks/RESULTS.md round 4).

    ``tiled=True`` switches to the full-coverage tiled pass
    (`_run_inference_tiled`): events larger than one image_size window are
    covered by a grid of clamped tiles so EVERY charge point is scored —
    the single-crop modes (and the reference's upstream larcv crop) drop
    points outside the centered window. Coords in the npz export are then
    ORIGINAL detector coordinates (a single window is ambiguous), and the
    reported metrics are over the exported charge pixels.
    """
    if fmt not in ("npz", "usef"):
        raise ValueError(f"unknown score export format {fmt!r}")
    if export not in ("auto", "dense", "sparse"):
        raise ValueError(f"unknown export mode {export!r}")
    cfg = trainer.cfg
    n = ev.num_events(input_file)
    planes = tuple(cfg.data.planes)
    num_class = cfg.model.num_class
    bs_events = batch_events or max(1, cfg.data.batch_size // len(planes))
    if export == "auto":
        export = "sparse" if streamed else "dense"
    if export == "sparse" and not streamed:
        raise ValueError("export='sparse' requires streamed=True")
    if n == 0:
        # a valid 0-event file: write the empty export and return zeroed
        # metrics — the streamed producers cannot build a loader over an
        # empty file (round-3 review finding)
        from uresnet_tpu.engine.metrics import metrics_from_counts

        metrics = metrics_from_counts({
            "conf": np.zeros((num_class, num_class), np.float64),
            "n_pixels": 0.0, "correct_nonzero": 0.0, "n_nonzero": 0.0})
        metrics.update(n_events=0, n_pixels=0)
        _write_export(output_file, fmt, dims=cfg.model.dims,
                      num_class=num_class, usef_events=[],
                      npz_columns=([], [], [], [], [], []))
        return metrics
    if tiled:
        # the tiled pass sizes its own pad length (busiest TILE, not plane)
        return _run_inference_tiled(trainer, ts, input_file, output_file,
                                    fmt=fmt, bs_events=bs_events)
    if streamed:
        # pad length covering the busiest SELECTED plane (rounded up to 256
        # for TPU-friendly shapes): ana never truncates, unlike the
        # training wire whose max_points is a fixed-shape knob. Host path
        # densifies whole events and needs no scan (round-3 review).
        needed = ev.max_plane_points(input_file, planes)
        ana_points = max(cfg.data.max_points, ((needed + 255) // 256) * 256)
    if export == "sparse":
        return _run_inference_sparse(trainer, ts, input_file, output_file,
                                     fmt=fmt, bs_events=bs_events,
                                     max_points=ana_points,
                                     readback_group=readback_group)

    out_event, out_plane, out_coords = [], [], []
    out_scores, out_pred, out_label = [], [], []
    usef_events = []
    n_correct_nonzero = 0
    n_nonzero = 0
    # dataset-global (pred, true) confusion over ALL pixels of the real
    # rows -> exact single-pass mIoU (the parity-gate metric), same
    # aggregation as evaluate_dataset's exact mode
    conf = np.zeros((num_class, num_class), np.float64)
    n_pix_total = 0

    producer = (_produce_streamed(trainer, ts, input_file, n, bs_events,
                                  ana_points, readback_group=readback_group)
                if streamed else
                _produce_host(trainer, ts, input_file, n, bs_events))
    for idxs, events, out in producer:
        scores = np.asarray(out["scores"])
        data_b = np.asarray(out["data"])
        label_b = np.asarray(out["label"])
        # present when the device densified (streamed sparse input): the
        # usef writeback must apply the device's own crop window
        origin_b = out.get("origin")
        pred = scores.argmax(-1)
        rows_per_event = len(planes)
        for bi, (eidx, evt) in enumerate(zip(idxs, events)):
            by_id = {p.plane_id: p for p in evt.planes}
            score_planes = []
            for pi, pid in enumerate(planes):
                row = bi * rows_per_event + pi
                data_img = data_b[row, ..., 0]
                label_img = label_b[row]
                mask = data_img > 0
                coords = np.argwhere(mask)
                out_event.append(np.full(len(coords), eidx, np.int32))
                out_plane.append(np.full(len(coords), pid, np.int32))
                out_coords.append(coords.astype(np.int32))
                out_scores.append(scores[row][mask])
                out_pred.append(pred[row][mask].astype(np.int32))
                out_label.append(label_img[mask].astype(np.int32))
                n_correct_nonzero += int((pred[row][mask] == label_img[mask]).sum())
                n_nonzero += int(mask.sum())
                lmax = int(label_img.max()) if label_img.size else 0
                if lmax >= num_class:
                    # fail loudly (same check as the sparse-export path):
                    # an out-of-range label would otherwise surface as an
                    # opaque bincount/reshape error below
                    raise ValueError(
                        f"label {lmax} >= model.num_class={num_class} in "
                        f"event {eidx} plane {pid} of {input_file!r} — "
                        f"wrong num_class or corrupt file")
                conf += np.bincount(
                    (pred[row].astype(np.int64) * num_class
                     + label_img.astype(np.int64)).ravel(),
                    minlength=num_class * num_class,
                ).reshape(num_class, num_class)
                n_pix_total += label_img.size
                if fmt == "usef":
                    # map scores back to ORIGINAL detector coordinates via
                    # the same crop window the model saw: the device's
                    # exported origin when it densified, else the host
                    # recompute (host-densified batches use the host window)
                    pl = by_id[pid]
                    if origin_b is not None:
                        shifted = (pl.coords.astype(np.int64)
                                   - origin_b[row].astype(np.int64))
                        inwin = np.all(
                            (shifted >= 0)
                            & (shifted < cfg.data.image_size), axis=1)
                    else:
                        shifted, inwin = crop_or_pad_coords(
                            pl.coords, pl.shape, cfg.data.image_size,
                            values=pl.values)
                    win = tuple(shifted[inwin].T)
                    orig = pl.coords[inwin].astype(np.int32)
                    sc = scores[row][win]           # (npix, num_class)
                    pr = pred[row][win].astype(np.uint8)
                    for cls in range(num_class):
                        score_planes.append(ev.SparsePlane(
                            plane_id=score_plane_id(pid, cls, num_class),
                            shape=tuple(pl.shape),
                            coords=orig,
                            values=sc[:, cls].astype(np.float32),
                            labels=pr))
            if fmt == "usef":
                usef_events.append(ev.SparseEvent(planes=score_planes))

    from uresnet_tpu.engine.metrics import metrics_from_counts

    metrics = metrics_from_counts({
        "conf": conf, "n_pixels": float(n_pix_total),
        "correct_nonzero": float(n_correct_nonzero),
        "n_nonzero": float(n_nonzero)})
    metrics.update(n_events=n, n_pixels=n_nonzero)

    _write_export(output_file, fmt, dims=trainer.cfg.model.dims,
                  num_class=cfg.model.num_class, usef_events=usef_events,
                  npz_columns=(out_event, out_plane, out_coords, out_scores,
                               out_pred, out_label))
    return metrics


def _make_count_step(trainer: Trainer):
    """Jitted exact-evaluation step: forward + SUM-form counts
    (metrics.segmentation_counts) with the padded tail rows masked via the
    'row_valid' batch leaf. Loss sums are masked the same way."""
    import jax.numpy as jnp

    from uresnet_tpu.engine.losses import softmax_xent_per_pixel
    from uresnet_tpu.engine.metrics import segmentation_counts
    from uresnet_tpu.models.uresnet import uresnet_apply

    def step(ts: TrainState, batch):
        row_valid = batch["row_valid"].astype(jnp.float32)
        prep = trainer._prepare({k: v for k, v in batch.items()
                                 if k != "row_valid"})
        logits, _ = uresnet_apply(ts.params, ts.model_state, prep["data"],
                                  cfg=trainer.cfg.model, train=False)
        counts = segmentation_counts(
            logits, prep["label"], prep["data"],
            num_class=trainer.cfg.model.num_class, row_valid=row_valid)
        xent = softmax_xent_per_pixel(logits, prep["label"])
        vpix = row_valid.reshape((-1,) + (1,) * (xent.ndim - 1))
        w = prep["weight"].astype(jnp.float32) * vpix
        counts["loss_num"] = jnp.sum(w * xent)
        counts["weight_sum"] = jnp.sum(w)
        return counts

    # cache on the trainer's compiled-fn dict: repeated exact validation
    # (train.val_exact) must reuse ONE executable, not retrace per call
    # (a relay compile costs minutes — round-3 review finding)
    if "count_step" not in trainer._compiled:
        trainer._compiled["count_step"] = jax.jit(
            step, in_shardings=(trainer._ts_sh, None),
            out_shardings=trainer._rep)
    return trainer._compiled["count_step"]


def evaluate_dataset(
    trainer: Trainer,
    ts: TrainState,
    *,
    num_batches: Optional[int] = None,
) -> Dict[str, float]:
    """Held-out metric evaluation (mIoU parity gate, BASELINE north_star).

    ``num_batches=None`` (default, the gate mode): EXACTLY-ONCE full pass —
    the batch count is derived from the dataset's event count, the loader
    streams sequentially (train=False -> no shuffle), and the wrapped tail
    rows of the final batch are masked out, so every held-out event
    contributes exactly once. Metrics come from dataset-global confusion
    sums (`metrics_from_counts`) — the well-defined held-out mIoU the
    reference's single-pass ana loop produces (SURVEY.md §3.2), not a mean
    of per-batch IoUs.

    ``num_batches=k``: legacy sampled mode (k batches off the cycling
    loader, per-batch metric means) for quick in-training spot checks.
    """
    loader = trainer.make_loader(train=False)
    if num_batches is not None:
        agg: Dict[str, float] = {}
        try:
            for _ in range(num_batches):
                batch = loader.next()
                batch.pop("cursor", None)
                m = jax.device_get(
                    trainer.eval_step(ts, trainer._device_batch(batch)))
                for k, v in m.items():
                    agg[k] = agg.get(k, 0.0) + float(v) / num_batches
        finally:
            loader.stop()
            if hasattr(loader, "close"):
                loader.close()
        return agg

    from uresnet_tpu.engine.metrics import (metrics_from_counts,
                                            reduce_counts)

    cfgd = trainer.cfg.data
    n_planes = len(cfgd.planes)
    shard_count = max(jax.process_count(), 1)
    rank = jax.process_index()
    epb_local = max(1, cfgd.batch_size // n_planes // shard_count)
    # Host-independent totals (the loader shards round-robin): every host
    # must run the SAME number of jitted steps under SPMD even when its
    # shard is one event short — shorter shards just mask more rows.
    n_total = loader.total_events()
    n_local = n_total // shard_count + (1 if rank < n_total % shard_count
                                        else 0)
    n_max_local = -(-n_total // shard_count)
    n_batches = max(1, -(-n_max_local // epb_local))

    step = _make_count_step(trainer)
    loader.start()
    agg_counts: Dict[str, np.ndarray] = {}
    try:
        for k in range(n_batches):
            batch = loader.next()
            batch.pop("cursor", None)
            valid_events = min(max(n_local - k * epb_local, 0), epb_local)
            row_valid = (np.arange(epb_local * n_planes) // n_planes
                         < valid_events).astype(np.float32)
            batch["row_valid"] = row_valid
            counts = reduce_counts(jax.device_get(
                step(ts, trainer._device_batch(batch))))
            for key, v in counts.items():
                agg_counts[key] = agg_counts.get(key, 0.0) + v
    finally:
        loader.stop()
        if hasattr(loader, "close"):
            loader.close()

    out = metrics_from_counts(agg_counts)
    # model-free exactness witnesses: any double-counted / unmasked row
    # shows up here even when near-tie argmax flips hide it in the metrics
    out["n_pixels"] = float(agg_counts["n_pixels"])
    out["n_nonzero"] = float(agg_counts["n_nonzero"])
    if trainer.cfg.train.loss_normalize == "weight_sum":
        out["loss"] = float(agg_counts["loss_num"]
                            / max(agg_counts["weight_sum"], 1e-6))
    else:  # 'mean' over the valid pixels
        out["loss"] = float(agg_counts["loss_num"]
                            / max(agg_counts["n_pixels"], 1.0))
    out["n_events"] = float(n_total)
    return out
