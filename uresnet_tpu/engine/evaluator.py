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


def run_inference(
    trainer: Trainer,
    ts: TrainState,
    input_file: str,
    output_file: str,
    *,
    batch_events: Optional[int] = None,
    fmt: str = "npz",
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
    """
    if fmt not in ("npz", "usef"):
        raise ValueError(f"unknown score export format {fmt!r}")
    cfg = trainer.cfg
    n = ev.num_events(input_file)
    planes = tuple(cfg.data.planes)
    num_class = cfg.model.num_class
    bs_events = batch_events or max(1, cfg.data.batch_size // len(planes))

    out_event, out_plane, out_coords = [], [], []
    out_scores, out_pred, out_label = [], [], []
    usef_events = []
    n_correct_nonzero = 0
    n_nonzero = 0

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
            num_class=num_class,
        )
        scores = np.asarray(trainer.forward(ts, batch["data"]))
        pred = scores.argmax(-1)
        rows_per_event = len(planes)
        for bi, (eidx, evt) in enumerate(zip(idxs, events)):
            by_id = {p.plane_id: p for p in evt.planes}
            score_planes = []
            for pi, pid in enumerate(planes):
                row = bi * rows_per_event + pi
                data_img = batch["data"][row, ..., 0]
                label_img = batch["label"][row]
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
                if fmt == "usef":
                    # map scores back to ORIGINAL detector coordinates via
                    # the same crop window the model saw
                    pl = by_id[pid]
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

    if fmt == "usef":
        tmpu = output_file + ".tmp"
        ev.write_events(tmpu, usef_events, ndims=trainer.cfg.model.dims)
        os.replace(tmpu, output_file)
        acc_nz = n_correct_nonzero / max(n_nonzero, 1)
        return {"acc_nonzero": acc_nz, "n_events": n, "n_pixels": n_nonzero}

    result = {
        "event_id": np.concatenate(out_event) if out_event else np.zeros(0, np.int32),
        "plane_id": np.concatenate(out_plane) if out_plane else np.zeros(0, np.int32),
        "coords": np.concatenate(out_coords) if out_coords else np.zeros((0, 2), np.int32),
        "scores": np.concatenate(out_scores) if out_scores else np.zeros((0, cfg.model.num_class), np.float32),
        "pred": np.concatenate(out_pred) if out_pred else np.zeros(0, np.int32),
        "label": np.concatenate(out_label) if out_label else np.zeros(0, np.int32),
    }
    tmp = output_file + ".tmp"
    with open(tmp, "wb") as f:
        np.savez_compressed(f, **result)
    os.replace(tmp, output_file)
    acc_nz = n_correct_nonzero / max(n_nonzero, 1)
    return {"acc_nonzero": acc_nz, "n_events": n, "n_pixels": n_nonzero}


def evaluate_dataset(
    trainer: Trainer,
    ts: TrainState,
    *,
    num_batches: int = 16,
) -> Dict[str, float]:
    """Held-out metric evaluation (mIoU parity gate, BASELINE.md)."""
    loader = trainer.make_loader(train=False)
    agg: Dict[str, float] = {}
    for _ in range(num_batches):
        batch = loader.next()
        batch.pop("cursor", None)
        m = jax.device_get(trainer.eval_step(ts, trainer._device_batch(batch)))
        for k, v in m.items():
            agg[k] = agg.get(k, 0.0) + float(v) / num_batches
    return agg
