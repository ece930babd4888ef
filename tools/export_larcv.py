"""USEF scores -> larcv writeback (the reference's ana OUTPUT leg).

Capability parity (SURVEY.md §3.2): the reference's `ana_step` "write[s]
per-pixel score Image2D per class back via larcv write API" so downstream
larcv-based reconstruction can consume the network's output. Our
`infer --format usef` exports per-class score planes in USEF with
plane_id = input_plane * num_class + cls (engine/evaluator.score_plane_id,
values = softmax score at the charge coordinates, labels = predicted
class). This tool is the exact mirror of tools/convert_larcv.py: it maps
those USEF score planes back into a larcv output file —

  2D (--mode 2d):  ONE EventImage2D product per event under
      --score-producer, holding one score Image2D per (input plane, class)
      in ascending (plane, class) order — i.e. image index p*C + c among
      the exported planes, the same one-image-per-class convention the
      reference writes and the same order convert_larcv's reader walks.
      Optionally (--pred-producer) one predicted-label Image2D per input
      plane.
  3D (--mode 3d):  one EventSparseTensor3D per class under
      "{score_producer}_class{c}" (larcv sparse3d products are one tensor
      per producer), voxel id = x + nx*(y + ny*z) — the same id convention
      convert_larcv.convert_3d decodes [K:med — re-verify against a real
      larcv build].

Meta: by default score images carry a unit-scale meta built from the USEF
plane shape (origin 0, pixel size 1). Pass --meta-input <original.root>
(+ --image-producer) to copy each entry's Image2D meta / Voxel3DMeta from
the file the scores were computed on, so the writeback lands in the
original detector coordinate frame.

Like the converter, this requires the `larcv` + ROOT environment of the
reference (intentionally absent in this build image — SURVEY.md §7); the
tool is import-gated and the full mapping round-trips through a fake larcv
interface in tests/test_export_larcv.py (scores written then re-read match
the npz export bit-for-bit).

Usage (inside a larcv environment):
    python -m uresnet_tpu.cli.infer cfg.yaml --input ev.usef \
        --output scores.usef --format usef
    python tools/export_larcv.py scores.usef scores.root \
        --num-class 3 [--meta-input ev.root --image-producer wire]
"""

from __future__ import annotations

import argparse
import sys


def dense_scores(shape, coords, values):
    """Densify one sparse score plane to its full detector shape. Colliding
    coordinates resolve LAST-WINS in file order — the identical semantics of
    the training densify scatter and of evaluator._select_export_pixels, so
    the written image agrees with the npz export at every exported pixel."""
    import numpy as np

    img = np.zeros(shape, np.float32)
    img[tuple(np.asarray(coords, np.int64).T)] = values
    return img


def _make_meta2d(larcv, rows: int, cols: int, plane: int):
    """Unit-scale ImageMeta from a USEF plane shape. larcv2 ImageMeta ctor:
    (width, height, row_count, col_count, origin_x, origin_y, plane)
    [K:med — the fake-larcv tests pin OUR argument order; re-verify the
    positional meaning against a real larcv build]."""
    return larcv.ImageMeta(float(cols), float(rows), rows, cols,
                           0.0, 0.0, plane)


def _as_image2d(larcv, dense, meta):
    """numpy (rows, cols) -> larcv Image2D with the given meta. Prefers the
    larcv numpy helper; falls back to per-pixel set_pixel at the nonzero
    coordinates (scores are sparse at charge pixels, so the loop is short).
    """
    import numpy as np

    if hasattr(larcv, "as_image2d_meta"):
        return larcv.as_image2d_meta(dense, meta)
    img = larcv.Image2D(meta)
    for r, c in np.argwhere(dense != 0):
        img.set_pixel(int(r), int(c), float(dense[r, c]))
    return img


def export_2d(score_events, io, larcv, num_class: int, *,
              score_producer: str = "ssnet_score",
              pred_producer: str | None = None,
              metas=None):
    """Write 2D USEF score events through a larcv write IO.

    `io` must provide get_data("image2d", producer) -> container with
    .append(Image2D), set_id(run, subrun, event), save_entry(), and
    finalize() is the caller's job. `metas`, if given, is a per-event dict
    {input_plane_id: ImageMeta} copied from the original input file.
    Returns the number of images written.
    """
    n_imgs = 0
    for i, evt in enumerate(score_events):
        out = io.get_data("image2d", score_producer)
        pred_planes = {}
        for pl in sorted(evt.planes, key=lambda p: p.plane_id):
            in_plane = pl.plane_id // num_class
            meta = (metas[i].get(in_plane) if metas is not None else None)
            if meta is None:
                meta = _make_meta2d(larcv, pl.shape[0], pl.shape[1], in_plane)
            dense = dense_scores(tuple(pl.shape), pl.coords, pl.values)
            out.append(_as_image2d(larcv, dense, meta))
            n_imgs += 1
            if pred_producer and in_plane not in pred_planes:
                # labels carry the predicted class (identical across the C
                # score planes of one input plane — evaluator.py writes the
                # same pred vector into each)
                pred_planes[in_plane] = (pl, meta)
        if pred_producer:
            outp = io.get_data("image2d", pred_producer)
            for in_plane in sorted(pred_planes):
                pl, meta = pred_planes[in_plane]
                densep = dense_scores(tuple(pl.shape), pl.coords,
                                      pl.labels.astype("float32"))
                outp.append(_as_image2d(larcv, densep, meta))
                n_imgs += 1
        io.set_id(0, 0, i)
        io.save_entry()
    return n_imgs


def export_3d(score_events, io, larcv, num_class: int, *,
              score_producer: str = "ssnet_score",
              metas=None):
    """Write 3D USEF score events as one EventSparseTensor3D per class.

    `io` must provide get_data("sparse3d", producer) -> container with
    .set(VoxelSet, Voxel3DMeta); larcv must provide VoxelSet with
    .emplace(id, value, True) [K:med]. Voxel ids encode x-fastest,
    id = x + nx*(y + ny*z), matching convert_larcv.convert_3d. Returns the
    number of voxels written across all classes.
    """
    n_vox = 0
    for i, evt in enumerate(score_events):
        for pl in sorted(evt.planes, key=lambda p: p.plane_id):
            cls = pl.plane_id % num_class
            nx, ny, nz = pl.shape
            meta = (metas[i] if metas is not None else None)
            if meta is None:
                meta = larcv.Voxel3DMeta()
                if hasattr(meta, "set"):
                    # larcv Voxel3DMeta.set(xmin,ymin,zmin,xmax,ymax,zmax,
                    #                       nx,ny,nz) [K:med]
                    meta.set(0.0, 0.0, 0.0, float(nx), float(ny), float(nz),
                             nx, ny, nz)
            vs = larcv.VoxelSet()
            ids = (pl.coords[:, 0].astype("int64")
                   + nx * (pl.coords[:, 1].astype("int64")
                           + ny * pl.coords[:, 2].astype("int64")))
            for vid, val in zip(ids, pl.values):
                vs.emplace(int(vid), float(val), True)
                n_vox += 1
            out = io.get_data("sparse3d", f"{score_producer}_class{cls}")
            out.set(vs, meta)
        io.set_id(0, 0, i)
        io.save_entry()
    return n_vox


def read_metas_2d(io, image_producer: str, n_entries: int, num_class: int):
    """Per-entry {plane_id: ImageMeta} from the original input file (the
    frame the scores were computed on). larcv ImageMeta is a value type;
    the PyROOT wrappers are copied per entry [K:med]."""
    metas = []
    for i in range(n_entries):
        io.read_entry(i)
        imgs = io.get_data("image2d", image_producer).as_vector()
        metas.append({p: img.meta() for p, img in enumerate(imgs)})
    return metas


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("scores", help="USEF score file from `infer --format usef`")
    p.add_argument("output", help="larcv output .root path")
    p.add_argument("--num-class", type=int, default=3)
    p.add_argument("--mode", default="2d", choices=("2d", "3d"))
    p.add_argument("--score-producer", default="ssnet_score")
    p.add_argument("--pred-producer", default=None,
                   help="also write predicted-label Image2D per plane (2D)")
    p.add_argument("--meta-input", default=None,
                   help="original larcv input file to copy per-entry meta "
                        "from (default: unit-scale meta from USEF shapes)")
    p.add_argument("--image-producer", default="wire",
                   help="producer in --meta-input carrying the input images")
    args = p.parse_args(argv)

    try:
        from larcv import larcv  # noqa: F401  (needs the reference's env)
    except ImportError:
        print("ERROR: the `larcv` package (and ROOT) are required to write "
              ".root outputs; run this tool inside a larcv2 environment. "
              "The build image intentionally has neither (SURVEY.md §7 "
              "non-goals).", file=sys.stderr)
        return 2

    from uresnet_tpu.data.events import read_events

    score_events = read_events(args.scores)
    metas = None
    if args.meta_input:
        io_in = larcv.IOManager(larcv.IOManager.kREAD)
        io_in.add_in_file(args.meta_input)
        io_in.initialize()
        if args.mode == "2d":
            metas = read_metas_2d(io_in, args.image_producer,
                                  len(score_events), args.num_class)
        else:
            metas = []
            for i in range(len(score_events)):
                io_in.read_entry(i)
                metas.append(io_in.get_data(
                    "sparse3d", args.image_producer).meta())
        io_in.finalize()

    io = larcv.IOManager(larcv.IOManager.kWRITE)
    io.set_out_file(args.output)
    io.initialize()
    if args.mode == "3d":
        n = export_3d(score_events, io, larcv, args.num_class,
                      score_producer=args.score_producer, metas=metas)
        what = f"{n} voxels"
    else:
        n = export_2d(score_events, io, larcv, args.num_class,
                      score_producer=args.score_producer,
                      pred_producer=args.pred_producer, metas=metas)
        what = f"{n} images"
    io.finalize()
    print(f"wrote {len(score_events)} events ({what}) -> {args.output}")
    return 0


if __name__ == "__main__":
    sys.path.insert(0, ".")
    raise SystemExit(main())
