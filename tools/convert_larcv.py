"""larcv(ROOT) -> USEF converter.

Capability parity (SURVEY.md §2.2 "converter spec for larcv-exported data"):
ROOT support inside the framework is an explicit non-goal — instead, this
one-shot tool converts larcv2 files (EventImage2D data/label/weight
products, or EventSparseTensor3D for 3D) into the flat USEF format the C++
decoder and numpy reader consume.

It requires the `larcv` + ROOT python environment the reference itself
needs (not available in this build image — the tool is import-gated and its
mapping is unit-tested through a fake larcv interface in
tests/test_convert.py).

Usage (inside a larcv environment):
    python tools/convert_larcv.py input.root output.usef \
        --image-producer wire --label-producer segment [--planes 0 1 2]

Mapping per event/plane (2D, --mode 2d):
    Image2D(wire)    -> sparse (coords, values) at pixels with value != 0
    Image2D(segment) -> labels at the same coordinates (uint8)
    meta rows/cols   -> plane shape
    empty planes     -> zero-point USEF planes (kept, not dropped — the
                        loader's crop handles them; tests/test_convert.py)

Mapping per event (3D, --mode 3d):
    SparseTensor3D(data producer)  -> voxel (x,y,z) coords + values
    SparseTensor3D(label producer) -> labels looked up by voxel id (voxels
                                      missing from the label set get 0)
    Voxel3DMeta num_voxel_x/y/z    -> volume shape
    voxel id convention: id = x + nx*(y + ny*z) (larcv Voxel3DMeta::index,
    x fastest) [K:med — re-verify against a real larcv build]
"""

from __future__ import annotations

import argparse
import sys


def convert(io, image_producer: str, label_producer: str, planes,
            events_out, weight_producer: str = None):
    """Core mapping loop over an opened larcv IOManager-like object.

    `io` must provide: get_n_entries(), read_entry(i),
    get_data("image2d", producer) -> has .as_vector() of Image2D-likes with
    .meta().rows()/.cols(), .as_vector() pixel values addressable as a
    flat row-major numpy array via `np.array(img.as_vector())`.
    Separated from main() so tests can drive it with a fake interface.
    """
    import numpy as np

    from uresnet_tpu.data.events import SparseEvent, SparsePlane

    n = io.get_n_entries()
    for i in range(n):
        io.read_entry(i)
        imgs = io.get_data("image2d", image_producer).as_vector()
        labs = io.get_data("image2d", label_producer).as_vector()
        wgts = (io.get_data("image2d", weight_producer).as_vector()
                if weight_producer else None)
        out_planes = []
        for plane_id, (img, lab) in enumerate(zip(imgs, labs)):
            if planes and plane_id not in planes:
                continue
            rows, cols = img.meta().rows(), img.meta().cols()
            dense = np.array(img.as_vector(), dtype=np.float32).reshape(
                rows, cols)
            dense_l = np.array(lab.as_vector(), dtype=np.float32).reshape(
                rows, cols)
            coords = np.argwhere(dense != 0).astype(np.int32)
            values = dense[coords[:, 0], coords[:, 1]]
            labels = dense_l[coords[:, 0], coords[:, 1]].astype(np.uint8)
            weights = None
            if wgts is not None:
                # the reference stores weights as parallel Image2D products
                # (SURVEY.md §2.2): sample the weight image at the charge
                # coordinates -> USEF v2 per-point weights (events.py)
                dense_w = np.array(wgts[plane_id].as_vector(),
                                   dtype=np.float32).reshape(rows, cols)
                weights = dense_w[coords[:, 0], coords[:, 1]]
            out_planes.append(SparsePlane(plane_id=plane_id,
                                          shape=(rows, cols),
                                          coords=coords, values=values,
                                          labels=labels, weights=weights))
        events_out.append(SparseEvent(out_planes))
    return events_out


def convert_3d(io, data_producer: str, label_producer: str, events_out,
               weight_producer: str = None):
    """3D mapping loop (EventSparseTensor3D products).

    `io` must provide get_data("sparse3d", producer) -> object with
    .as_vector() of voxel-likes (.id() flat index, .value()) and .meta()
    with .num_voxel_x()/.num_voxel_y()/.num_voxel_z(). Voxel ids decode as
    id = x + nx*(y + ny*z) (x fastest — larcv Voxel3DMeta::index [K:med]).
    """
    import numpy as np

    from uresnet_tpu.data.events import SparseEvent, SparsePlane

    n = io.get_n_entries()
    for i in range(n):
        io.read_entry(i)
        vox = io.get_data("sparse3d", data_producer)
        lab = io.get_data("sparse3d", label_producer)
        meta = vox.meta()
        nx, ny, nz = (meta.num_voxel_x(), meta.num_voxel_y(),
                      meta.num_voxel_z())
        # single pass over each PyROOT voxel vector (they can hold 1e5+
        # voxels per event; iterating twice doubled the dominant cost),
        # then a vectorized id join for the labels
        pairs = [(v.id(), v.value()) for v in vox.as_vector()]
        ids = np.fromiter((p[0] for p in pairs), np.int64, len(pairs))
        values = np.fromiter((p[1] for p in pairs), np.float32, len(pairs))
        lpairs = [(v.id(), v.value()) for v in lab.as_vector()]
        lab_ids = np.fromiter((p[0] for p in lpairs), np.int64, len(lpairs))
        lab_vals = np.fromiter((p[1] for p in lpairs), np.int64, len(lpairs))
        # labels for data ids: sorted-search join (0 where no label voxel)
        order = np.argsort(lab_ids)
        lab_ids, lab_vals = lab_ids[order], lab_vals[order]
        pos = np.searchsorted(lab_ids, ids)
        pos = np.clip(pos, 0, max(len(lab_ids) - 1, 0))
        hit = (len(lab_ids) > 0) & (lab_ids[pos] == ids) if len(lab_ids) \
            else np.zeros(len(ids), bool)
        labels = np.where(hit, lab_vals[pos] if len(lab_vals) else 0,
                          0).astype(np.uint8)
        weights = None
        if weight_producer:
            # weight SparseTensor3D: same id join as labels (voxels missing
            # from the weight set take 1.0 — the densify-time background
            # weight, data/pipeline.py 'file' mode)
            wv = io.get_data("sparse3d", weight_producer)
            wpairs = [(v.id(), v.value()) for v in wv.as_vector()]
            w_ids = np.fromiter((p[0] for p in wpairs), np.int64, len(wpairs))
            w_vals = np.fromiter((p[1] for p in wpairs), np.float32,
                                 len(wpairs))
            worder = np.argsort(w_ids)
            w_ids, w_vals = w_ids[worder], w_vals[worder]
            wpos = np.clip(np.searchsorted(w_ids, ids), 0,
                           max(len(w_ids) - 1, 0))
            whit = (len(w_ids) > 0) & (w_ids[wpos] == ids) if len(w_ids) \
                else np.zeros(len(ids), bool)
            weights = np.where(whit, w_vals[wpos] if len(w_vals) else 1.0,
                               1.0).astype(np.float32)
        x = ids % nx
        y = (ids // nx) % ny
        z = ids // (nx * ny)
        coords = np.stack([x, y, z], axis=1).astype(np.int32)
        events_out.append(SparseEvent([SparsePlane(
            plane_id=0, shape=(int(nx), int(ny), int(nz)),
            coords=coords, values=values, labels=labels,
            weights=weights)]))
    return events_out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("input")
    p.add_argument("output")
    p.add_argument("--image-producer", default="wire")
    p.add_argument("--label-producer", default="segment")
    p.add_argument("--weight-producer", default=None,
                   help="optional weight-image producer (the reference's "
                        "per-pixel weight product); stored as USEF v2 "
                        "per-point weights for data.weight_mode='file'")
    p.add_argument("--planes", type=int, nargs="*", default=None)
    p.add_argument("--mode", default="2d", choices=("2d", "3d"),
                   help="2d: EventImage2D planes; 3d: EventSparseTensor3D")
    args = p.parse_args(argv)

    try:
        from larcv import larcv  # noqa: F401  (needs the reference's env)
    except ImportError:
        print("ERROR: the `larcv` package (and ROOT) are required to read "
              ".root inputs; run this tool inside a larcv2 environment. "
              "The build image intentionally has neither (SURVEY.md §7 "
              "non-goals).", file=sys.stderr)
        return 2

    from uresnet_tpu.data.events import write_events

    io = larcv.IOManager(larcv.IOManager.kREAD)
    io.add_in_file(args.input)
    io.initialize()
    if args.mode == "3d":
        events = convert_3d(io, args.image_producer, args.label_producer, [],
                            weight_producer=args.weight_producer)
        write_events(args.output, events, ndims=3)
    else:
        events = convert(io, args.image_producer, args.label_producer,
                         set(args.planes or []), [],
                         weight_producer=args.weight_producer)
        write_events(args.output, events, ndims=2)
    print(f"wrote {len(events)} events -> {args.output}")
    return 0


if __name__ == "__main__":
    sys.path.insert(0, ".")
    raise SystemExit(main())
