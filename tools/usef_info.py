"""USEF file inspector: summarize a converted dataset before training.

The real-data protocol (PARITY.md) converts larcv ROOT samples to USEF with
`tools/convert_larcv.py` on a separate machine; this tool is the sanity
check on the result — event/plane/point statistics, per-class label
histogram, value range, and whether the file carries the reference's
per-pixel weight product (USEF v2) — so `data.*` knobs (planes,
normalize_scale, max_points, weight_mode) can be set from facts instead of
guesses. Pure numpy, no JAX/TPU needed.

Usage:
    python tools/usef_info.py file.usef [more.usef ...] [--events N]
        [--json]

`--events N` caps the per-event scan (the header/index part is always
O(1)); `--json` emits one machine-readable JSON object per file.
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")

import numpy as np


def inspect_file(path: str, max_events: int | None = None) -> dict:
    """Scan `path` and return the summary dict (see `main` for fields).

    Scans min(num_events, max_events) events fully; label/value/weight
    statistics are over the scanned prefix (exact when the cap is not hit).
    """
    from uresnet_tpu.data import events as ev

    version, ndims, offsets = ev.read_header(path)
    n = len(offsets)
    n_scan = n if max_events is None else min(n, max_events)

    plane_ids: dict[int, dict] = {}
    label_hist: dict[int, int] = {}
    vmin, vmax, vsum, npts_total = np.inf, -np.inf, 0.0, 0
    has_weights = False
    wmin, wmax = np.inf, -np.inf
    max_points_per_plane = 0

    for start in range(0, n_scan, 256):
        for evt in ev.read_events(path, range(start, min(start + 256,
                                                         n_scan))):
            for pl in evt.planes:
                st = plane_ids.setdefault(
                    pl.plane_id, {"events": 0, "points": 0,
                                  "shape": tuple(int(s) for s in pl.shape)})
                st["events"] += 1
                st["points"] += len(pl.values)
                max_points_per_plane = max(max_points_per_plane,
                                           len(pl.values))
                npts_total += len(pl.values)
                if len(pl.values):
                    vmin = min(vmin, float(pl.values.min()))
                    vmax = max(vmax, float(pl.values.max()))
                    vsum += float(pl.values.sum())
                for lab, cnt in zip(*np.unique(pl.labels,
                                               return_counts=True)):
                    label_hist[int(lab)] = label_hist.get(int(lab), 0) \
                        + int(cnt)
                if pl.weights is not None:
                    has_weights = True
                    if len(pl.weights):
                        wmin = min(wmin, float(pl.weights.min()))
                        wmax = max(wmax, float(pl.weights.max()))

    info = {
        "path": path,
        "version": version,
        "ndims": ndims,
        "num_events": n,
        "events_scanned": n_scan,
        "planes": {str(pid): st for pid, st in sorted(plane_ids.items())},
        "max_points_per_plane": max_points_per_plane,
        "total_points": npts_total,
        "mean_points_per_plane": (npts_total / max(
            sum(st["events"] for st in plane_ids.values()), 1)),
        "label_histogram": {str(k): v for k, v in sorted(label_hist.items())},
        "value_min": None if npts_total == 0 else vmin,
        "value_max": None if npts_total == 0 else vmax,
        "value_mean": None if npts_total == 0 else vsum / npts_total,
        "has_weights": has_weights,
        "weight_min": wmin if has_weights and np.isfinite(wmin) else None,
        "weight_max": wmax if has_weights and np.isfinite(wmax) else None,
    }
    return info


def _print_human(info: dict) -> None:
    print(f"{info['path']}: USEF v{info['version']} {info['ndims']}D, "
          f"{info['num_events']} events"
          + ("" if info["events_scanned"] == info["num_events"]
             else f" (stats over first {info['events_scanned']})"))
    for pid, st in info["planes"].items():
        print(f"  plane {pid}: shape {st['shape']}, in {st['events']} "
              f"events, {st['points']} points "
              f"(mean {st['points'] / max(st['events'], 1):.0f}/event)")
    print(f"  max points/plane: {info['max_points_per_plane']} "
          f"(data.max_points must be >= this for lossless sparse training;"
          f" ana auto-sizes)")
    if info["value_min"] is not None:
        print(f"  values: min {info['value_min']:.4g} max "
              f"{info['value_max']:.4g} mean {info['value_mean']:.4g} "
              f"(data.normalize_scale should bring these to O(1))")
    hist = ", ".join(f"{k}: {v}" for k, v in info["label_histogram"].items())
    print(f"  label histogram (sparse points): {hist or '(empty)'}")
    if info["has_weights"]:
        rng = ("" if info["weight_min"] is None else
               f"min {info['weight_min']:.4g} max {info['weight_max']:.4g}; ")
        print(f"  per-pixel weight product: PRESENT (v2) — {rng}"
              f"train with data.weight_mode=file to use it")
    else:
        print("  per-pixel weight product: none (v1 semantics) — "
              "data.weight_mode file is unavailable; use ones/"
              "class_balance/nonzero")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("files", nargs="+", help="USEF files to inspect")
    p.add_argument("--events", type=int, default=None,
                   help="cap the per-event statistics scan (default: all)")
    p.add_argument("--json", action="store_true",
                   help="one JSON object per file instead of text")
    args = p.parse_args(argv)

    for path in args.files:
        info = inspect_file(path, max_events=args.events)
        if args.json:
            print(json.dumps(info))
        else:
            _print_human(info)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
