"""Checkpoint inspector: summarize a training checkpoint before resuming,
exporting, or debugging a run.

Companion to tools/usef_info.py (datasets): prints the step/data-cursor
meta, parameter totals per top-level module, optimizer-moment norms, and a
BatchNorm running-stat sanity block (a BN variance collapsing to ~0 or a
mean drifting to O(100) is the classic symptom of a broken normalization
or a wrong data.normalize_scale — visible here without loading a model).
Works on the atomic step-tagged .npz trees engine/checkpoint.py writes
(SURVEY.md §5 checkpoint/resume row); pure numpy, no JAX/TPU needed.

Usage:
    python tools/ckpt_info.py ckpt_dir_or_file [more ...] [--json]

A directory argument resolves through the LATEST marker (falling back to
the highest step_*.npz), exactly like `--resume`.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, ".")

import numpy as np

_PREFIX = "train_state/"


def resolve(path: str) -> str:
    """Directory -> the checkpoint file a resume would load."""
    if os.path.isdir(path):
        marker = os.path.join(path, "LATEST")
        if os.path.exists(marker):
            with open(marker) as f:
                name = f.read().strip()
            return os.path.join(path, name)
        cands = sorted(f for f in os.listdir(path)
                       if re.fullmatch(r"step_\d+\.npz", f))
        if not cands:
            raise FileNotFoundError(f"no step_*.npz in {path!r}")
        return os.path.join(path, cands[-1])
    return path


def inspect_ckpt(path: str) -> dict:
    z = np.load(path)
    info: dict = {"path": path, "n_leaves": len(z.files)}
    if "meta/step" in z:
        info["step"] = int(z["meta/step"])
    if "meta/data_cursor" in z:
        info["data_cursor"] = int(z["meta/data_cursor"])

    per_module: dict = {}
    groups: dict = {}
    bn_stats = []
    for key in z.files:
        if not key.startswith(_PREFIX):
            continue
        rel = key[len(_PREFIX):]               # e.g. params/stem/conv/w
        group = rel.split("/", 1)[0]           # params | model_state | opt...
        arr = z[key]
        g = groups.setdefault(group, {"leaves": 0, "elements": 0,
                                      "bytes": 0, "l2": 0.0})
        g["leaves"] += 1
        g["elements"] += int(arr.size)
        g["bytes"] += int(arr.nbytes)
        g["l2"] += float(np.sum(np.square(arr.astype(np.float64))))
        if group == "params":
            mod = rel.split("/")[1]
            m = per_module.setdefault(mod, {"elements": 0, "leaves": 0})
            m["elements"] += int(arr.size)
            m["leaves"] += 1
        if group == "model_state" and rel.endswith(("/mean", "/var")):
            bn_stats.append((rel, arr))

    for g in groups.values():
        g["l2"] = float(np.sqrt(g["l2"]))
    info["groups"] = groups
    info["params_per_module"] = per_module
    info["total_params"] = sum(m["elements"] for m in per_module.values())

    if bn_stats:
        means = np.concatenate([a.ravel() for r, a in bn_stats
                                if r.endswith("/mean")])
        varis = np.concatenate([a.ravel() for r, a in bn_stats
                                if r.endswith("/var")])
        info["bn"] = {
            "channels": int(means.size),
            "mean_range": [float(means.min()), float(means.max())],
            "var_range": [float(varis.min()), float(varis.max())],
            # var still pinned at the init value 1.0 means BN state was
            # never updated (e.g. an eval-only graph was trained by mistake)
            "var_at_init_frac": float(np.mean(np.isclose(varis, 1.0))),
        }
    return info


def print_report(info: dict) -> None:
    print(f"== {info['path']}")
    step = info.get("step", "?")
    print(f"   step {step}  data_cursor {info.get('data_cursor', '?')}  "
          f"leaves {info['n_leaves']}  total params {info['total_params']:,}")
    for name, g in sorted(info["groups"].items()):
        print(f"   {name:12s} leaves {g['leaves']:4d}  "
              f"elements {g['elements']:>12,}  "
              f"{g['bytes'] / 1e6:8.2f} MB  |x|_2 {g['l2']:.4g}")
    mods = info["params_per_module"]
    top = sorted(mods.items(), key=lambda kv: -kv[1]["elements"])
    print("   params by module: "
          + ", ".join(f"{k}={v['elements']:,}" for k, v in top[:8])
          + (" ..." if len(top) > 8 else ""))
    bn = info.get("bn")
    if bn:
        lo, hi = bn["mean_range"]
        vlo, vhi = bn["var_range"]
        print(f"   BN: {bn['channels']} channels  mean [{lo:.4g}, {hi:.4g}]"
              f"  var [{vlo:.4g}, {vhi:.4g}]"
              f"  at-init {bn['var_at_init_frac']:.0%}")
        if vlo <= 0:
            print("   WARNING: non-positive BN running variance "
                  "(corrupt state or catastrophic collapse)")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("paths", nargs="+",
                    help="checkpoint .npz files or checkpoint directories")
    ap.add_argument("--json", action="store_true",
                    help="one machine-readable JSON object per checkpoint")
    args = ap.parse_args(argv)
    for p in args.paths:
        info = inspect_ckpt(resolve(p))
        if args.json:
            print(json.dumps(info))
        else:
            print_report(info)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
