"""Capture a jax.profiler trace of the train step and print the top device
ops with their source attribution (the tool that found the take_along_axis
gather costing 30% of the step — benchmarks/RESULTS.md).

Run on the TPU:  python benchmarks/profile_step.py [--size 512] [--batch 32]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def aggregate_trace(outdir: str, steps: int):
    """Latest trace in `outdir` -> (device-busy ms/step, per-category
    Counter, per-op Counter, per-op call Counter). Shared with
    benchmarks/reprobe.py (the churn3d probe)."""
    traces = sorted(glob.glob(os.path.join(
        outdir, "plugins/profile/*/*.trace.json.gz")))
    with gzip.open(traces[-1]) as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    pids = {e["pid"]: e["args"].get("name", "")
            for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    # HLO-level events live on the "XLA Ops" thread; "XLA Modules" holds the
    # jit envelope and "Steps" the per-step markers — exclude both or the
    # rollup double-counts the whole step.
    op_tids = {(e["pid"], e["tid"]) for e in events
               if e.get("ph") == "M" and e.get("name") == "thread_name"
               and e["args"].get("name") == "XLA Ops"
               and "TPU" in pids.get(e.get("pid"), "")}
    tot, cnt = collections.Counter(), collections.Counter()
    cat = collections.Counter()
    for e in events:
        if (e.get("ph") == "X" and "dur" in e
                and (e.get("pid"), e.get("tid")) in op_tids):
            name = e.get("name", "?")
            tot[name] += e["dur"]
            cnt[name] += 1
            cat[re.sub(r"[.\d]+$", "", name)] += e["dur"]
    step_ms = sum(tot.values()) / 1e3 / steps
    return step_ms, cat, tot, cnt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--dims", type=int, default=2, choices=(2, 3),
                   help="3: profile the 3D flagship (192^3, depth 4, block "
                        "remat — configs/train_3d_192.yaml geometry)")
    p.add_argument("--depth", type=int, default=None)
    p.add_argument("--remat", default=None,
                   help="override model.remat (e.g. block, level, false)")
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--top", type=int, default=20)
    p.add_argument("--outdir", default="/tmp/uresnet_profile")
    p.add_argument("--no-pack-extra-h", action="store_true",
                   help="profile without the resident H-pack (flagship "
                        "default is ON, matching bench.py)")
    p.add_argument("--with-metrics", action="store_true",
                   help="profile the summary step (argmax/IoU passes) "
                        "instead of the production hot-loop light step")
    args = p.parse_args()

    from uresnet_tpu.config import Config, DataConfig, ModelConfig
    from uresnet_tpu.engine.trainer import Trainer
    from uresnet_tpu.parallel.mesh import make_mesh

    if args.dims == 3:
        depth = args.depth if args.depth is not None else 4
        remat = "block" if args.remat is None else (
            False if args.remat in ("false", "False", "0") else args.remat)
        mcfg = ModelConfig(dims=3, base_filters=16, depth=depth,
                           compute_dtype="bfloat16", pack=True, remat=remat)
    else:
        depth = args.depth if args.depth is not None else 5
        mcfg = ModelConfig(base_filters=16, depth=depth,
                           compute_dtype="bfloat16", pack=True,
                           pack_extra_h=not args.no_pack_extra_h)
        if args.remat is not None:
            import dataclasses

            mcfg = dataclasses.replace(mcfg, remat=(
                False if args.remat in ("false", "False", "0")
                else args.remat))
    cfg = Config(model=mcfg,
                 data=DataConfig(image_size=args.size,
                                 batch_size=args.batch))
    tr = Trainer(cfg, mesh=make_mesh())
    ts = tr.init_state()
    rng = np.random.default_rng(0)
    S, B = args.size, args.batch
    sp = (S,) * args.dims
    batch = tr._device_batch({
        "data": rng.random((B,) + sp + (1,), np.float32).astype(np.float32),
        "label": rng.integers(0, 3, (B,) + sp).astype(np.int32),
        "weight": np.ones((B,) + sp, np.float32)})
    step_fn = tr.train_step if args.with_metrics else tr.train_step_light
    ts, m = step_fn(ts, batch)
    float(m["loss"])  # compile + sync

    jax.profiler.start_trace(args.outdir)
    for _ in range(args.steps):
        ts, m = step_fn(ts, batch)
    float(m["loss"])
    jax.profiler.stop_trace()

    step_ms, cat, tot, cnt = aggregate_trace(args.outdir, args.steps)
    print(f"device-busy: {step_ms:.1f} ms/step (XLA Ops total)")
    print("-- by op category (name prefix):")
    for name, dur in cat.most_common(15):
        ms = dur / 1e3 / args.steps
        print(f"{ms:9.2f} ms/step {100 * ms / step_ms:5.1f}%  {name}")
    print(f"-- top {args.top} individual ops:")
    for name, dur in tot.most_common(args.top):
        print(f"{dur/1e3/args.steps:9.2f} ms/step {cnt[name]//args.steps:4d}x "
              f"{name[:70]}")


if __name__ == "__main__":
    main()
