"""Benchmark harness — prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Primary metric (BASELINE.json): images/sec/chip, 2D U-ResNet training step at
512x512 (pixel-weighted softmax CE, flagship depth-5/base-16 model, bf16
compute). The reference publishes no numbers (BASELINE.md), so the
denominator is our own measured CPU-JAX reference-equivalent throughput
stored in benchmarks/baseline_cpu.json (see that file's provenance note);
the driver-set north star is >=5x a reference-era chip.

CAVEAT on vs_baseline: the denominator is a 1-core CPU run (0.058 img/s) —
the only reference-equivalent this machine can measure — so the printed
multiplier is in the thousands. The REALISTIC reference bar is a
reference-era training GPU (Titan-X/P100 class, [K:low] estimate: tens of
img/s at this shape); against that the 201 img/s/chip result is roughly
5-15x, which is the honest reading of the north-star ">=5x" gate.

Usage: python bench.py            # full 512x512 training benchmark
       python bench.py --quick    # smaller shape, for smoke runs
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--size", type=int, default=None)
    p.add_argument("--no-pack", action="store_true",
                   help="disable the space-to-depth packed fast path")
    p.add_argument("--no-pack-extra-h", action="store_true",
                   help="disable the resident H-pack (default ON: "
                        "151.7 -> 201.0 img/s/chip at 512^2/base16)")
    p.add_argument("--remat", default=None,
                   help="remat mode: false|level|block (default: block "
                        "for 3D, off for 2D)")
    p.add_argument("--base-filters", type=int, default=16)
    p.add_argument("--dtype", default=None,
                   help="compute dtype override (default: bfloat16 on TPU, "
                        "float32 on CPU) — e.g. float32 to measure the "
                        "packed-f32 3D recipe")
    p.add_argument("--head-dtype", default=None,
                   help="logits-conv dtype (default: float32 for 3D — the "
                        "shipped stable recipe, RESULTS.md round 4 — and "
                        "compute dtype for 2D)")
    p.add_argument("--pack-threshold", type=int, default=None,
                   help="pack levels with channels < threshold (default "
                        "64; 128 also packs the 64-ch level — 3D lever)")
    p.add_argument("--dims", type=int, default=2, choices=(2, 3),
                   help="3 = 3D U-ResNet on volumes (BASELINE config 4)")
    p.add_argument("--infer", action="store_true",
                   help="benchmark the inference forward instead of training")
    p.add_argument("--freeze", default=None,
                   help="comma-separated optim.freeze patterns (fine-tune "
                        "mode: frozen leaves' weight-grad computations are "
                        "stop_gradient-pruned from the backward pass)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from uresnet_tpu.config import Config, DataConfig, ModelConfig, OptimConfig, TrainConfig
    from uresnet_tpu.engine.trainer import Trainer
    from uresnet_tpu.parallel.mesh import make_mesh

    on_tpu = jax.devices()[0].platform == "tpu"
    if args.dims == 3:
        size = args.size or (32 if args.quick else 192)
        # one 192^3 x 16ch bf16 activation is ~0.9 GB — batch 2 misses the
        # 16 GB v5e HBM by ~54 MB even packed+remat, so default batch 1
        batch = args.batch or 1
        depth = 4
    else:
        size = args.size or (128 if args.quick else 512)
        batch = args.batch or (4 if args.quick else (32 if on_tpu else 2))
        depth = 5
    steps = args.steps if not args.quick else min(args.steps, 5)

    # 3D default remat matches the measured optimum (benchmarks/RESULTS.md
    # round 3): batch 1 fits WITHOUT remat (+33% vol/s); batch >= 2 needs
    # block remat to fit HBM.
    remat = (("block" if batch >= 2 else False) if args.dims == 3
             else False) if args.remat is None \
        else ({"false": False, "true": True}.get(args.remat.lower(),
                                                 args.remat))
    cfg = Config(
        model=ModelConfig(dims=args.dims, num_class=3,
                          base_filters=args.base_filters,
                          depth=depth,
                          compute_dtype=args.dtype or
                          ("bfloat16" if on_tpu else "float32"),
                          head_dtype=(args.head_dtype if args.head_dtype
                                      is not None else
                                      ("float32" if args.dims == 3 else "")),
                          pack=not args.no_pack,
                          pack_extra_h=not args.no_pack_extra_h,
                          **({"pack_threshold": args.pack_threshold}
                             if args.pack_threshold is not None else {}),
                          remat=remat),
        data=DataConfig(image_size=size, batch_size=batch, planes=(0,)),
        optim=OptimConfig(lr=1e-3,
                          freeze=tuple(args.freeze.split(","))
                          if args.freeze else ()),
        train=TrainConfig(seed=0),
    )
    trainer = Trainer(cfg, mesh=make_mesh())
    ts = trainer.init_state()

    rng = np.random.default_rng(0)
    sp = (size,) * args.dims
    batch_np = {
        "data": (rng.random((batch,) + sp + (1,)) *
                 (rng.random((batch,) + sp + (1,)) > 0.95)).astype(np.float32),
        "label": rng.integers(0, 3, (batch,) + sp).astype(np.int32),
        "weight": np.ones((batch,) + sp, np.float32),
    }
    dev_batch = trainer._device_batch(batch_np)

    # FLOP accounting for the honesty plumbing (VERDICT r3 weak #5):
    # 'useful' = the canonical (unpacked) model's MACs — the math the physics
    # needs (benchmarks/flops.py); 'raw' = what the compiled executable
    # actually issues (XLA cost analysis), which for packed layouts includes
    # the structural-zero K-inflation. useful/raw < 1 is the layout tax, not
    # headroom (benchmarks/RESULTS.md round 2).
    import sys as _sys

    _sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "benchmarks"))
    from flops import uresnet_forward_macs

    fwd_flops = 2 * uresnet_forward_macs(size=size, batch=batch,
                                         dims=args.dims, depth=depth,
                                         base=args.base_filters)

    def raw_flops_of(jitted, *call_args):
        try:
            cost = jitted.lower(*call_args).compile().cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            return float(cost["flops"])
        except Exception:  # noqa: BLE001 — relay/backend without analysis
            return None

    if args.infer:
        ts0 = ts
        def run_fwd(k):
            s = None
            t0 = time.perf_counter()
            for _ in range(k):
                s = trainer.forward(ts0, dev_batch["data"])
            float(s[(0,) * s.ndim])
            return time.perf_counter() - t0
        run_fwd(1); run_fwd(2)
        import statistics
        t_n = [run_fwd(steps) for _ in range(3)]
        t_2n = [run_fwd(2 * steps) for _ in range(3)]
        dt = max(statistics.median(t_2n) - statistics.median(t_n), 1e-9)
        per_fwd = dt / steps
        ips = batch / per_fwd / len(jax.devices())
        raw = raw_flops_of(trainer.forward, ts0, dev_batch["data"])
        print(json.dumps({
            "metric": f"infer_images_per_sec_per_chip_{size}_{args.dims}d",
            "value": round(ips, 3),
            "unit": "images/sec/chip",
            "vs_baseline": 0.0,
            "useful_tflops": round(fwd_flops / per_fwd / 1e12, 2),
            **({"raw_tflops": round(raw / per_fwd / 1e12, 2)}
               if raw else {}),
        }))
        return

    # Timing protocol: the axon relay makes block_until_ready a no-op and
    # adds O(100ms) jitter per host sync, so (a) sync via a scalar host
    # readback, (b) time N and 2N chained steps and take the median
    # difference — dispatch + readback overhead cancels, leaving pure
    # steady-state step time (validated against bf16 matmul peak ~200 TF/s).
    step_fn = trainer.train_step_light  # production hot-loop step

    def run_chain(ts, k):
        t0 = time.perf_counter()
        m = None
        for _ in range(k):
            ts, m = step_fn(ts, dev_batch)
        float(m["loss"])  # host sync
        return time.perf_counter() - t0, ts

    _, ts = run_chain(ts, 1)   # compile
    _, ts = run_chain(ts, 2)   # warm
    t_n, t_2n = [], []
    for _ in range(3):
        dt, ts = run_chain(ts, steps)
        t_n.append(dt)
        dt, ts = run_chain(ts, 2 * steps)
        t_2n.append(dt)
    import statistics

    dt_steps = max(statistics.median(t_2n) - statistics.median(t_n), 1e-9)
    per_step_dispatched = dt_steps / steps

    # Device-throughput mode: K steps fused in one executable (one dispatch),
    # the steady-state rate a pipelined input feed sustains. Falls back to
    # the dispatched rate if the fused executable doesn't fit (3D volumes).
    per_step_scan = float("inf")
    try:
        scan = trainer.train_step_scan(steps)

        def run_scan(ts, reps):
            t0 = time.perf_counter()
            m = None
            for _ in range(reps):
                ts, m = scan(ts, dev_batch)
            float(m["loss"])
            return time.perf_counter() - t0, ts

        _, ts = run_scan(ts, 1)    # compile
        t1, t2 = [], []
        for _ in range(3):
            dt, ts = run_scan(ts, 1)
            t1.append(dt)
            dt, ts = run_scan(ts, 2)
            t2.append(dt)
        dt_scan = max(statistics.median(t2) - statistics.median(t1), 1e-9)
        per_step_scan = dt_scan / steps
    except Exception as e:  # noqa: BLE001 — e.g. scan executable OOM
        import sys

        print(f"# scan mode unavailable ({type(e).__name__}); "
              "using dispatched rate", file=sys.stderr, flush=True)

    per_step = min(per_step_dispatched, per_step_scan)
    n_chips = len(jax.devices())
    images_per_sec_per_chip = batch / per_step / n_chips

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "benchmarks", "baseline_cpu.json")
    vs_baseline = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f)
        key = f"train_images_per_sec_{size}"
        if key in base and base[key] > 0:
            vs_baseline = images_per_sec_per_chip / base[key]

    tag = "_freeze" if args.freeze else ""
    # useful train flops: fwd + dW + dX = 3x fwd; remat re-runs the fwd (4x)
    useful = fwd_flops * (4 if remat else 3)
    raw = raw_flops_of(step_fn, ts, dev_batch)
    print(json.dumps({
        "metric": f"train_images_per_sec_per_chip_{size}x{size}_{args.dims}d{tag}",
        "value": round(images_per_sec_per_chip, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(vs_baseline, 3) if vs_baseline else 0.0,
        "useful_tflops": round(useful / per_step / 1e12, 2),
        **({"raw_tflops": round(raw / per_step / 1e12, 2)} if raw else {}),
        "baseline_note": ("denominator is our measured 1-core CPU-JAX "
                          "reference-equivalent (reference publishes no "
                          "numbers); vs a reference-era GPU estimate "
                          "(tens of img/s) this is roughly 5-15x"),
    }))


if __name__ == "__main__":
    main()
