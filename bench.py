"""Benchmark harness — prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Primary metric (BASELINE.json): images/sec/chip, 2D U-ResNet training step at
512x512 (pixel-weighted softmax CE, flagship depth-5/base-16 model, bf16
compute). The reference publishes no numbers (BASELINE.md), so the
denominator is our own measured CPU-JAX reference-equivalent throughput
stored in benchmarks/baseline_cpu.json (see that file's provenance note);
the driver-set north star is >=5x a reference-era chip.

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
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from uresnet_tpu.config import Config, DataConfig, ModelConfig, OptimConfig, TrainConfig
    from uresnet_tpu.engine.trainer import Trainer
    from uresnet_tpu.parallel.mesh import make_mesh

    on_tpu = jax.devices()[0].platform == "tpu"
    size = args.size or (128 if args.quick else 512)
    batch = args.batch or (4 if args.quick else (16 if on_tpu else 2))
    steps = args.steps if not args.quick else min(args.steps, 5)

    cfg = Config(
        model=ModelConfig(dims=2, num_class=3, base_filters=16, depth=5,
                          compute_dtype="bfloat16" if on_tpu else "float32"),
        data=DataConfig(image_size=size, batch_size=batch, planes=(0,)),
        optim=OptimConfig(lr=1e-3),
        train=TrainConfig(seed=0),
    )
    trainer = Trainer(cfg, mesh=make_mesh())
    ts = trainer.init_state()

    rng = np.random.default_rng(0)
    batch_np = {
        "data": (rng.random((batch, size, size, 1), np.float32) *
                 (rng.random((batch, size, size, 1)) > 0.95)).astype(np.float32),
        "label": rng.integers(0, 3, (batch, size, size)).astype(np.int32),
        "weight": np.ones((batch, size, size), np.float32),
    }
    dev_batch = trainer._device_batch(batch_np)

    # warmup / compile
    ts, m = trainer.train_step(ts, dev_batch)
    jax.block_until_ready(m["loss"])
    ts, m = trainer.train_step(ts, dev_batch)
    jax.block_until_ready(m["loss"])

    t0 = time.perf_counter()
    for _ in range(steps):
        ts, m = trainer.train_step(ts, dev_batch)
    jax.block_until_ready(m["loss"])
    dt = time.perf_counter() - t0

    n_chips = len(jax.devices())
    images_per_sec_per_chip = batch * steps / dt / n_chips

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "benchmarks", "baseline_cpu.json")
    vs_baseline = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f)
        key = f"train_images_per_sec_{size}"
        if key in base and base[key] > 0:
            vs_baseline = images_per_sec_per_chip / base[key]

    print(json.dumps({
        "metric": f"train_images_per_sec_per_chip_{size}x{size}_2d",
        "value": round(images_per_sec_per_chip, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(vs_baseline, 3) if vs_baseline else 0.0,
    }))


if __name__ == "__main__":
    main()
