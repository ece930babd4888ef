"""Measure the CPU-JAX reference-equivalent training throughput and record it
as the bench.py baseline denominator.

Rationale (BASELINE.md): the reference publishes no machine-readable
throughput numbers and no copy of it is runnable here, so the first runnable
milestone must measure its own baseline. This script runs the same flagship
2D step (512x512, depth-5/base-16, f32 — the reference's precision) on the
CPU backend and stores images/sec in benchmarks/baseline_cpu.json. The TPU
bench (bench.py) reports vs_baseline against this number.

BASELINE.json config 1 ("2D inference, 256x256, batch=1, CPU") is measured
as written with --infer --size 256 --batch 1; the result is stored under
infer_images_per_sec_<size> in the same file.

Run: python benchmarks/measure_cpu_baseline.py [--size 512] [--steps 3]
     python benchmarks/measure_cpu_baseline.py --infer --size 256 --batch 1
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from uresnet_tpu.config import Config, DataConfig, ModelConfig, TrainConfig  # noqa: E402
from uresnet_tpu.engine.trainer import Trainer  # noqa: E402
from uresnet_tpu.parallel.mesh import make_mesh  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--infer", action="store_true",
                   help="measure the inference forward (BASELINE config 1: "
                        "--infer --size 256 --batch 1)")
    args = p.parse_args()

    cfg = Config(
        model=ModelConfig(dims=2, num_class=3, base_filters=16, depth=5,
                          compute_dtype="float32"),
        data=DataConfig(image_size=args.size, batch_size=args.batch),
        train=TrainConfig(seed=0),
    )
    trainer = Trainer(cfg, mesh=make_mesh(1))
    ts = trainer.init_state()
    rng = np.random.default_rng(0)
    batch = trainer._device_batch({
        "data": rng.random((args.batch, args.size, args.size, 1), np.float32),
        "label": rng.integers(0, 3, (args.batch, args.size, args.size)).astype(np.int32),
        "weight": np.ones((args.batch, args.size, args.size), np.float32),
    })
    if args.infer:
        s = trainer.forward(ts, batch["data"])      # compile
        jax.block_until_ready(s)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            s = trainer.forward(ts, batch["data"])
        jax.block_until_ready(s)
        key_prefix = "infer"
    else:
        ts, m = trainer.train_step(ts, batch)      # compile
        jax.block_until_ready(m["loss"])
        t0 = time.perf_counter()
        for _ in range(args.steps):
            ts, m = trainer.train_step(ts, batch)
        jax.block_until_ready(m["loss"])
        key_prefix = "train"
    dt = time.perf_counter() - t0
    ips = args.batch * args.steps / dt

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "baseline_cpu.json")
    data = {}
    if os.path.exists(path):
        with open(path) as f:
            data = json.load(f)
    data[f"{key_prefix}_images_per_sec_{args.size}"] = round(ips, 4)
    data["provenance"] = (
        "CPU-JAX reference-equivalent 2D steps (f32, depth5/base16), "
        "measured in this environment; the upstream reference publishes no "
        "numbers (BASELINE.md)")
    data["cpu_cores"] = os.cpu_count()
    with open(path, "w") as f:
        json.dump(data, f, indent=2)
    print(json.dumps(data))


if __name__ == "__main__":
    main()
