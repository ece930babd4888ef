"""Evaluate a SERIES of checkpoints on one held-out file, compiling once.

Training-curve validation (SURVEY.md §4): the quality tables in
benchmarks/RESULTS.md are built from exactly-once held-out evaluations of
several checkpoints of one run. Doing that through `cli.infer
--metrics-only` pays the TPU remote-compile (~10 min for the 192³ config
through the axon relay) once PER CHECKPOINT; this tool builds ONE Trainer
(one compiled eval executable) and loops restore -> evaluate_dataset, so a
4-point curve costs one compile + 4 forward passes.

Each line of output is the same exactly-once dataset-global confusion the
infer gate prints (engine/evaluator.evaluate_dataset with
num_batches=None — every event counted exactly once, wrapped tail masked).

Usage:
    python tools/eval_curve.py configs/train_3d_192.yaml \
        --input /tmp/heldout.usef \
        /tmp/q3d24k_mid/step_00012000.npz ckpt/q3d24k/step_00024000.npz
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("config", help="config file")
    p.add_argument("checkpoints", nargs="+",
                   help="checkpoint paths, evaluated in order")
    p.add_argument("--input", required=True, help="held-out USEF file")
    p.add_argument("--override", action="append", default=[],
                   metavar="KEY=VALUE", help="config override (repeatable)")
    p.add_argument("--platform", default=None,
                   choices=("cpu", "tpu", "axon"),
                   help="force a JAX platform (tests use cpu)")
    args = p.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from uresnet_tpu.config import load_config
    from uresnet_tpu.engine.evaluator import evaluate_dataset
    from uresnet_tpu.engine.trainer import Trainer

    cfg = load_config(args.config, args.override)
    # cfg swap BEFORE the Trainer exists (cli/infer.py: the trainer caches
    # compiled executables that bake cfg constants at first trace)
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(
            cfg.data, input_files=(args.input,), synthetic=False))
    trainer = Trainer(cfg)

    for ck in args.checkpoints:
        if not os.path.exists(ck):
            print(f"SKIP {ck}: no such file", flush=True)
            continue
        ts, step, _ = trainer.restore(ck)
        m = evaluate_dataset(trainer, ts)
        print(f"ckpt {ck} step {step} metrics:",
              {k: round(v, 5) for k, v in m.items()}, flush=True)
    return 0


if __name__ == "__main__":
    sys.path.insert(0, ".")
    raise SystemExit(main())
