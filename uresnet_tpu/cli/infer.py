"""Inference / analysis entry point.

Capability parity (SURVEY.md §2.1 "Entry: inference/ana", reference
`bin/inference.py` [K:med]): load a checkpoint, stream events sequentially,
write per-pixel softmax score maps to the output file (sparse export — see
`engine/evaluator.py`), and report nonzero-pixel accuracy.
"""

from __future__ import annotations

import argparse

from uresnet_tpu.config import Config, apply_overrides, load_config
from uresnet_tpu.engine.evaluator import evaluate_dataset, run_inference
from uresnet_tpu.engine.trainer import Trainer


def main(argv=None):
    p = argparse.ArgumentParser(description="U-ResNet batched inference")
    p.add_argument("config", nargs="?", help="config file")
    p.add_argument("overrides", nargs="*", help="KEY=value overrides")
    p.add_argument("--checkpoint", default=None,
                   help="checkpoint path (default: latest in checkpoint_dir)")
    p.add_argument("--input", default=None, help="USEF input file")
    p.add_argument("--output", default="scores.npz", help="score export path")
    p.add_argument("--format", default="npz", choices=("npz", "usef"),
                   help="score export format: sparse npz arrays, or "
                        "reference-style USEF score-map writeback (per-class "
                        "score planes readable by data/events.py)")
    p.add_argument("--metrics-only", action="store_true",
                   help="evaluate metrics on the configured dataset instead")
    p.add_argument("--export", default="auto",
                   choices=("auto", "dense", "sparse"),
                   help="score readback mode: 'sparse' gathers scores at "
                        "the charge points ON DEVICE (~60x less "
                        "device->host traffic — the production TPU mode); "
                        "'dense' reads back full score volumes; 'auto' "
                        "picks sparse (engine/evaluator.py)")
    p.add_argument("--tiled", action="store_true",
                   help="full-coverage tiled inference: cover events larger "
                        "than data.image_size with a grid of clamped tiles "
                        "so EVERY charge point is scored (the single-crop "
                        "default drops points outside the centered window); "
                        "npz coords are then original detector coordinates")
    p.add_argument("--readback-group", type=int, default=4, metavar="K",
                   help="group device->host score readbacks K batches at a "
                        "time (one sync wave per K dispatches) — identical "
                        "results, fewer round trips on high-latency links "
                        "(engine/evaluator.py _produce_streamed). Default 4: "
                        "the measured knee of the K sweep (+45% e2e over "
                        "K=1 through the relay, flat after — RESULTS.md "
                        "round 4); results are byte-identical for any K")
    p.add_argument("--platform", default=None, choices=("cpu", "tpu", "axon"),
                   help="force a JAX platform")
    args, extra = p.parse_known_args(argv)
    for tok in extra:
        if "=" not in tok or tok.startswith("-"):
            p.error(f"unrecognized argument: {tok}")
        args.overrides.append(tok)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    overrides = list(args.overrides)
    if args.config and "=" in args.config:
        overrides.insert(0, args.config)  # bare KEY=value without a config file
        args.config = None
    if args.config:
        cfg = load_config(args.config, overrides)
    else:
        cfg = apply_overrides(Config(), overrides)

    metrics_mode = args.metrics_only or not args.input
    if args.tiled and metrics_mode:
        p.error("--tiled is an export mode: use it with --input/--output, "
                "not --metrics-only")
    if args.tiled and args.export != "auto":
        # the tiled pass has exactly one readback mode (per-point scores);
        # silently ignoring an explicit --export dense would hand the user
        # different export/metric semantics than they asked for
        p.error("--tiled has its own (sparse per-point) readback; "
                "--export cannot be combined with it")
    if metrics_mode and args.input:
        # evaluate THE GIVEN held-out file exactly once (parity gate).
        # The cfg swap happens BEFORE the Trainer exists: Trainer caches
        # compiled executables that bake cfg constants at first trace, so
        # cfg must never be replaced on a live trainer (round-3 review).
        import dataclasses

        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(
                cfg.data, input_files=(args.input,), synthetic=False))

    trainer = Trainer(cfg)  # mesh derived from cfg.parallel
    ts, step, _ = trainer.restore(args.checkpoint)
    print(f"restored step {step}", flush=True)

    if metrics_mode:
        m = evaluate_dataset(trainer, ts)
        print("metrics:", {k: round(v, 5) for k, v in m.items()}, flush=True)
    else:
        m = run_inference(trainer, ts, args.input, args.output,
                          fmt=args.format, export=args.export,
                          tiled=args.tiled,
                          readback_group=args.readback_group)
        print(f"wrote {args.output}:", m, flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
