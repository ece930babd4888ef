"""Train entry point.

Capability parity (SURVEY.md §2.1 "Entry: train", reference `bin/train.py`
[K:med]): `python -m uresnet_tpu.cli.train <cfg> [KEY=value ...]` — config
file path plus key=value overrides on argv, reference-style. Accepts YAML,
JSON, or reference-era uppercase KEY-value config files.
"""

from __future__ import annotations

import argparse

from uresnet_tpu.config import Config, apply_overrides, load_config
from uresnet_tpu.engine.trainer import Trainer


def main(argv=None):
    p = argparse.ArgumentParser(description="Train U-ResNet on TPU")
    p.add_argument("config", nargs="?", help="config file (yaml/json/KEY-value)")
    p.add_argument("overrides", nargs="*",
                   help="KEY=value (reference-style) or section.field=value")
    p.add_argument("--resume", action="store_true",
                   help="resume from latest checkpoint in checkpoint_dir")
    p.add_argument("--iterations", type=int, default=None)
    p.add_argument("--platform", default=None, choices=("cpu", "tpu", "axon"),
                   help="force a JAX platform (the image's sitecustomize "
                        "pins the TPU; env vars alone cannot override it)")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host SPMD: jax.distributed.initialize() — one "
                        "process per host, all devices in one mesh "
                        "(SURVEY.md 2.4 process model)")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="capture a jax.profiler trace of the first "
                        "summary window into DIR")
    # parse_known_args: argparse cannot interleave positional KEY=value
    # overrides with optional flags; anything unknown of the form KEY=value
    # is an override, anything else is an error.
    args, extra = p.parse_known_args(argv)
    for tok in extra:
        if "=" not in tok or tok.startswith("-"):
            p.error(f"unrecognized argument: {tok}")
        args.overrides.append(tok)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.distributed:
        jax.distributed.initialize()

    overrides = list(args.overrides)
    if args.config and "=" in args.config:
        overrides.insert(0, args.config)  # bare KEY=value without a config file
        args.config = None
    if args.config:
        cfg = load_config(args.config, overrides)
    else:
        cfg = apply_overrides(Config(), overrides)

    trainer = Trainer(cfg)  # mesh derived from cfg.parallel
    print(f"mesh: {trainer.mesh}", flush=True)
    if args.profile:
        from uresnet_tpu.engine.profiling import trace

        with trace(args.profile):
            ts, metrics = trainer.fit(
                iterations=min(args.iterations or cfg.train.summary_iter,
                               cfg.train.summary_iter),
                resume=args.resume)
        print(f"profile trace written to {args.profile}", flush=True)
        return 0
    ts, metrics = trainer.fit(iterations=args.iterations, resume=args.resume)
    print("final:", {k: round(v, 5) for k, v in metrics.items()}, flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
