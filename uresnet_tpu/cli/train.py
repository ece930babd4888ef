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
from uresnet_tpu.parallel.mesh import make_mesh


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
    args = p.parse_args(argv)

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

    trainer = Trainer(cfg, mesh=make_mesh())
    print(f"mesh: {trainer.mesh}", flush=True)
    ts, metrics = trainer.fit(iterations=args.iterations, resume=args.resume)
    print("final:", {k: round(v, 5) for k, v in metrics.items()}, flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
