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
    args = p.parse_args(argv)

    if args.config:
        cfg = load_config(args.config, args.overrides)
    else:
        cfg = apply_overrides(Config(), args.overrides)

    trainer = Trainer(cfg, mesh=make_mesh())
    print(f"mesh: {trainer.mesh}", flush=True)
    ts, metrics = trainer.fit(iterations=args.iterations, resume=args.resume)
    print("final:", {k: round(v, 5) for k, v in metrics.items()}, flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
