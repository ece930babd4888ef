#!/usr/bin/env python
"""Export a trained checkpoint as a self-contained serving artifact (.uxm).

One file = StableHLO forward (BN folded + softmax, weights baked in) + JSON
metadata (architecture, preprocessing constants). Any later JAX runtime
deserializes and serves it without this repo's model code — see
uresnet_tpu/engine/export.py for the format and contract.

    python tools/export_serving.py --config configs/train_2d_512.yaml \
        --output model.uxm --batch 32 [--checkpoint ckpt/step_XXXX.npz] \
        [--platforms tpu,cpu] [--selftest] [--platform cpu]

`--selftest` deserializes the written file and checks its scores against
the in-process eval forward on the current platform before reporting OK.
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--config", required=True)
    p.add_argument("--checkpoint", default=None,
                   help="checkpoint path (default: latest in checkpoint_dir)")
    p.add_argument("--output", required=True, help=".uxm output path")
    p.add_argument("--batch", type=int, default=None,
                   help="serving batch size (default: data.batch_size)")
    p.add_argument("--image-size", type=int, default=None,
                   help="serving spatial size (default: data.image_size)")
    p.add_argument("--platforms", default="tpu,cpu",
                   help="comma list of export targets")
    p.add_argument("--platform", default=None,
                   help="JAX platform to run the export itself on (cpu/tpu)")
    p.add_argument("--selftest", action="store_true",
                   help="reload the artifact and compare vs the eval forward")
    p.add_argument("override", nargs="*", default=[],
                   help="config overrides (a.b=c or KEY=value)")
    args = p.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from uresnet_tpu.config import load_config
    from uresnet_tpu.engine.export import (
        export_serving,
        load_serving,
        save_serving,
    )
    from uresnet_tpu.engine.trainer import Trainer

    cfg = load_config(args.config, args.override)
    # export is single-chip by construction (checkpoints are saved
    # replicated): restore on a 1-device mesh regardless of cfg.parallel
    import dataclasses

    from uresnet_tpu.config import ParallelConfig
    from uresnet_tpu.parallel.mesh import make_mesh

    cfg = dataclasses.replace(cfg, parallel=ParallelConfig(data=1))
    trainer = Trainer(cfg, mesh=make_mesh(1))
    ts, step, _ = trainer.restore(args.checkpoint)
    print(f"restored step {step}", flush=True)

    params = jax.device_get(ts.params)
    state = jax.device_get(ts.model_state)
    payload, meta = export_serving(
        cfg, params, state, batch_size=args.batch,
        image_size=args.image_size,
        platforms=tuple(s.strip() for s in args.platforms.split(",")
                        if s.strip()),
        step=step)
    save_serving(args.output, payload, meta)
    print(f"wrote {args.output}: {os.path.getsize(args.output)} bytes, "
          f"input {meta['input_shape']} -> softmax {meta['output_shape']}, "
          f"platforms {meta['platforms']}")

    if args.selftest:
        import numpy as np

        from uresnet_tpu.engine.export import build_serving_fn

        fn, meta2 = load_serving(args.output)
        rng = np.random.default_rng(0)
        x = rng.random(meta2["input_shape"]).astype(np.float32)
        got = np.asarray(fn(x))
        want = np.asarray(build_serving_fn(cfg, params, state)(x))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
        print(f"selftest OK: max |Δ| = {np.abs(got - want).max():.3g}")
    return 0


if __name__ == "__main__":
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    raise SystemExit(main())
