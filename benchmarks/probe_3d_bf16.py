#!/usr/bin/env python
"""Probe harness for the open packed-bf16 3D divergence (RESULTS.md "3D bf16").

Reproduces the stress setup that diverges (96^3, depth 4, batch 1, bf16,
pack=true — the shipped train_3d_192.yaml recipe at a faster-to-iterate
size) with full trajectory instrumentation, and provides a same-state
A/B gradient comparison between the packed and canonical execution paths.

Modes
-----
run      Train N steps with the stress config; JSONL per-step loss +
         (every --tap-every steps) per-unit grad/param norms and BN
         running-stat extremes. Flags flip pack/dtype/seed/mitigations.
run:     python benchmarks/probe_3d_bf16.py run --steps 600 --seed 0 \
             --pack --dtype bfloat16 --log /tmp/probe_p_bf16_s0.jsonl

compare  Same TrainState, same batch -> one value_and_grad through the
         PACKED and the CANONICAL graph; prints per-leaf relative grad
         diffs (f64 on host). --advance N first walks the state N steps
         with the packed step so the comparison happens at a drifted
         (pre-divergence) point, not just init.

lockstep Two trainers (packed and canonical, same dtype) from the SAME
         initial state, stepped on the SAME batch sequence. Per step both
         losses; every --tap-every steps the per-unit relative L2 drift
         ||p_pack - p_canon|| / ||p_canon||. Separates data/order noise
         from layout numerics: if the packed trajectory climbs while the
         canonical one descends ON THE SAME BATCHES, the split point and
         the fastest-drifting unit localize the mechanism.

Mitigation probes (run mode):
  --f32-dx     URESNET_F32_DXGRAD=1: conv data-gradients computed with f32
               operands (single final bf16 rounding) instead of stock bf16.

All TPU probes run ONE at a time (CLAUDE.md).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import math
import os
import sys


def stress_config(args):
    from uresnet_tpu.config import (Config, DataConfig, ModelConfig,
                                    OptimConfig, TrainConfig)

    model = ModelConfig(
        dims=3, num_class=3, base_filters=16, depth=4,
        compute_dtype=args.dtype, pack=args.pack,
        pack_threshold=args.pack_threshold, remat=False,
        head_dtype=args.head_dtype)
    data = DataConfig(
        image_size=args.size, batch_size=1, planes=(0,),
        weight_mode="class_balance", backend="python", synthetic=True,
        synthetic_events=args.events, seed=7, max_points=24576,
        num_threads=2, augment=False)
    optim = OptimConfig(lr=args.lr, schedule="cosine", decay_steps=10000,
                        warmup_steps=50, grad_clip_norm=1.0,
                        weight_decay=args.weight_decay)
    train = TrainConfig(iterations=args.steps, summary_iter=0,
                        checkpoint_iter=0, val_iter=0, seed=args.seed,
                        checkpoint_dir="/tmp/probe3d/ckpt",
                        log_dir="/tmp/probe3d/log")
    return Config(model=model, data=data, optim=optim, train=train)


def _unit_norms(tree):
    """L2 norm per top-level unit (stem, enc0_b0, ..., head), f64 on host."""
    import jax
    import numpy as np

    out = {}
    for unit, sub in tree.items():
        leaves = jax.tree.leaves(sub)
        sq = sum(float(np.square(np.asarray(l, np.float64)).sum())
                 for l in leaves)
        out[unit] = math.sqrt(sq)
    return out


def _leaf_dict(tree):
    import jax
    import numpy as np

    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {"/".join(str(getattr(p, "key", p)) for p in path):
            np.asarray(leaf, np.float64) for path, leaf in flat}


def make_grad_fn(trainer):
    import jax

    def f(ts, batch):
        batch = trainer._prepare(batch)
        (loss, ((logits, labels), mstate)), grads = jax.value_and_grad(
            trainer._loss_fn, has_aux=True)(
                ts.params, ts.model_state, batch, True)
        return loss, grads
    return jax.jit(f)


def cmd_run(args) -> int:
    if args.steps < 1:
        print("run mode needs --steps >= 1", file=sys.stderr)
        return 2
    if args.f32_dx:
        os.environ["URESNET_F32_DXGRAD"] = "1"
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import numpy as np

    from uresnet_tpu.engine.trainer import Trainer
    from uresnet_tpu.parallel.mesh import make_mesh

    cfg = stress_config(args)
    trainer = Trainer(cfg, mesh=make_mesh(1))
    ts = trainer.init_state()
    loader = trainer.make_loader(train=True)
    step = trainer.train_step_light  # loss only; metrics tap is separate
    grad_fn = make_grad_fn(trainer)

    out = open(args.log, "w") if args.log else sys.stdout
    it = iter(loader)
    try:
        for i in range(1, args.steps + 1):
            batch = trainer._device_batch(next(it))
            tap = args.tap_every and (i % args.tap_every == 1 or
                                      i == args.steps)
            rec = {"step": i}
            if tap:
                # pre-step gradient tap (same batch the step consumes)
                loss_t, grads = grad_fn(ts, batch)
                rec["grad_unit_norms"] = _unit_norms(grads)
                rec["param_unit_norms"] = _unit_norms(ts.params)
                gl = _leaf_dict(grads)
                gn = math.sqrt(sum(float((v * v).sum()) for v in gl.values()))
                rec["grad_global_norm"] = gn
                bn_var = [(k, float(v.max())) for k, v in
                          _leaf_dict(ts.model_state).items()
                          if k.endswith("var")]
                rec["bn_var_max"] = dict(sorted(
                    bn_var, key=lambda kv: -kv[1])[:4])
            ts, metrics = step(ts, batch)
            rec["loss"] = float(metrics["loss"])
            out.write(json.dumps(rec) + "\n")
            out.flush()
            if not np.isfinite(rec["loss"]):
                print(f"non-finite loss at step {i}", file=sys.stderr)
                break
    finally:
        loader.stop()
        if args.log:
            out.close()
    print(f"done: final loss {rec['loss']:.4f} "
          f"({'DIVERGED' if rec['loss'] > 1.0 else 'ok'})")
    return 0


def cmd_compare(args) -> int:
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import numpy as np

    from uresnet_tpu.engine.trainer import Trainer
    from uresnet_tpu.parallel.mesh import make_mesh

    cfg_p = stress_config(args)
    cfg_c = dataclasses.replace(
        cfg_p, model=dataclasses.replace(cfg_p.model, pack=False))
    tr_p = Trainer(cfg_p, mesh=make_mesh(1))
    tr_c = Trainer(cfg_c, mesh=make_mesh(1))
    ts = tr_p.init_state()

    loader = tr_p.make_loader(train=True)
    it = iter(loader)
    try:
        if args.advance:
            step_p = tr_p.train_step_light
            for i in range(args.advance):
                ts, m = step_p(ts, tr_p._device_batch(next(it)))
                if (i + 1) % 50 == 0:
                    print(f"advance {i + 1}: loss {float(m['loss']):.4f}",
                          flush=True)
        batch = tr_p._device_batch(next(it))
        loss_p, g_p = make_grad_fn(tr_p)(ts, batch)
        loss_c, g_c = make_grad_fn(tr_c)(ts, batch)
    finally:
        loader.stop()

    print(f"loss packed={float(loss_p):.8f} canonical={float(loss_c):.8f} "
          f"rel={abs(float(loss_p) - float(loss_c)) / abs(float(loss_c)):.3e}")
    lp, lc = _leaf_dict(g_p), _leaf_dict(g_c)
    rows = []
    for k in sorted(lc):
        num = float(np.linalg.norm(lp[k] - lc[k]))
        den = float(np.linalg.norm(lc[k])) or 1e-30
        rows.append((num / den, k, den))
    rows.sort(reverse=True)
    print(f"{'rel_diff':>10}  {'|canon|':>10}  leaf   (worst 25)")
    for rd, k, den in rows[:25]:
        print(f"{rd:10.3e}  {den:10.3e}  {k}")
    med = sorted(r[0] for r in rows)[len(rows) // 2]
    print(f"median rel diff over {len(rows)} leaves: {med:.3e}")
    return 0


def cmd_lockstep(args) -> int:
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import numpy as np

    from uresnet_tpu.engine.trainer import Trainer
    from uresnet_tpu.parallel.mesh import make_mesh

    if args.steps < 1:
        print("lockstep mode needs --steps >= 1", file=sys.stderr)
        return 2
    if not args.pack:
        # the mode's whole purpose is packed-vs-canonical; with --no-pack
        # both trainers would run canonical and the run would be vacuous
        print("lockstep compares packed vs canonical; --no-pack is vacuous "
              "(cfg_p must be packed)", file=sys.stderr)
        return 2
    cfg_p = stress_config(args)
    cfg_c = dataclasses.replace(
        cfg_p, model=dataclasses.replace(cfg_p.model, pack=False))
    tr_p = Trainer(cfg_p, mesh=make_mesh(1))
    tr_c = Trainer(cfg_c, mesh=make_mesh(1))
    # params live in the canonical layout under BOTH execution paths (the
    # packed kernels are relabeled at apply time), so one init state seeds
    # both trajectories identically
    ts_p = tr_p.init_state()
    # deep-copy: both step fns DONATE their state arg, so the trajectories
    # must not alias buffers (jnp.array(copy=True) preserves non-array
    # leaves via asarray semantics on scalars)
    import jax.numpy as jnp
    ts_c = jax.tree.map(
        lambda x: jnp.array(x, copy=True) if isinstance(x, jax.Array) else x,
        ts_p)

    loader = tr_p.make_loader(train=True)
    it = iter(loader)
    out = open(args.log, "w") if args.log else sys.stdout
    try:
        for i in range(1, args.steps + 1):
            batch = next(it)
            ts_p, m_p = tr_p.train_step_light(ts_p, tr_p._device_batch(batch))
            ts_c, m_c = tr_c.train_step_light(ts_c, tr_c._device_batch(batch))
            rec = {"step": i, "loss_p": float(m_p["loss"]),
                   "loss_c": float(m_c["loss"])}
            if args.tap_every and (i % args.tap_every == 0 or
                                   i == args.steps):
                pn, cn = _leaf_dict(ts_p.params), _leaf_dict(ts_c.params)
                unit = {}
                for k in cn:
                    u = k.split("/")[0]
                    d, r = unit.get(u, (0.0, 0.0))
                    unit[u] = (d + float(np.square(pn[k] - cn[k]).sum()),
                               r + float(np.square(cn[k]).sum()))
                rec["param_rel_drift"] = {
                    u: math.sqrt(d) / (math.sqrt(r) or 1e-30)
                    for u, (d, r) in unit.items()}
            out.write(json.dumps(rec) + "\n")
            out.flush()
    finally:
        loader.stop()
        if args.log:
            out.close()
    print(f"done: step {rec['step']} loss packed={rec['loss_p']:.4f} "
          f"canonical={rec['loss_c']:.4f}")
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(q):
        q.add_argument("--size", type=int, default=96)
        q.add_argument("--events", type=int, default=8)
        q.add_argument("--seed", type=int, default=0)
        q.add_argument("--steps", type=int, default=600)
        q.add_argument("--dtype", default="bfloat16")
        q.add_argument("--pack", action=argparse.BooleanOptionalAction,
                       default=True)
        q.add_argument("--pack-threshold", type=int, default=64)
        q.add_argument("--platform", default=None)
        q.add_argument("--f32-dx", action="store_true")
        q.add_argument("--lr", type=float, default=2e-4)
        q.add_argument("--head-dtype", default="",
                       help="model.head_dtype override (e.g. float32: "
                            "unquantized logits probe)")
        q.add_argument("--weight-decay", type=float, default=0.0,
                       help="decoupled (AdamW-style) decay — recipe-"
                            "stabilization probe")

    r = sub.add_parser("run", help="instrumented training run")
    common(r)
    r.add_argument("--log", default=None, help="JSONL output path")
    r.add_argument("--tap-every", type=int, default=25,
                   help="grad/param norm tap interval (0 = off)")
    r.set_defaults(fn=cmd_run)

    c = sub.add_parser("compare", help="packed vs canonical grads, same state")
    common(c)
    c.add_argument("--advance", type=int, default=0,
                   help="walk the state N packed steps first")
    c.set_defaults(fn=cmd_compare)

    k = sub.add_parser("lockstep",
                       help="packed and canonical trained on the SAME "
                            "batches from the SAME init")
    common(k)
    k.add_argument("--log", default=None, help="JSONL output path")
    k.add_argument("--tap-every", type=int, default=50,
                   help="param-drift tap interval (0 = off)")
    k.set_defaults(fn=cmd_lockstep)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    raise SystemExit(main())
