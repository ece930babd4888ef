"""End-to-end inference/ana throughput (SURVEY.md §3.2; VERDICT r2 weak #3).

Times the FULL production ana pass — C++/Python threaded decode -> sparse
transfer -> in-jit densify fused with the forward -> device point-gather
score readback (export='sparse') -> host export + npz/usef write — over a
synthetic 512² file, and contrasts it with the dense-readback and legacy
host-densify paths.

Run on the TPU:  python benchmarks/ana_e2e.py [--events 512] [--batch 32]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--events", type=int, default=512)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--detector", type=int, default=None,
                   help="detector plane side (defaults to --size); set it "
                        "LARGER than --size to exercise the tiled mode's "
                        "grid cover (e.g. --detector 1024 --size 512)")
    p.add_argument("--dims", type=int, default=2, choices=(2, 3))
    p.add_argument("--fmt", default="npz", choices=("npz", "usef"))
    p.add_argument("--modes", nargs="*",
                   default=["sparse", "dense", "host"],
                   help="subset of {sparse, dense, host, tiled} to run")
    p.add_argument("--group", type=int, nargs="*", default=[1],
                   help="readback_group K values to sweep for the streamed "
                        "modes (device->host readbacks issued K batches at "
                        "a time; VERDICT r3 #4 round-trip amortization)")
    p.add_argument("--device-only", action="store_true",
                   help="time the fused sparse ana STEP (densify + forward "
                        "+ softmax + point-gather + confusion counts) on a "
                        "staged device batch — the rate a direct-attached "
                        "host would see before link latency")
    args = p.parse_args()

    from uresnet_tpu.config import Config, DataConfig, ModelConfig
    from uresnet_tpu.data.synthetic import generate_file
    from uresnet_tpu.engine.evaluator import run_inference
    from uresnet_tpu.engine.trainer import Trainer
    from uresnet_tpu.parallel.mesh import make_mesh

    det = args.detector or args.size
    path = os.path.join(
        "/tmp", f"ana_e2e_{args.dims}d_{args.events}_{args.size}_{det}.usef")
    if not os.path.exists(path):
        shape = ((max(det, 256),) * 2 if args.dims == 2
                 else (det,) * 3)
        generate_file(path, args.events, seed=7, shape=shape, planes=(0,))

    import jax

    on_tpu = jax.devices()[0].platform == "tpu"
    cfg = Config(
        model=ModelConfig(dims=args.dims, base_filters=16,
                          depth=5 if args.dims == 2 else 4,
                          compute_dtype="bfloat16" if on_tpu else "float32",
                          pack=on_tpu,
                          pack_extra_h=on_tpu and args.dims == 2),
        data=DataConfig(image_size=args.size, batch_size=args.batch,
                        planes=(0,), input_files=(path,), synthetic=False,
                        random_access=False))
    tr = Trainer(cfg, mesh=make_mesh())
    ts = tr.init_state()

    if args.device_only:
        import numpy as np

        from benchmarks.micro import timeit
        from uresnet_tpu.data.loader import make_batch_loader
        from uresnet_tpu.engine.evaluator import _make_ana_step_sparse

        import dataclasses

        dcfg = dataclasses.replace(cfg.data, transfer="sparse",
                                   weight_mode="ones")
        loader = make_batch_loader(dcfg, num_class=cfg.model.num_class,
                                   train=False, ndims=cfg.model.dims)
        b = loader.next()
        b.pop("cursor", None)
        if hasattr(loader, "close"):
            loader.stop(); loader.close()
        b["row_valid"] = np.ones(args.batch, np.float32)
        dev = tr._device_batch(b)
        step = _make_ana_step_sparse(tr)
        t = timeit(lambda ts_, b_: step(ts_, b_), ts, dev, iters=10)
        print(f"device-only fused ana step: {t * 1e3:.2f} ms/batch "
              f"= {args.batch / t:.0f} img/s", flush=True)
        return

    runs = {
        "sparse": dict(streamed=True, export="sparse"),
        "dense": dict(streamed=True, export="dense"),
        "host": dict(streamed=False, export="dense"),
        "tiled": dict(tiled=True),
    }
    for name in args.modes:
        kw = runs[name]
        # readback grouping only exists on the streamed paths
        groups = args.group if kw.get("streamed") else [1]
        for K in groups:
            kw_k = dict(kw, readback_group=K) if kw.get("streamed") else kw
            label = f"{name} K={K}" if len(groups) > 1 else name
            out = f"/tmp/ana_e2e_{name}_k{K}.{args.fmt}"
            # warm the compile out of the measurement: one tiny pass
            run_inference(tr, ts, path, out + ".warm", fmt=args.fmt,
                          batch_events=args.batch, **kw_k)
            t0 = time.perf_counter()
            m = run_inference(tr, ts, path, out, fmt=args.fmt,
                              batch_events=args.batch, **kw_k)
            dt = time.perf_counter() - t0
            tiles = (f", {int(m['n_tiles'])} tiles "
                     f"= {m['n_tiles'] / dt:.1f} tiles/s"
                     if "n_tiles" in m else "")
            print(f"{label:12s} {args.events / dt:7.1f} img/s e2e "
                  f"({dt:.2f} s, {m['n_pixels']} px exported, "
                  f"miou {m['miou']:.4f}{tiles})", flush=True)


if __name__ == "__main__":
    main()
