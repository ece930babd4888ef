"""Self-renewing perf-ceiling probes: re-run the compiler-blocked levers
and print KEEP/FLIPPED against the recorded numbers.

The measured ceilings in benchmarks/RESULTS.md are properties of the
CURRENT compiler (jax 0.9.0 / its libtpu), not of this framework — so the
claims must be re-checked whenever jax/libtpu is bumped, and this script is
that one command. No perf work is warranted unless a probe FLIPS.

probes (each prints RECORDED vs MEASURED and a verdict):
  canary     spatial x model SPMD partitioner miscompile (CPU subprocess,
             the exact canary test) — the Trainer guard stays while broken
             (RESULTS.md round 3 "full-model TP")
  mosaic64   sub-128-lane VMEM/DMA slicing (Mosaic rejection) — the wall
             that blocks the minimal-K phase conv at 64 channels
             (RESULTS.md round 2 "compiled Pallas measurement")
  pallas128  Pallas fused conv vs XLA at 128 lanes — XLA's conv+epilogue
             fusion won by 15-25% (round 2); Pallas stays bench-gated OFF
  churn3d    3D conv layout churn: copy share of the 192^3 batch-1
             no-remat step (~11% of ~465 ms device-busy, round 3/4) — the
             compiler-imposed 3D ceiling

usage:  python benchmarks/reprobe.py [--probe canary mosaic64 ...]
        (mosaic64/pallas128/churn3d need the real TPU and must run ONE at
        a time on the chip; canary runs anywhere)
"""

from __future__ import annotations

import argparse
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Recorded ceilings (benchmarks/RESULTS.md). A probe FLIPS when the
# measurement moves past its trigger, which is the signal to re-derive.
RECORDED = {
    "pallas128_xla_wins": "XLA 2.98 ms vs Pallas 3.77 ms at "
                          "32x128x256x128->128 bh=16 (round 2)",
    "mosaic64_blocked": "Mosaic rejects 64-lane HBM slab DMA "
                        "('must be aligned to tiling (128)', round 2)",
    "churn3d_copy_share": 0.11,   # ~48.6 of ~445 ms (r3), f32 head ~465 (r4)
    "churn3d_step_ms": 465.0,
    "canary": "XLA 0.9.0 SPMD miscompiles spatially+Cout-sharded convs "
              "(round 3) — trainer rejects spatial x model meshes",
}


def _verdict(flipped: bool, keep_msg: str, flip_msg: str) -> bool:
    print(f"  -> {'FLIPPED: ' + flip_msg if flipped else 'KEEP: ' + keep_msg}",
          flush=True)
    return flipped


def timeit(fn, steps=30):
    """Median-differential rate (RESULTS.md timing protocol): time N and 2N
    chained executions, scalar-readback sync — block_until_ready is a no-op
    through the axon relay."""
    def chain(k):
        t0 = time.perf_counter()
        out = None
        for _ in range(k):
            out = fn()
        float(out.reshape(-1)[0])
        return time.perf_counter() - t0

    chain(1)
    chain(2)
    t_n = [chain(steps) for _ in range(3)]
    t_2n = [chain(2 * steps) for _ in range(3)]
    return max(statistics.median(t_2n) - statistics.median(t_n), 1e-9) / steps


def probe_canary() -> bool:
    print("[canary] recorded:", RECORDED["canary"], flush=True)
    r = subprocess.run(
        [sys.executable, "-m", "pytest", "-q",
         "tests/test_tp.py::test_spatial_x_model_conv_miscompile"],
        cwd=REPO, capture_output=True, text=True)
    if r.returncode == 0:
        return _verdict(False, "XLA still miscompiles — the spatial x model "
                               "guard in engine/trainer.py stays", "")
    print(r.stdout[-2000:], flush=True)
    return _verdict(True, "", "the canary test failed, i.e. XLA now "
                    "partitions spatial x model convs correctly — lift the "
                    "trainer guard and re-benchmark the combined mesh")


def _pallas_inputs(B, H, W, C, Co):
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, C, Co)) * 0.05, jnp.bfloat16)
    sc = jnp.asarray(rng.standard_normal(Co) * 0.1 + 1, jnp.bfloat16)
    bi = jnp.asarray(rng.standard_normal(Co) * 0.1, jnp.bfloat16)
    res = jnp.asarray(rng.standard_normal((B, H, W, Co)), jnp.bfloat16)
    return x, w, sc, bi, res


def _xla_fused(x, w, sc, bi, res):
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def f(x, w, sc, bi, res):
        y = lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.maximum(y * sc + bi + res, 0)

    return f


def probe_mosaic64() -> bool:
    """Can Mosaic now DMA sub-128-lane slabs? (the 64-ch direct conv / the
    minimal-K phase conv both died on this wall)"""
    from uresnet_tpu.ops.pallas.conv2d import fused_conv3x3_bn_relu_v2

    print("[mosaic64] recorded:", RECORDED["mosaic64_blocked"], flush=True)
    x, w, sc, bi, res = _pallas_inputs(8, 256, 256, 64, 64)
    try:
        out = fused_conv3x3_bn_relu_v2(x, w, sc, bi, res, relu=True,
                                       block_h=8)
        float(out.reshape(-1)[0])
    except Exception as e:
        lines = [l for l in str(e).splitlines() if l.strip()]
        tail = lines[-1][:160] if lines else type(e).__name__
        print(f"  still rejected: {tail}", flush=True)
        return _verdict(False, "64-lane DMA still blocked — the sub-128-lane "
                               "K-slicing ceiling stands (RESULTS.md r2)", "")
    t_pal = timeit(lambda: fused_conv3x3_bn_relu_v2(
        x, w, sc, bi, res, relu=True, block_h=8))
    f = _xla_fused(x, w, sc, bi, res)
    t_xla = timeit(lambda: f(x, w, sc, bi, res))
    print(f"  COMPILED: pallas {t_pal*1e3:.2f} ms vs XLA {t_xla*1e3:.2f} ms",
          flush=True)
    return _verdict(True, "", "Mosaic now accepts sub-128-lane slabs — "
                    "re-derive the minimal-K phase conv (the 2.67x "
                    "K-inflation cut, RESULTS.md r2) and the 64-ch direct "
                    "conv")


def probe_pallas128() -> bool:
    from uresnet_tpu.ops.pallas.conv2d import fused_conv3x3_bn_relu_v2

    print("[pallas128] recorded:", RECORDED["pallas128_xla_wins"], flush=True)
    x, w, sc, bi, res = _pallas_inputs(32, 128, 256, 128, 128)
    f = _xla_fused(x, w, sc, bi, res)
    t_xla = timeit(lambda: f(x, w, sc, bi, res))
    try:
        out = fused_conv3x3_bn_relu_v2(x, w, sc, bi, res, relu=True,
                                       block_h=16)
        float(out.reshape(-1)[0])
        t_pal = timeit(lambda: fused_conv3x3_bn_relu_v2(
            x, w, sc, bi, res, relu=True, block_h=16))
    except Exception as e:
        tail = str(e).splitlines()[-1][:160] if str(e) else type(e).__name__
        print(f"  pallas no longer compiles ({tail}) — XLA path unaffected",
              flush=True)
        return _verdict(False, "XLA keeps the 128-lane convs", "")
    print(f"  XLA {t_xla*1e3:.2f} ms vs Pallas {t_pal*1e3:.2f} ms "
          f"(speedup {t_xla/t_pal:.2f}x)", flush=True)
    return _verdict(t_pal < 0.98 * t_xla,
                    "XLA still wins at 128 lanes — Pallas stays bench-gated "
                    "OFF",
                    "the Pallas fused conv now beats XLA — re-run "
                    "benchmarks/pallas_probe.py and gate it back ON")


def probe_churn3d() -> bool:
    """Copy share of the 3D flagship step — XLA's 3D conv layout churn
    (blocked z-slabs with disagreeing minor-dim orders, RESULTS.md r3)."""
    import numpy as np

    import jax

    from uresnet_tpu.config import Config, DataConfig, ModelConfig
    from uresnet_tpu.engine.trainer import Trainer
    from uresnet_tpu.parallel.mesh import make_mesh

    from profile_step import aggregate_trace

    print(f"[churn3d] recorded: copy share ~"
          f"{RECORDED['churn3d_copy_share']:.0%} of "
          f"~{RECORDED['churn3d_step_ms']:.0f} ms device-busy "
          f"(192^3 batch 1, packed, no remat, f32 head)", flush=True)
    cfg = Config(
        model=ModelConfig(dims=3, base_filters=16, depth=4,
                          compute_dtype="bfloat16", pack=True, remat=False,
                          head_dtype="float32"),
        data=DataConfig(image_size=192, batch_size=1))
    tr = Trainer(cfg, mesh=make_mesh())
    ts = tr.init_state()
    rng = np.random.default_rng(0)
    S = 192
    batch = tr._device_batch({
        "data": rng.random((1, S, S, S, 1), np.float32),
        "label": rng.integers(0, 3, (1, S, S, S)).astype(np.int32),
        "weight": np.ones((1, S, S, S), np.float32)})
    ts, m = tr.train_step_light(ts, batch)
    float(m["loss"])  # compile + sync
    outdir = "/tmp/uresnet_reprobe_trace"
    steps = 3
    jax.profiler.start_trace(outdir)
    for _ in range(steps):
        ts, m = tr.train_step_light(ts, batch)
    float(m["loss"])
    jax.profiler.stop_trace()
    step_ms, cat, _, _ = aggregate_trace(outdir, steps)
    copy_ms = cat.get("copy", 0) / 1e3 / steps
    share = copy_ms / max(step_ms, 1e-9)
    print(f"  measured: device-busy {step_ms:.1f} ms/step, copy "
          f"{copy_ms:.1f} ms ({share:.1%})", flush=True)
    flipped = share < 0.05 or step_ms < 0.85 * RECORDED["churn3d_step_ms"]
    return _verdict(flipped,
                    "the layout churn (and the 3D step) are unchanged — the "
                    "measured 3D formulation ceiling stands",
                    "the compiler moved (copy share or step time dropped "
                    "materially) — re-profile 3D (profile_step.py --dims 3) "
                    "and re-sweep remat/batch/pack_threshold")


PROBES = {
    "canary": probe_canary,
    "mosaic64": probe_mosaic64,
    "pallas128": probe_pallas128,
    "churn3d": probe_churn3d,
}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--probe", nargs="*", default=list(PROBES),
                   choices=list(PROBES))
    args = p.parse_args(argv)
    import jax

    print("platform:", jax.devices()[0].platform, flush=True)
    tpu_probes = {"mosaic64", "pallas128", "churn3d"}
    flips = []
    for name in args.probe:
        if name in tpu_probes and jax.devices()[0].platform != "tpu":
            print(f"[{name}] SKIPPED: needs the real TPU "
                  f"(platform={jax.devices()[0].platform})", flush=True)
            continue
        if PROBES[name]():
            flips.append(name)
    if flips:
        print(f"\nPROBES FLIPPED: {flips} — the recorded ceilings are stale; "
              f"re-derive per the messages above (RESULTS.md).", flush=True)
        return 1
    print("\nall probes KEEP: the recorded ceilings stand on this "
          "jax/libtpu.", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
