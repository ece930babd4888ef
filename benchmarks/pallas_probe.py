"""Compile-and-measure probe: Pallas fused conv vs XLA on the real TPU.

VERDICT r1 #2 / SURVEY.md §7 stage 7: the bench gate demands a COMPILED
measurement, not a failed compile. This probe, per shape:
  1. compiles fused_conv3x3_bn_relu_v2 (full-row DMA, no misaligned slices),
  2. checks numerics vs the XLA conv+affine+ReLU reference,
  3. times both with the relay-safe median-differential protocol.

Run ONE at a time on the chip:  python benchmarks/pallas_probe.py
"""

from __future__ import annotations

import statistics
import sys
import time
import traceback

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from uresnet_tpu.ops.pallas.conv2d import fused_conv3x3_bn_relu_v2


def timeit(fn, *args, steps=30):
    """Median-differential: rate from t(2N) - t(N), scalar-readback sync."""
    def chain(k):
        t0 = time.perf_counter()
        out = None
        for _ in range(k):
            out = fn(*args)
        float(out[0, 0, 0, 0])
        return time.perf_counter() - t0

    chain(1); chain(2)
    t_n = [chain(steps) for _ in range(3)]
    t_2n = [chain(2 * steps) for _ in range(3)]
    return max(statistics.median(t_2n) - statistics.median(t_n),
               1e-9) / steps


def xla_ref(x, w, sc, bi, res, relu=True):
    y = lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y * sc + bi
    if res is not None:
        y = y + res
    return jnp.maximum(y, 0) if relu else y


def probe(B, H, W, C, Co, dtype=jnp.bfloat16, block_h=8, residual=True,
          steps=30):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), dtype)
    w = jnp.asarray(rng.standard_normal((3, 3, C, Co)) * 0.05, dtype)
    sc = jnp.asarray(rng.standard_normal(Co) * 0.1 + 1, dtype)
    bi = jnp.asarray(rng.standard_normal(Co) * 0.1, dtype)
    res = (jnp.asarray(rng.standard_normal((B, H, W, Co)), dtype)
           if residual else None)
    flops = 2 * B * H * W * 9 * C * Co

    name = f"{B}x{H}x{W}x{C}->{Co} bh={block_h} res={residual}"
    ref_fn = jax.jit(xla_ref)
    want = ref_fn(x, w, sc, bi, res)
    t_xla = timeit(lambda *a: ref_fn(x, w, sc, bi, res), steps=steps)
    print(f"[{name}] XLA    : {t_xla*1e3:7.3f} ms  "
          f"{flops/t_xla/1e12:6.1f} TF/s", flush=True)

    try:
        fn = lambda: fused_conv3x3_bn_relu_v2(x, w, sc, bi, res,
                                              relu=True, block_h=block_h)
        got = fn()
        err = float(jnp.abs(got.astype(jnp.float32)
                            - want.astype(jnp.float32)).max())
        t_pal = timeit(lambda *a: fn(), steps=steps)
        print(f"[{name}] PALLAS : {t_pal*1e3:7.3f} ms  "
              f"{flops/t_pal/1e12:6.1f} TF/s  maxerr={err:.2e}  "
              f"speedup={t_xla/t_pal:.2f}x", flush=True)
    except Exception:
        print(f"[{name}] PALLAS compile/run FAILED:", flush=True)
        traceback.print_exc()
        tb = traceback.format_exc()
        tail = [l for l in tb.splitlines() if l.strip()][-3:]
        print("   diag tail:", *tail, sep="\n   ", flush=True)


if __name__ == "__main__":
    print("platform:", jax.devices()[0].platform, flush=True)
    # hpack'd L0 shape: 128 lanes, XLA reference ~104 TF/s (RESULTS.md)
    probe(32, 128, 256, 128, 128, block_h=8)
    probe(32, 128, 256, 128, 128, block_h=16)
    # packed L0 shape: 64 lanes, XLA ~30 TF/s — the flat-profile ceiling
    probe(32, 256, 256, 64, 64, block_h=8)
    probe(32, 256, 256, 64, 64, block_h=16)
