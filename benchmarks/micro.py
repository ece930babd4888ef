"""Microbenchmarks of the hot ops at representative U-ResNet shapes.

Guides the bench-gated kernel work (SURVEY.md §7 stage 7): measures each
level's conv / strided-conv / transpose-conv and the candidate
phase-decomposed upsample, so fusion effort goes where the time is.

Run on the TPU:  python benchmarks/micro.py [--size 512] [--batch 16]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def timeit(fn, *args, iters=20):
    """Differential timing with host-readback sync: block_until_ready is a
    no-op on the axon relay, and readbacks have O(100ms) jitter — time
    iters and 2*iters chained runs, median difference (see bench.py)."""
    import statistics

    def chain(k):
        out = fn(*args)
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn(*args)
        leaf = jax.tree.leaves(out)[0]
        np.asarray(leaf[(0,) * leaf.ndim])  # scalar readback sync
        return time.perf_counter() - t0

    chain(1)  # compile+warm
    t1 = [chain(iters) for _ in range(3)]
    t2 = [chain(2 * iters) for _ in range(3)]
    return max(statistics.median(t2) - statistics.median(t1), 1e-9) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--base", type=int, default=16)
    p.add_argument("--depth", type=int, default=5)
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()

    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    rng = np.random.default_rng(0)
    dn = ("NHWC", "HWIO", "NHWC")

    def conv(x, w, s):
        return lax.conv_general_dilated(x, w, (s, s), "SAME",
                                        dimension_numbers=dn)

    def convt(x, w, s):
        return lax.conv_transpose(x, w, (s, s), "SAME", dimension_numbers=dn)

    rows = []
    for lvl in range(args.depth + 1):
        S = args.size // (2 ** lvl)
        C = args.base * (2 ** lvl)
        x = jnp.asarray(rng.standard_normal((args.batch, S, S, C)), dt)
        w = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.05, dt)
        w2 = jnp.asarray(rng.standard_normal((3, 3, C, 2 * C)) * 0.05, dt)
        t_conv = timeit(jax.jit(lambda x, w: conv(x, w, 1)), x, w)
        t_down = timeit(jax.jit(lambda x, w: conv(x, w, 2)), x, w2)
        flops = 2 * args.batch * S * S * 9 * C * C
        rows.append((f"L{lvl} {S}x{S}x{C}", t_conv, flops / t_conv / 1e12,
                     t_down))
        if lvl > 0:
            wup = jnp.asarray(rng.standard_normal((3, 3, C, C // 2)) * 0.05, dt)
            t_up = timeit(jax.jit(lambda x, w: convt(x, w, 2)), x, wup)
            up_flops = 2 * args.batch * (2 * S) ** 2 * 9 * C * (C // 2) / 4
            rows.append((f"L{lvl} up {S}->{2*S} {C}->{C//2}", t_up,
                         up_flops / t_up / 1e12, None))

    print(f"{'op':34s} {'ms':>9s} {'eff TF/s':>9s} {'down ms':>9s}")
    for name, t, tf, td in rows:
        td_s = f"{td*1e3:9.3f}" if td else "        -"
        print(f"{name:34s} {t*1e3:9.3f} {tf:9.2f} {td_s}")


if __name__ == "__main__":
    main()
