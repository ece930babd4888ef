"""3D space-to-depth / depth-to-space implementation shoot-out.

The 192^3 profile (RESULTS.md round 3) shows ~27% of the hot step in
copy/reshape/slice/pad — the packed level boundaries relayout full volumes
through the all-dims transpose path because no 3D boundary shape satisfies
the >=128-lane reshape fast path (r*C = 32/64 at the s2d inputs). This
benchmark times three exact-equivalent implementations at the real
boundary shapes:

  * transpose  — ops/pack.py default (6D/8D transpose, ~75 GB/s in 2D)
  * slices     — 2^dims strided slices + channel concat
  * conv       — one-hot 2x2x2 stride-2 conv (s2d) / transpose conv (d2s):
                 turns the relayout into MXU work

Run on the TPU:  python benchmarks/relayout3d.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from benchmarks.micro import timeit
from uresnet_tpu.ops.pack import depth_to_space, space_to_depth


def s2d_slices(x, dims=3):
    parts = []
    for p in range(2 ** dims):
        # phase-major (p_0, ..., p_{dims-1}): p0 is the most-significant bit
        sl = [slice(None)]
        for d in range(dims):
            bit = (p >> (dims - 1 - d)) & 1
            sl.append(slice(bit, None, 2))
        sl.append(slice(None))
        parts.append(x[tuple(sl)])
    return jnp.concatenate(parts, axis=-1)


def d2s_slices(x, dims=3):
    # inverse via scatter-free interleave: build with zeros + adds is slow;
    # use reshape/transpose inverse only for verification fallback
    return depth_to_space(x, dims=dims)


def _s2d_conv_kernel(C, dims, dtype):
    P = 2 ** dims
    w = np.zeros((2,) * dims + (C, P * C), dtype)
    for p in range(P):
        idx = tuple((p >> (dims - 1 - d)) & 1 for d in range(dims))
        for c in range(C):
            w[idx + (c, p * C + c)] = 1
    return jnp.asarray(w)


def s2d_conv(x, dims=3):
    C = x.shape[-1]
    w = _s2d_conv_kernel(C, dims, np.float32).astype(x.dtype)
    dn = ("NDHWC", "DHWIO", "NDHWC") if dims == 3 else ("NHWC", "HWIO", "NHWC")
    return lax.conv_general_dilated(x, w, (2,) * dims, "VALID",
                                    dimension_numbers=dn)


def d2s_conv(x, dims=3):
    P = 2 ** dims
    C = x.shape[-1] // P
    w = _s2d_conv_kernel(C, dims, np.float32).astype(x.dtype)
    dn = ("NDHWC", "DHWIO", "NDHWC") if dims == 3 else ("NHWC", "HWIO", "NHWC")
    # transpose conv with the SAME one-hot kernel inverts the packing
    return lax.conv_transpose(x, w, (2,) * dims, "VALID",
                              dimension_numbers=dn,
                              transpose_kernel=True)


def main():
    dt = jnp.bfloat16
    shapes = [
        ("enc0 s2d 192^3x16", (2, 192, 192, 192, 16), "s2d"),
        ("enc1 s2d 96^3x32", (2, 96, 96, 96, 32), "s2d"),
        ("dec1 d2s 48^3x(8*32)", (2, 48, 48, 48, 256), "d2s"),
        ("dec0/head d2s 96^3x(8*16)", (2, 96, 96, 96, 128), "d2s"),
    ]
    for name, shape, kind in shapes:
        x = jnp.asarray(np.random.default_rng(0).standard_normal(shape),
                        dt)
        if kind == "s2d":
            fns = {
                "transpose": jax.jit(lambda a: space_to_depth(a, dims=3)),
                "slices": jax.jit(lambda a: s2d_slices(a, dims=3)),
                "conv": jax.jit(lambda a: s2d_conv(a, dims=3)),
            }
            ref = np.asarray(fns["transpose"](x), np.float32)
        else:
            fns = {
                "transpose": jax.jit(lambda a: depth_to_space(a, dims=3)),
                "conv": jax.jit(lambda a: d2s_conv(a, dims=3)),
            }
            ref = np.asarray(fns["transpose"](x), np.float32)
        gb = 2 * np.prod(shape) * 2 / 1e9  # read + write, bf16
        print(f"{name}:")
        for label, fn in fns.items():
            got = np.asarray(fn(x), np.float32)
            ok = np.array_equal(got, ref)
            t = timeit(fn, x, iters=10)
            print(f"  {label:10s} {t * 1e3:7.2f} ms  {gb / t:6.0f} GB/s "
                  f"{'OK' if ok else 'MISMATCH'}")


if __name__ == "__main__":
    main()
