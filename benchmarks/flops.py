"""Analytic FLOP accounting for the U-ResNet train step.

Used by the RESULTS.md profile sections to turn measured step times into
raw/useful TF/s. "Useful" counts the canonical (unpacked) model's MACs —
the math the physics needs; "raw" is what the packed layout actually issues
(structural zeros from the K-inflation, ops/pack.py). Both are analytic:
conv MACs = prod(S_out) * k^dims * Cin * Cout (transpose convs counted
input-centric — every input pixel contributes k^dims taps, which equals
XLA's useful work for a stride-2 fractionally-strided conv).

Train-step multiplier: forward + dW + dX = ~3x forward MACs; each remat
mode re-runs the forward once during the backward (+1x -> 4x).

Run anywhere (pure python):
    python benchmarks/flops.py --dims 3 --size 192 --batch 2 --depth 4
"""

import argparse


def conv_macs(s_out, k, cin, cout, dims):
    return (s_out ** dims) * (k ** dims) * cin * cout


def uresnet_forward_macs(*, size, batch, dims, depth, base, blocks=2,
                         num_class=3, in_ch=1, final_kernel=3):
    """Canonical forward MACs per BATCH (models/uresnet.py structure)."""
    total = conv_macs(size, 3, in_ch, base, dims)                    # stem
    for lvl in range(depth):
        s = size >> lvl
        f = base << lvl
        total += blocks * 2 * conv_macs(s, 3, f, f, dims)            # enc
        total += conv_macs(s >> 1, 3, f, 2 * f, dims)                # down
    sb = size >> depth
    fb = base << depth
    total += blocks * 2 * conv_macs(sb, 3, fb, fb, dims)             # mid
    for lvl in reversed(range(depth)):
        s = size >> lvl
        f = base << lvl
        # up-tconv, input-centric: (s/2)^dims inputs, k^dims taps each
        total += conv_macs(s >> 1, 3, 2 * f, f, dims)
        # dec block 0: conv(2f->f) + conv(f->f) + 1x1 proj(2f->f)
        total += conv_macs(s, 3, 2 * f, f, dims)
        total += conv_macs(s, 3, f, f, dims)
        total += conv_macs(s, 1, 2 * f, f, dims)
        # dec blocks 1..: conv(f->f) x2
        total += (blocks - 1) * 2 * conv_macs(s, 3, f, f, dims)
    total += conv_macs(size, final_kernel, base, num_class, dims)    # head
    return total * batch


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--dims", type=int, default=2)
    p.add_argument("--depth", type=int, default=None)
    p.add_argument("--base", type=int, default=16)
    p.add_argument("--step-ms", type=float, default=None,
                   help="measured train-step time -> prints useful TF/s")
    p.add_argument("--remat", action="store_true",
                   help="count the remat forward recompute (4x fwd, not 3x)")
    args = p.parse_args()
    depth = args.depth if args.depth is not None else (5 if args.dims == 2
                                                      else 4)
    fwd = uresnet_forward_macs(size=args.size, batch=args.batch,
                               dims=args.dims, depth=depth, base=args.base)
    mult = 4 if args.remat else 3
    train_flops = fwd * mult * 2  # MAC = 2 flops
    print(f"forward: {fwd * 2 / 1e9:.1f} GFLOP/batch "
          f"({fwd * 2 / args.batch / 1e9:.1f} per item)")
    print(f"train step ({mult}x fwd): {train_flops / 1e9:.1f} GFLOP/batch")
    if args.step_ms:
        print(f"useful throughput at {args.step_ms:.1f} ms/step: "
              f"{train_flops / (args.step_ms / 1e3) / 1e12:.1f} TF/s")


if __name__ == "__main__":
    main()
