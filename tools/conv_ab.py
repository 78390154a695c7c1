"""Isolated DPT-conv microbench (VERDICT r4 #1: attribute the heads' conv
time and find headroom).

The S=4/518px trace shows conv_general_dilated at ~57 ms/forward — the
second-largest line. This tool times the dominant DPT conv shapes (the
fusion residual-conv-unit stack at 148/74/37/19 px, layer_rn, output convs)
under dtype/precision variants, in-jit K-repeated (no dispatch floor), one
variant per run line.

Usage: python tools/conv_ab.py [--k 8]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    import numpy as np
    import bench

    floor = bench.measure_floor()

    # (label, B, H, W, Cin, Cout, kernel) — per-frame batch B=4 (B*S frames)
    shapes = [
        ("rcu148 3x3 256",  4, 148, 148, 256, 256, 3),
        ("rcu74 3x3 256",   4, 74, 74, 256, 256, 3),
        ("lrn148 3x3 256",  4, 148, 148, 256, 256, 3),
        ("out1 3x3 256>128", 4, 148, 148, 256, 128, 3),
        ("out2 3x3 128>32 518px", 4, 518, 518, 128, 32, 3),
        ("merger 7x7 3>128 518px", 4, 518, 518, 3, 128, 7),
    ]

    def conv_fn(x, w, prec):
        return lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=prec)

    def time_variant(label, B, H, W, Ci, Co, K, dtype, prec, pname):
        x = jnp.ones((B, H, W, Ci), dtype)
        w = jnp.ones((K, K, Ci, Co), dtype) * 0.01

        def chained(x, w):
            acc = jnp.zeros((), jnp.float32)
            for i in range(args.k):
                y = conv_fn(x + acc.astype(x.dtype) * 1e-20, w, prec)
                acc = acc + y[0, 0, 0, 0].astype(jnp.float32)
            return acc
        f = jax.jit(chained)
        t = (bench._time(f, x, w, iters=2) - floor) / args.k
        gflop = 2.0 * B * H * W * K * K * Ci * Co / 1e9
        print(f"{label:26s} {str(dtype):8s} {pname:8s} "
              f"{1e3 * t:7.3f} ms  {gflop / t / 1e3:6.1f} TF/s", flush=True)
        return t

    for label, B, H, W, Ci, Co, K in shapes:
        for dtype, prec, pname in (
                (jnp.float32, None, "default"),
                (jnp.float32, lax.Precision.HIGHEST, "highest"),
                (jnp.bfloat16, None, "default"),
        ):
            time_variant(label, B, H, W, Ci, Co, K, dtype, prec, pname)


if __name__ == "__main__":
    main()
