"""A/B the blend-kernel chunk width on real TPU (WM_RASTER_CHUNK).

Uses the in-jit repeat methodology (tools/phase_repeat.py): K rasterize
passes chained inside one jit, floor-subtracted.

Usage: python tools/raster_chunk_ab.py [--n 537088] [--k 6]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def readback(x):
    return float(jnp.asarray(jax.tree.leaves(x)[0]).reshape(-1)[0])


def time_once(fn, *a, iters=2, warmup=1):
    for _ in range(warmup):
        readback(fn(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        readback(fn(*a))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=537088)
    ap.add_argument("--k", type=int, default=6)
    ap.add_argument("--img", type=int, default=518)
    args = ap.parse_args()
    from hunyuanworld_mirror_tpu.ops import rasterizer

    rng = np.random.default_rng(0)
    N, W, H = args.n, args.img, args.img
    means = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
    means = means.at[:, 2].add(3.0)
    quats = jnp.asarray(rng.normal(size=(N, 4)).astype(np.float32))
    scales = jnp.asarray(np.full((N, 3), 0.004, np.float32))
    opac = jnp.asarray(rng.uniform(0.3, 0.9, size=N).astype(np.float32))
    sh = jnp.asarray(rng.normal(size=(N, 1, 3)).astype(np.float32) * 0.3)
    c2w = np.eye(4, dtype=np.float32)
    vm = jnp.asarray(np.linalg.inv(c2w))[None].repeat(4, 0)
    K = jnp.asarray(np.array([[500.0, 0, W / 2], [0, 500.0, H / 2],
                              [0, 0, 1]], np.float32))[None].repeat(4, 0)

    floor = time_once(jax.jit(lambda x: x + 1.0), jnp.ones((8, 128)))
    print(f"floor: {1e3*floor:6.1f} ms", flush=True)

    def run(chunk):
        os.environ["WM_RASTER_CHUNK"] = str(chunk)
        # rasterize is a module-level @jax.jit whose trace cache does NOT
        # key on env vars: without clearing, every config would re-time the
        # first config's compiled code (round-4 methodology fix — this
        # invalidated the round-3 chunk-sweep conclusions)
        rasterizer._rasterize_jit.clear_cache()

        def chained(m):
            acc = 0.0
            for i in range(args.k):
                colors, _, _ = rasterizer.rasterize(
                    m + acc + i * 1e-9, quats, scales, opac, sh, vm, K, W, H,
                    render_mode="RGB+ED", max_per_tile=4096,
                    max_tiles_per_gauss=4, impl="pallas", quat_order="wxyz")
                acc = acc + colors[0, 0, 0, 0] * 1e-20
            return acc
        t = (time_once(jax.jit(chained), means) - floor) / args.k
        print(f"chunk {chunk:4d}: {1e3*t:7.1f} ms / 4-cam rasterize",
              flush=True)

    for chunk in (512, 256, 128, 1024):
        run(chunk)


if __name__ == "__main__":
    main()
