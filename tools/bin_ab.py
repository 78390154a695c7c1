"""Decompose the tile-binning stage cost: isect keys / sort / tile edges.

K-repeat honest timing (see tools/phase_repeat.py) of bin_gaussians_packed's
three internal stages at production shapes (537k compacted splats, 4 cams,
518px, TPG=9 -> 4.83M rows/cam), so optimization lands where the time is.

Usage: python tools/bin_ab.py [--n 537088] [--cams 4] [--k 8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax import lax


def readback(x):
    leaf = jax.tree.leaves(x)[0]
    return float(jnp.asarray(leaf).reshape(-1)[0])


def time_k(fn, *args, iters=2, warmup=1):
    for _ in range(warmup):
        readback(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        readback(fn(*args))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=537088)
    ap.add_argument("--cams", type=int, default=4)
    ap.add_argument("--k", type=int, default=8)
    args = ap.parse_args()
    N, C, K = args.n, args.cams, args.k

    from hunyuanworld_mirror_tpu.ops import tiles

    W = H = 518
    tile_size = 16
    tw, th = -(-W // tile_size), -(-H // tile_size)
    n_tiles = tw * th
    TPG = 9

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    m2d = jax.random.uniform(ks[0], (N, 2)) * jnp.asarray([W, H])
    rad = (jax.random.uniform(ks[1], (N, 2)) * 12 + 1).astype(jnp.int32)
    dep = jax.random.uniform(ks[2], (N,)) * 10 + 0.1
    vals = tuple(jax.random.normal(ks[3 + j], (N,)) for j in range(5))

    t_floor = time_k(jax.jit(lambda x: x + 1.0), jnp.ones((8, 128)), iters=3)

    def rep(stage):
        def chained(m2d, rad, dep, vals):
            acc = 0.0
            for i in range(K):
                out = stage(m2d + acc, rad, dep, vals)
                leaf = jax.tree.leaves(out)[0]
                acc = acc + leaf.reshape(-1)[0] * 1e-20
            return acc
        return jax.jit(chained)

    # stage 1: isect keys only
    def s_keys(m2d, rad, dep, vals):
        k, _, _ = tiles._isect_keys(m2d, rad, dep, tile_size, tw, th, TPG)
        return k.reshape(-1).astype(jnp.float32)

    # stage 2: keys + sort (7 operands: key, idx, 5 payload planes)
    def s_sort(m2d, rad, dep, vals):
        k, _, _ = tiles._isect_keys(m2d, rad, dep, tile_size, tw, th, TPG)
        flat_idx = jnp.arange(N * TPG, dtype=jnp.int32)
        ops = (k.reshape(-1), flat_idx) + tuple(
            jnp.broadcast_to(p[None, :], (TPG, N)).reshape(-1) for p in vals)
        srt = lax.sort(ops, num_keys=2, is_stable=False)
        return srt[2]

    # stage 3: full bin_gaussians_packed
    def s_full(m2d, rad, dep, vals):
        fl = tiles.bin_gaussians_packed(m2d, rad, dep, vals, tile_size, tw,
                                        th, TPG, 8192)
        return fl.packed

    # searchsorted alone at production sizes
    def s_edges(m2d, rad, dep, vals):
        k, _, _ = tiles._isect_keys(m2d, rad, dep, tile_size, tw, th, TPG)
        flat_idx = jnp.arange(N * TPG, dtype=jnp.int32)
        srt = lax.sort((k.reshape(-1), flat_idx), num_keys=2, is_stable=False)
        e = tiles._searchsorted_2level(
            srt[0], jnp.arange(n_tiles + 1, dtype=jnp.int32) << tiles.DEPTH_BITS)
        return e.astype(jnp.float32)

    names = [("keys", s_keys), ("keys+sort7", s_sort),
             ("keys+sort2+edges", s_edges), ("full_bin", s_full)]
    print(f"floor {1e3*t_floor:.1f} ms  rows/cam {N*TPG/1e6:.2f}M  K={K}")
    for nm, st in names:
        t = time_k(rep(st), m2d, rad, dep, vals)
        print(f"{nm:18s}: {1e3*(t - t_floor)/K:8.2f} ms/cam", flush=True)


if __name__ == "__main__":
    main()
