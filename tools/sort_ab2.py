"""A/B: payload-rides-sort vs 2-key sort + flat gather, and row scaling.

The 8-operand isect sort at 4.83M rows costs ~13 ms/cam (tools/bin_ab.py);
this probes (a) whether a 2-operand sort + a flat per-plane gather by the
sorted permutation beats carrying payload through the sort, and (b) how sort
time scales with rows, to size a potential row-count reduction.

Usage: python tools/sort_ab2.py [--k 8]
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
    return float(jnp.asarray(jax.tree.leaves(x)[0]).reshape(-1)[0])


def time_k(fn, *args, iters=2, warmup=1):
    for _ in range(warmup):
        readback(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        readback(fn(*args))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=8)
    args = ap.parse_args()
    K = args.k

    t_floor = time_k(jax.jit(lambda x: x + 1.0), jnp.ones((8, 128)), iters=3)
    print(f"floor {1e3*t_floor:.1f} ms")

    def rep(stage, n_args):
        def chained(*xs):
            acc = 0.0
            for i in range(K):
                out = stage(*((xs[0] + acc,) + xs[1:]))
                acc = acc + jax.tree.leaves(out)[0].reshape(-1)[0] * 1e-20
            return acc
        return jax.jit(chained)

    key = jax.random.PRNGKey(0)

    # (a) payload-carry vs gather at M=4.83M, V=6 payload planes
    M = 537088 * 9
    ks = jax.random.split(key, 9)
    skey = jax.random.randint(ks[0], (M,), 0, 1 << 30, dtype=jnp.int32)
    planes = tuple(jax.random.normal(ks[1 + j], (M,)) for j in range(6))

    def s_carry(skey, *planes):
        idx = jnp.arange(M, dtype=jnp.int32)
        srt = lax.sort((skey, idx) + planes, num_keys=2, is_stable=False)
        return srt[2]

    def s_gather(skey, *planes):
        idx = jnp.arange(M, dtype=jnp.int32)
        sk, si = lax.sort((skey, idx), num_keys=2, is_stable=False)
        outs = [p[si] for p in planes]
        return outs[0]

    def s_sort2(skey, *planes):
        idx = jnp.arange(M, dtype=jnp.int32)
        sk, si = lax.sort((skey, idx), num_keys=2, is_stable=False)
        return si.astype(jnp.float32)

    for nm, st in [("sort8_carry", s_carry), ("sort2_only", s_sort2),
                   ("sort2+gather6", s_gather)]:
        t = time_k(rep(st, 7), skey, *planes)
        print(f"{nm:14s}: {1e3*(t - t_floor)/K:8.2f} ms", flush=True)

    # (b) 8-op sort row scaling
    for rows in (1208448, 2416896, 4833792):
        sk = jax.random.randint(ks[7], (rows,), 0, 1 << 30, dtype=jnp.int32)
        pl = tuple(jax.random.normal(ks[8], (rows,)) for _ in range(6))

        def s8(sk, *pl):
            idx = jnp.arange(rows, dtype=jnp.int32)
            srt = lax.sort((sk, idx) + pl, num_keys=2, is_stable=False)
            return srt[2]

        t = time_k(rep(s8, 7), sk, *pl)
        print(f"sort8 rows={rows/1e6:.2f}M: {1e3*(t - t_floor)/K:8.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
