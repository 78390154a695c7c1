"""A/B the isect binning sort on real TPU.

Round-3 profile: binning is 128 ms of the 201 ms rasterize phase at S=4/518px
(537k splats x TPG=4 = 2.15M rows, 12 sort operands, per camera). lax.sort on
TPU is a bitonic network — cost ~ stages(log^2 N) x bytes/pass — so candidate
cuts are fewer operands (pack payload planes into fp16 pairs), fewer keys
(drop the determinism tiebreak for inference), or sort+gather.

Usage: python tools/sort_ab.py [--n 537088] [--tpg 4] [--iters 5]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax import lax
import numpy as np


def readback(x):
    leaf = jax.tree.leaves(x)[0]
    return float(jnp.asarray(leaf).reshape(-1)[0])


def timeit(fn, *args, iters=5, warmup=2):
    for _ in range(warmup):
        readback(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        readback(fn(*args))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=537088)
    ap.add_argument("--tpg", type=int, default=4)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    M = args.n * args.tpg
    # realistic key distribution: ~1122 tiles (33x34 at 518px), 20-bit depth
    tiles = rng.integers(0, 1122, size=M).astype(np.int32)
    depth = rng.integers(0, 1 << 20, size=M).astype(np.int32)
    key = jnp.asarray((tiles << 20) | depth)
    idx = jnp.arange(M, dtype=jnp.int32)
    planes = [jnp.asarray(rng.normal(size=M).astype(np.float32))
              for _ in range(10)]

    results = {}

    # (a) current: key + idx (2 keys) + 10 payload planes
    f = jax.jit(lambda k, i, *ps: lax.sort((k, i) + ps, num_keys=2,
                                           is_stable=False)[0])
    results["a_12op_2key"] = timeit(f, key, idx, *planes, iters=args.iters)

    # (b) single key, payload rides (11 operands)
    f = jax.jit(lambda k, *ps: lax.sort((k,) + ps, num_keys=1,
                                        is_stable=False)[0])
    results["b_11op_1key"] = timeit(f, key, *planes, iters=args.iters)

    # (c) fp16-packed payload: 10 planes -> 5 i32 (bitcast f16 pairs), 2 keys
    def pack(ps):
        out = []
        for j in range(0, len(ps), 2):
            a = ps[j].astype(jnp.float16).view(jnp.uint16).astype(jnp.uint32)
            b = ps[j + 1].astype(jnp.float16).view(jnp.uint16).astype(jnp.uint32)
            out.append(((a << 16) | b).view(jnp.int32))
        return tuple(out)
    packed = jax.jit(lambda *ps: pack(ps))(*planes)
    f = jax.jit(lambda k, i, *ps: lax.sort((k, i) + ps, num_keys=2,
                                           is_stable=False)[0])
    results["c_7op_2key_f16"] = timeit(f, key, idx, *packed, iters=args.iters)

    # (c1) fp16-packed + single key
    f = jax.jit(lambda k, *ps: lax.sort((k,) + ps, num_keys=1,
                                        is_stable=False)[0])
    results["c1_6op_1key_f16"] = timeit(f, key, *packed, iters=args.iters)

    # (d) key+idx sort then gather payloads by sorted idx
    def sort_gather(k, i, *ps):
        sk, si = lax.sort((k, i), num_keys=2, is_stable=False)
        return sk, tuple(p[si] for p in ps)
    f = jax.jit(sort_gather)
    results["d_sort2_gather10"] = timeit(f, key, idx, *planes, iters=args.iters)

    # (e) key-only sort (lower bound for any payload scheme)
    f = jax.jit(lambda k: lax.sort((k,), num_keys=1, is_stable=False)[0])
    results["e_key_only"] = timeit(f, key, iters=args.iters)

    # (f) 2-key sort, no payload (determinism cost in isolation)
    f = jax.jit(lambda k, i: lax.sort((k, i), num_keys=2, is_stable=False)[0])
    results["f_key_idx"] = timeit(f, key, idx, iters=args.iters)

    for k, v in results.items():
        print(f"{k:22s}: {v:8.1f} ms")


if __name__ == "__main__":
    main()
