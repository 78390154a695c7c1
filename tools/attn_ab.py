"""A/B harness for the trunk attention implementation on the real chip.

Measures (a) the isolated global-attention stack and (b) the full-model
forward, for each WM_ATTN_IMPL setting, in ONE process so compile caches and
chip state are shared. Usage:

    python tools/attn_ab.py [--views 4] [--img 518] [--iters 5]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def readback(tree):
    leaf = jax.tree.leaves(tree)[0]
    return float(jnp.asarray(leaf).reshape(-1)[0])


def timeit(fn, *args, iters=5, warmup=2):
    for _ in range(warmup):
        readback(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        readback(fn(*args))
    return (time.perf_counter() - t0) / iters


def bench_full(impl: str, views: int, img: int, iters: int, env=None):
    os.environ["WM_ATTN_IMPL"] = impl
    for k, v in (env or {}).items():
        os.environ[k] = str(v)
    from hunyuanworld_mirror_tpu.models import worldmirror
    cfg = worldmirror.WorldMirrorConfig(img_size=img, rasterizer_impl="pallas")
    params = worldmirror.init(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params)
    views_d = {"img": jnp.ones((1, views, img, img, 3), jnp.float32) * 0.5}
    fwd = jax.jit(lambda p, v: worldmirror.forward(p, cfg, v, render=True))
    dt = timeit(fwd, params, views_d, iters=iters)
    return views / dt, dt


def bench_stack(impl: str, views: int, img: int, iters: int):
    """24 global-attention layers alone on (1, S*N, C)."""
    os.environ["WM_ATTN_IMPL"] = impl
    from hunyuanworld_mirror_tpu.models import block as blk
    from hunyuanworld_mirror_tpu.models import nn
    from hunyuanworld_mirror_tpu.models.rope import (grid_positions,
                                                     make_rope_tables,
                                                     tile_tables)
    C, H, D = 1024, 16, 24
    p = img // 14
    N = p * p + 5
    S = views
    key = jax.random.PRNGKey(0)
    params = nn.stack_params([
        blk.block_init(k, C, H, qk_norm=True, init_values=0.01)
        for k in jax.random.split(key, D)])
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    pos = grid_positions(p, p, 5)
    rope = tile_tables(make_rope_tables(pos, C // H, 100.0), S)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, S * N, C), jnp.bfloat16)

    def run(pp, xx):
        def step(carry, lp):
            return blk.block(lp, carry, H, rope=rope), None
        out, _ = jax.lax.scan(step, xx, pp)
        return out

    f = jax.jit(run)
    dt = timeit(f, params, x, iters=iters)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=4)
    ap.add_argument("--img", type=int, default=518)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--impls", default="einsum,flash")
    ap.add_argument("--mode", default="both",
                    choices=["both", "full", "stack", "sweep"])
    args = ap.parse_args()

    if args.mode == "sweep":
        # Measured r2 sweep 1 (S=4/518px, v5e): einsum 544.0 ms; global-only
        # flash blk512 527.4 (default); blk256 586.9; blk128 795.1; frame-
        # layer flash loses at every small block (512: 552.9, 256: 649.9,
        # 128: 1022.1). Sweep 2: blk=1408 = FULL-SEQ block for frame layers
        # (N=1374 pads +2.5% to one 1408 block, scores stay in VMEM, no
        # 241 MB/layer logits HBM round-trip) and 4-step kv for global.
        combos = [
            ("flash", {"WM_FLASH_MIN_N": 512, "WM_FLASH_BLOCK": 1408}),
            ("flash", {"WM_FLASH_MIN_N": 4096, "WM_FLASH_BLOCK": 1408}),
        ]
        for impl, env in combos:
            fps, dt = bench_full(impl, args.views, args.img, args.iters,
                                 env=env)
            print(f"[sweep] impl={impl:6s} env={env} {1e3*dt:8.1f} ms  "
                  f"{fps:6.3f} f/s", flush=True)
        return

    for impl in args.impls.split(","):
        if args.mode in ("both", "stack"):
            dt = bench_stack(impl, args.views, args.img, args.iters)
            print(f"[stack] impl={impl:8s} {1e3*dt:8.1f} ms", flush=True)
        if args.mode in ("both", "full"):
            fps, dt = bench_full(impl, args.views, args.img, args.iters)
            print(f"[full ] impl={impl:8s} {1e3*dt:8.1f} ms  {fps:6.3f} f/s",
                  flush=True)


if __name__ == "__main__":
    main()
