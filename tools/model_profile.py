"""Per-phase profiler + roofline for the WorldMirror forward.

SURVEY.md §5.1: the reference has no model-path profiling; this tool times
encoder/trunk/heads/render separately, prints a phase table, reports the
trunk's speed-of-light fraction, and optionally writes an xprof trace.

  python tools/model_profile.py [--views 4] [--size 518] [--preset tiny] \
      [--trace /tmp/trace] [--iters 3]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--views", type=int, default=4)
    p.add_argument("--size", type=int, default=518)
    p.add_argument("--preset", choices=["large", "base", "small", "tiny"],
                   default="large")
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--trace", default=None, help="xprof trace output dir")
    p.add_argument("--rasterizer", choices=["jax", "pallas"], default="pallas")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from hunyuanworld_mirror_tpu.models import worldmirror, aggregator, dpt, camera_head
    from hunyuanworld_mirror_tpu.utils import profiling

    presets = {
        "large": {},
        "base": dict(embed_dim=768, patch_embed="dinov2_vitb14_reg"),
        "small": dict(embed_dim=384, patch_embed="dinov2_vits14_reg",
                      trunk_depth=12, trunk_heads=6,
                      intermediate_idxs=(2, 5, 8, 11)),
        "tiny": dict(embed_dim=64, patch_embed="conv", trunk_depth=4,
                     trunk_heads=4, gs_dim=32, intermediate_idxs=(0, 1, 2, 3)),
    }
    cfg = worldmirror.WorldMirrorConfig(
        img_size=args.size, rasterizer_impl=args.rasterizer,
        **presets[args.preset])
    params = worldmirror.init(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params)
    views = {"img": jnp.full((1, args.views, args.size, args.size, 3), 0.5)}

    timer = profiling.PhaseTimer()

    # phase-separable functions
    trunk = jax.jit(lambda p, v: aggregator.forward(
        p["vgt"], cfg.vgt, v["img"])[0])
    full = jax.jit(lambda p, v: worldmirror.forward(p, cfg, v, render=True))
    no_render = jax.jit(lambda p, v: worldmirror.forward(p, cfg, v,
                                                         render=False))

    t_trunk = profiling.time_fn(trunk, params, views, iters=args.iters)
    timer.record("trunk (enc+attn)", t_trunk)
    t_heads = profiling.time_fn(no_render, params, views, iters=args.iters)
    timer.record("trunk+heads", t_heads)
    t_full = profiling.time_fn(full, params, views, iters=args.iters)
    timer.record("full (with render)", t_full)
    timer.record("heads only (delta)", max(t_heads - t_trunk, 0.0))
    timer.record("render only (delta)", max(t_full - t_heads, 0.0))

    print(timer.summary())
    fps = args.views / t_full
    print(f"\nframes/sec: {fps:.3f}  ({args.views} views @ {args.size}px)")

    # trunk roofline
    P = (args.size // cfg.vgt.patch_size) ** 2 + cfg.vgt.patch_start_idx
    fl = profiling.vgt_flops(1, args.views, P, cfg.vgt.embed_dim,
                             cfg.vgt.depth)
    r = profiling.roofline(fl, 0.0, t_trunk)
    print(f"trunk: {fl / 1e12:.2f} TFLOP, speed-of-light "
          f"{r['t_sol_ms']:.1f} ms, measured {r['t_measured_ms']:.1f} ms "
          f"-> {100 * r['sol_fraction']:.1f}% of {r['chip']} peak")

    if args.trace:
        with profiling.trace(args.trace):
            out = full(params, views)
            float(jax.tree.leaves(out)[0].mean())
        print(f"xprof trace written to {args.trace}")


if __name__ == "__main__":
    main()
