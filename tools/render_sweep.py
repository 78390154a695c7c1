"""Cache-cleared composed gs_render sweep on the real chip.

Sweeps rasterizer knobs over the COMPOSED render phase (head conv + prepare
+ prune + compact + binning + blend) with honest in-jit repeat timing.

CRITICAL methodology note (round 4): `ops.rasterizer.rasterize` is a
module-level @jax.jit and jit trace caches do NOT key on environment
variables — any sweep that flips WM_RASTER_* env knobs without calling
`_rasterize_jit.clear_cache()` re-times the FIRST config's compiled code
under every label (this invalidated the round-3 group/chunk sweeps; the
tell is bit-identical outputs AND identical times across configs).

Usage: python tools/render_sweep.py [--views 4] [--img 518] [--k 8]
       [--knob group|chunk|scan_sub|mxu_sigma|tile]
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


KNOBS = {
    "group": ("WM_RASTER_GROUP", ("1", "4", "8", "16")),
    "chunk": ("WM_RASTER_CHUNK", ("512", "256", "1024")),
    "scan_sub": ("WM_RASTER_SCAN_SUB", ("128", "256", "512")),
    "mxu_sigma": ("WM_RASTER_MXU_SIGMA", ("0", "1")),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=4)
    ap.add_argument("--img", type=int, default=518)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--knob", default="group",
                    choices=sorted(KNOBS) + ["tile"])
    args = ap.parse_args()

    from hunyuanworld_mirror_tpu.models import (aggregator, camera_head, dpt,
                                                gaussians, worldmirror)
    from hunyuanworld_mirror_tpu.ops import rasterizer

    S, IMG, K = args.views, args.img, args.k
    cfg = worldmirror.WorldMirrorConfig(img_size=IMG, rasterizer_impl="pallas",
                                        gs_slot_fracs="auto")
    gcfg = cfg.gs_renderer
    params = worldmirror.init(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                          if x.dtype == jnp.float32 else x, params)
    imgs = jnp.ones((1, S, IMG, IMG, 3), jnp.float32) * 0.5
    B, _, H, W, _ = imgs.shape

    token_list = jax.tree.map(lambda x: x, jax.jit(
        lambda p, im: aggregator.forward(p, cfg.vgt, im)[0])(
            params["vgt"], imgs))
    start = cfg.vgt.patch_start_idx

    def heads_fn(p, toks, im):
        preds = {}
        cam_seq = camera_head.forward(p["cam_head"], cfg.cam_head, toks)
        preds["camera_params"] = cam_seq[-1]
        preds["depth"], preds["depth_conf"] = dpt.forward(
            p["depth_head"], cfg.depth_head, toks, im, start)
        gs_feat, preds["gs_depth"], preds["gs_depth_conf"] = dpt.forward(
            p["gs_head"], cfg.gs_head, toks, im, start)
        return preds, gs_feat

    preds, gs_feat = jax.jit(heads_fn)(params, token_list, imgs)
    preds = jax.tree.map(lambda x: x, dict(preds))

    def readback(x):
        return float(jnp.asarray(jax.tree.leaves(x)[0]).reshape(-1)[0])

    def time_once(fn, *a, iters=2, warmup=1):
        for _ in range(warmup):
            readback(fn(*a))
        t0 = time.perf_counter()
        for _ in range(iters):
            readback(fn(*a))
        return (time.perf_counter() - t0) / iters

    floor = time_once(jax.jit(lambda x: x + 1.0), jnp.ones((8, 128)), iters=4)

    def run_config(gc, label):
        rasterizer._rasterize_jit.clear_cache()

        def render_fn(p, gf, im, pr):
            return gaussians.render(p["gs_renderer"], gc, gs_feats=gf,
                                    images=im,
                                    predictions=dict(pr))["rendered_colors"]

        def rep(p, gf, im, pr):
            acc = 0.0
            out = None
            for i in range(K):
                out = render_fn(p, gf + acc + i * 1e-9, im, pr)
                acc = out.reshape(-1)[0] * 1e-12
            return out

        t = (time_once(jax.jit(rep), params, gs_feat, imgs, preds)
             - floor) / K
        one = np.asarray(jax.jit(render_fn)(params, gs_feat, imgs, preds))
        print(f"{label}: gs_render {1e3 * t:7.1f} ms", flush=True)
        return one

    ref = None
    if args.knob == "tile":
        for ts in (16, 8, 32):
            gc = dataclasses.replace(gcfg, tile_size=ts)
            one = run_config(gc, f"tile_size={ts}")
            if ref is None:
                ref = one
            else:
                print(f"  max |delta| vs first: "
                      f"{np.abs(one - ref).max():.2e}")
    else:
        env, vals = KNOBS[args.knob]
        for v in vals:
            os.environ[env] = v
            one = run_config(gcfg, f"{env}={v}")
            if ref is None:
                ref = one
            else:
                print(f"  max |delta| vs first: "
                      f"{np.abs(one - ref).max():.2e}")


if __name__ == "__main__":
    main()
