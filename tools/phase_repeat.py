"""Honest per-phase timing: K repeats INSIDE one jit, one readback, divide.

Round-3 floor measurement (tools/floor probe, v5e via axon relay): a trivial
jitted op + host readback costs 40-56 ms — every per-call micro-benchmark at
the tens-of-ms scale mostly measured dispatch+readback, not compute (8x full
2.15M-row sorts inside one jit: 48 ms total). This harness chains K copies of
a stage inside a lax-unrolled loop with data-dependent perturbation (defeats
CSE and dead-code elimination), reads back once, and reports
(t_K - t_floor) / K.

Usage: python tools/phase_repeat.py [--views 4] [--img 518] [--k 8]
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


def time_once(fn, *args, iters=2, warmup=1):
    for _ in range(warmup):
        readback(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        readback(fn(*args))
    return (time.perf_counter() - t0) / iters


def repeat_jit(stage_fn, perturb_fn, k: int):
    """jit(lambda *a: chain of k stage calls, each fed a perturbed input)."""
    def chained(*args):
        acc = 0.0
        for i in range(k):
            out = stage_fn(*perturb_fn(args, acc, i))
            leaf = jax.tree.leaves(out)[0]
            acc = acc + jnp.sum(leaf[(0,) * leaf.ndim]) * 1e-20
        return acc
    return jax.jit(chained)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=4)
    ap.add_argument("--img", type=int, default=518)
    ap.add_argument("--k", type=int, default=8)
    args = ap.parse_args()
    K = args.k

    from hunyuanworld_mirror_tpu.models import (aggregator, camera_head,
                                                dinov2, dpt, gaussians,
                                                worldmirror)
    from hunyuanworld_mirror_tpu.ops import rasterizer
    from hunyuanworld_mirror_tpu.utils import camera as cam_utils

    S, img = args.views, args.img
    cfg = worldmirror.WorldMirrorConfig(img_size=img, rasterizer_impl="pallas")
    params = worldmirror.init(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params)
    views = {"img": jnp.ones((1, S, img, img, 3), jnp.float32) * 0.5}
    imgs = views["img"]
    B, _, H, W, _ = imgs.shape
    gcfg = cfg.gs_renderer

    # floor: trivial op
    floor = time_once(jax.jit(lambda x: x + 1.0), jnp.ones((8, 128)))
    print(f"floor (trivial+readback): {1e3*floor:7.1f} ms", flush=True)

    def perturb_img(args_, acc, i):
        return (args_[0], args_[1] + acc + i * 1e-9) + args_[2:]

    results = {}

    # e2e forward
    fwd = jax.jit(lambda p, v: worldmirror.forward(p, cfg, v, render=True))
    results["e2e_render"] = time_once(fwd, params, views) - floor

    fwd_nr = jax.jit(lambda p, v: worldmirror.forward(p, cfg, v, render=False))
    results["e2e_norender"] = time_once(fwd_nr, params, views) - floor

    # encoder xK
    flat = imgs.reshape(B * S, H, W, 3)
    enc = repeat_jit(
        lambda p, im: dinov2.forward_features(p, cfg.vgt.vit_config, im,
                                              dtype=jnp.bfloat16),
        perturb_img, K)
    results["encoder"] = (time_once(enc, params["vgt"]["patch_embed"], flat)
                          - floor) / K

    # full trunk (encoder + 24x2 blocks) xK -> trunk = full - encoder
    agg = repeat_jit(lambda p, im: aggregator.forward(p, cfg.vgt, im)[0],
                     perturb_img, K)
    t_full = (time_once(agg, params["vgt"], imgs) - floor) / K
    results["trunk"] = t_full - results["encoder"]

    token_list = jax.jit(lambda p, im: aggregator.forward(p, cfg.vgt, im)[0])(
        params["vgt"], imgs)
    token_list = jax.tree.map(lambda x: x, token_list)
    start = cfg.vgt.patch_start_idx

    def heads_fn(p, toks, im):
        preds = {}
        cam_seq = camera_head.forward(p["cam_head"], cfg.cam_head, toks)
        preds["camera_params"] = cam_seq[-1]
        preds["depth"], preds["depth_conf"] = dpt.forward(
            p["depth_head"], cfg.depth_head, toks, im, start)
        preds["pts3d"], _ = dpt.forward(p["pts_head"], cfg.pts_head, toks, im,
                                        start)
        preds["normals"], _ = dpt.forward(p["norm_head"], cfg.norm_head, toks,
                                          im, start)
        gs_feat, preds["gs_depth"], preds["gs_depth_conf"] = dpt.forward(
            p["gs_head"], cfg.gs_head, toks, im, start)
        return preds, gs_feat

    def perturb_tokens(args_, acc, i):
        p, toks, im = args_
        toks2 = [(a + acc + i * 1e-9, b) for a, b in toks] \
            if isinstance(toks[0], tuple) else \
            jax.tree.map(lambda x: x + acc + i * 1e-9, toks)
        return (p, toks2, im)

    heads = repeat_jit(heads_fn, perturb_tokens, K)
    results["heads"] = (time_once(heads, params, token_list, imgs) - floor) / K

    preds, gs_feat = jax.jit(heads_fn)(params, token_list, imgs)
    preds = jax.tree.map(lambda x: x, dict(preds))

    # gs render xK (head conv + prepare + prune + compact + rasterize)
    def render_fn(p, gf, im, pr):
        return gaussians.render(p["gs_renderer"], gcfg, gf, im,
                                dict(pr))["rendered_colors"]

    def perturb_gf(args_, acc, i):
        p, gf, im, pr = args_
        return (p, gf + acc + i * 1e-9, im, pr)

    rend = repeat_jit(render_fn, perturb_gf, max(2, K // 2))
    results["gs_render"] = (time_once(rend, params, gs_feat, imgs, preds)
                            - floor) / max(2, K // 2)

    # rasterize-only xK: per-camera vs camera-batched
    a = jax.jit(lambda p, gf, im, pr: gaussians.render(
        p["gs_renderer"], gcfg, gf, im, dict(pr)))(params, gs_feat, imgs, preds)
    splats = jax.tree.map(lambda x: x, a["splats"])
    ext, intr = cam_utils.vector_to_camera_matrices(
        preds["camera_params"].reshape(B * S, 9), (H, W))
    w2c = cam_utils.to_homogeneous(ext).reshape(S, 4, 4)
    Ks = intr.reshape(S, 3, 3)

    def raster_fn(batch):
        def fn(s, vm, Kk):
            colors, _, _ = rasterizer.rasterize(
                s["means"][0], s["quats"][0], s["scales"][0],
                s["opacities"][0], s["sh"][0], vm, Kk, W, H,
                render_mode="RGB+ED", max_per_tile=gcfg.max_per_tile,
                max_tiles_per_gauss=gcfg.max_tiles_per_gauss, impl="pallas",
                quat_order="wxyz", camera_batch=batch)
            return colors
        return fn

    def perturb_splats(args_, acc, i):
        s, vm, Kk = args_
        return ({**s, "means": s["means"] + acc + i * 1e-9}, vm, Kk)

    kk = max(2, K // 2)
    rc = repeat_jit(raster_fn(False), perturb_splats, kk)
    results["rasterize_percam"] = (time_once(rc, splats, w2c, Ks) - floor) / kk
    rb = repeat_jit(raster_fn(True), perturb_splats, kk)
    results["rasterize_batched"] = (time_once(rb, splats, w2c, Ks) - floor) / kk

    for k, v in results.items():
        print(f"{k:18s}: {1e3*v:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
