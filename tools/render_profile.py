"""Per-stage profile of the GS render phase on the real chip.

The bench phase breakdown shows gs_render as the largest phase (225 ms of a
578 ms phase-sum at S=4/518px on v5e); this tool splits it into
head-conv+prepare / voxel-prune / compact / projection / binning / kernel so
optimization effort lands where the time is.

Usage: python tools/render_profile.py [--views 4] [--img 518] [--iters 3]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax import lax


def readback(tree):
    leaf = jax.tree.leaves(tree)[0]
    return float(jnp.asarray(leaf).reshape(-1)[0])


def timeit(fn, *args, iters=3, warmup=1):
    for _ in range(warmup):
        readback(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        readback(fn(*args))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=4)
    ap.add_argument("--img", type=int, default=518)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    from hunyuanworld_mirror_tpu.models import (aggregator, camera_head, dpt,
                                                gaussians, worldmirror)
    from hunyuanworld_mirror_tpu.ops import projection, rasterizer, tiles
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

    # run trunk + heads once to get real gs inputs
    agg = jax.jit(lambda p, im: aggregator.forward(p, cfg.vgt, im)[0])
    token_list = jax.tree.map(lambda x: x, agg(params["vgt"], imgs))
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
    gp = params["gs_renderer"]

    # stage A: head conv + prepare_splats
    def stage_a(p, gf, im, pr):
        raw = gaussians._gs_head_apply(p, gf.reshape(B * S, H, W, -1))
        return gaussians.prepare_splats(gcfg, raw, im, dict(pr))
    a = jax.jit(stage_a)
    t_a = timeit(a, gp, gs_feat, imgs, preds, iters=args.iters)
    splats = jax.tree.map(lambda x: x, a(gp, gs_feat, imgs, preds))
    keep = ("means", "quats", "scales", "opacities", "sh", "weights")
    feats = {k: splats[k] for k in keep}

    # stage B: voxel prune
    b = jax.jit(lambda s: gaussians.voxel_prune(gcfg, s))
    t_b = timeit(b, feats, iters=args.iters)
    pruned = jax.tree.map(lambda x: x, b(feats))

    # stage C: compact
    c = jax.jit(lambda s: gaussians.compact_splats(gcfg, s))
    t_c = timeit(c, pruned, iters=args.iters)
    comp = jax.tree.map(lambda x: x, c(pruned))
    comp.pop("n_compact_dropped", None)
    n = comp["means"].shape[1]
    print(f"splat count after compact: {n}")

    ext, intr = cam_utils.vector_to_camera_matrices(
        preds["camera_params"].reshape(B * S, 9), (H, W))
    w2c = cam_utils.to_homogeneous(ext).reshape(S, 4, 4)
    Ks = intr.reshape(S, 3, 3)

    # stage D: full rasterize, all cameras
    def stage_d(s, vm, K):
        colors, alpha, _ = rasterizer.rasterize(
            s["means"][0], s["quats"][0], s["scales"][0], s["opacities"][0],
            s["sh"][0], lax.stop_gradient(vm), lax.stop_gradient(K),
            W, H, render_mode="RGB+ED", max_per_tile=gcfg.max_per_tile,
            max_tiles_per_gauss=gcfg.max_tiles_per_gauss, impl="pallas",
            quat_order="wxyz")
        return colors
    d = jax.jit(stage_d)
    t_d = timeit(d, comp, w2c, Ks, iters=args.iters)

    # stage D1: projection only (all cameras via lax.map like rasterize)
    quats_x = comp["quats"][0][..., jnp.array([1, 2, 3, 0])]

    def stage_p(s, vm, K):
        covars = projection.quat_scale_to_covar_planes(quats_x, s["scales"][0])
        def per_cam(a):
            viewmat, Kk = a
            pr = projection.fully_fused_projection(
                s["means"][0], covars, viewmat[None], Kk[None], W, H)
            return pr.means2d[0], pr.conics[0], pr.depths[0], pr.radii[0]
        return lax.map(per_cam, (vm, K))
    p_j = jax.jit(stage_p)
    t_p = timeit(p_j, comp, w2c, Ks, iters=args.iters)
    m2d, con, dep, rad = jax.tree.map(lambda x: x, p_j(comp, w2c, Ks))

    # stage D2: binning only (packed flat list, all cameras)
    tile_size = 16
    tw = (W + tile_size - 1) // tile_size
    th = (H + tile_size - 1) // tile_size
    n_pairs = n * gcfg.max_tiles_per_gauss
    mpt = min(gcfg.max_per_tile, -(-n_pairs // 512) * 512)
    op0 = comp["opacities"][0]
    col = jnp.concatenate(
        [jnp.clip(comp["sh"][0][:, 0] + 0.5, 0.0, None),
         jnp.zeros((n, 1))], -1)

    # inputs passed as jit ARGUMENTS (not closure constants) so XLA cannot
    # constant-fold the whole binning at compile time (advisor finding r2)
    def stage_bin(m2d_i, rad_i, dep_i, op0_i, col_i):
        vals = ((m2d_i[:, 0], m2d_i[:, 1], con[0][:, 0], con[0][:, 1],
                 con[0][:, 2], op0_i) + tuple(col_i[:, j] for j in range(4)))
        fl = tiles.bin_gaussians_packed(
            m2d_i, rad_i, dep_i, vals, tile_size, tw, th,
            gcfg.max_tiles_per_gauss, mpt)
        return fl.packed

    bin_all = jax.jit(lambda m2d_, rad_, dep_, op0_, col_: [
        stage_bin(m2d_[i], rad_[i], dep_[i], op0_, col_) for i in range(S)])
    t_bin = timeit(bin_all, m2d, rad, dep, op0, col, iters=args.iters)

    # stage D-multi: camera-batched rasterize (one sort + one kernel launch)
    def stage_dm(s, vm, K):
        colors, alpha, _ = rasterizer.rasterize(
            s["means"][0], s["quats"][0], s["scales"][0], s["opacities"][0],
            s["sh"][0], lax.stop_gradient(vm), lax.stop_gradient(K),
            W, H, render_mode="RGB+ED", max_per_tile=gcfg.max_per_tile,
            max_tiles_per_gauss=gcfg.max_tiles_per_gauss, impl="pallas",
            quat_order="wxyz", camera_batch=True)
        return colors
    dm = jax.jit(stage_dm)
    t_dm = timeit(dm, comp, w2c, Ks, iters=args.iters)
    # parity spot check vs the per-camera path
    import numpy as np
    delta = float(jnp.max(jnp.abs(dm(comp, w2c, Ks)[..., :3]
                                  - d(comp, w2c, Ks)[..., :3])))

    print(f"A head+prepare : {1e3*t_a:8.1f} ms", flush=True)
    print(f"B voxel_prune  : {1e3*t_b:8.1f} ms", flush=True)
    print(f"C compact      : {1e3*t_c:8.1f} ms", flush=True)
    print(f"D rasterize(pl): {1e3*t_d:8.1f} ms   ({S} cams, per-camera)", flush=True)
    print(f"  D1 projection: {1e3*t_p:8.1f} ms", flush=True)
    print(f"  D2 binning   : {1e3*t_bin:8.1f} ms", flush=True)
    print(f"Dm cam-batched : {1e3*t_dm:8.1f} ms   (max |rgb delta| {delta:.2e})",
          flush=True)
    print(f"sum A+B+C+Dm   : {1e3*(t_a+t_b+t_c+t_dm):8.1f} ms", flush=True)

    # heads compute-dtype A/B: reference runs its DPT heads fp32
    # (worldmirror.py:146 autocast off); measure what bf16 conv compute
    # would buy and what it costs in output delta.
    import dataclasses
    import numpy as np

    def heads_t(dtype):
        cfgs = {k: dataclasses.replace(getattr(cfg, k), compute_dtype=dtype)
                for k in ("depth_head", "pts_head", "norm_head", "gs_head")}

        def fn(p, toks, im):
            o = {}
            o["depth"], _ = dpt.forward(p["depth_head"], cfgs["depth_head"],
                                        toks, im, start)
            o["pts3d"], _ = dpt.forward(p["pts_head"], cfgs["pts_head"],
                                        toks, im, start)
            o["normals"], _ = dpt.forward(p["norm_head"], cfgs["norm_head"],
                                          toks, im, start)
            _, o["gs_depth"], _ = dpt.forward(p["gs_head"], cfgs["gs_head"],
                                              toks, im, start)
            return o
        j = jax.jit(fn)
        t = timeit(j, params, token_list, imgs, iters=args.iters)
        return t, jax.tree.map(np.asarray, j(params, token_list, imgs))

    t32, o32 = heads_t("float32")
    t16, o16 = heads_t("bfloat16")
    print(f"heads fp32     : {1e3*t32:8.1f} ms", flush=True)
    print(f"heads bf16     : {1e3*t16:8.1f} ms", flush=True)
    for k in o32:
        d32, d16 = o32[k], o16[k]
        rel = np.max(np.abs(d16 - d32) / (np.abs(d32) + 1e-3))
        print(f"  {k:10s} max rel delta {rel:.2e}", flush=True)


if __name__ == "__main__":
    main()
