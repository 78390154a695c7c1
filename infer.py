"""WorldMirror-TPU inference CLI.

Parity target: reference infer.py:62-360 — load images/video, run the
feed-forward reconstruction, and export: point-map PLY, per-view depth
(PNG + NPY), normal PNGs, 3D Gaussian PLY (+ .splat), camera params JSON and
a COLMAP sparse model.

Weights: --ckpt loads an orbax/npz checkpoint produced by this framework (or
converted from the reference HF safetensors via tools/convert_weights.py);
without it the model runs randomly initialized (layout/IO testing only — this
container has no network egress to fetch the HF release).
"""

import argparse
import os
import time
from pathlib import Path

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="WorldMirror TPU inference")
    p.add_argument("input_path", help="image directory or video file")
    p.add_argument("-o", "--output", default="outputs", help="output dir")
    p.add_argument("--ckpt", default=None, help="checkpoint path (npz/orbax)")
    p.add_argument("--fps", type=float, default=1.0, help="video sampling fps")
    p.add_argument("--size", type=int, default=518)
    p.add_argument("--mode", choices=["crop", "pad"], default="crop")
    p.add_argument("--cond", default="0,0,0",
                   help="cond flags pose,depth,rays e.g. 1,0,1")
    p.add_argument("--no-gs", action="store_true", help="skip gaussian head")
    p.add_argument("--preset", choices=["large", "base", "small", "tiny"],
                   default="large",
                   help="model size preset (large = flagship ViT-L trunk)")
    p.add_argument("--conf-percent", type=float, default=20.0,
                   help="drop bottom X%% confidence points in the point PLY")
    p.add_argument("--rasterizer", choices=["jax", "pallas"], default="pallas")
    p.add_argument("--fast-binning", action="store_true",
                   help="coverage-scheduled isect binning (pallas path): "
                        "faster render, may drop intersections on scenes "
                        "heavier than the 518px calibration")
    p.add_argument("--video", action="store_true",
                   help="render a slerp-interpolated novel-view video")
    p.add_argument("--ba", action="store_true",
                   help="refine predicted cameras with Schur-complement "
                        "bundle adjustment (refine/ba.py)")
    p.add_argument("--ba-iters", type=int, default=12)
    p.add_argument("--glb", action="store_true",
                   help="export a GLB scene (point cloud + camera frusta)")
    p.add_argument("--glb-mesh", action="store_true",
                   help="GLB as a triangulated pointmap mesh instead of points")
    p.add_argument("--mask-sky", action="store_true",
                   help="drop sky pixels from GLB/PLY exports")
    p.add_argument("--effect", choices=["twister", "rain", "spread"],
                   default=None, help="animated splat effect for --video")
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp

    from hunyuanworld_mirror_tpu.io import images as io_images
    from hunyuanworld_mirror_tpu.io import ply as io_ply
    from hunyuanworld_mirror_tpu.io import colmap as io_colmap
    from hunyuanworld_mirror_tpu.models import worldmirror
    from hunyuanworld_mirror_tpu.training import checkpoint as ckpt_lib
    from hunyuanworld_mirror_tpu.utils import geometry

    out_dir = Path(args.output)
    out_dir.mkdir(parents=True, exist_ok=True)

    print(f"Loading inputs from {args.input_path} ...")
    imgs = io_images.load_inputs(args.input_path, fps=args.fps,
                                 target_size=args.size, strategy=args.mode)
    B, S, H, W, _ = imgs.shape
    print(f"  {S} views at {H}x{W}")

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
        img_size=args.size, enable_gs=not args.no_gs,
        rasterizer_impl=args.rasterizer,
        gs_slot_fracs="auto" if args.fast_binning else None,
        **presets[args.preset])
    if args.ckpt:
        print(f"Loading checkpoint {args.ckpt} ...")
        params = ckpt_lib.load_params(args.ckpt)
    else:
        print("WARNING: no --ckpt given; using random weights (IO test mode)")
        params = worldmirror.init(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params)

    cond_flags = tuple(int(x) for x in args.cond.split(","))
    fwd = jax.jit(lambda p, v: worldmirror.forward(p, cfg, v,
                                                   cond_flags=cond_flags))
    print("Running model ...")
    t0 = time.time()
    preds = fwd(params, {"img": jnp.asarray(imgs)})
    preds = jax.tree.map(np.asarray, preds)
    print(f"  forward done in {time.time() - t0:.1f}s")

    if args.ba:
        from hunyuanworld_mirror_tpu.refine import ba as ba_lib
        t0 = time.time()
        refined = jax.jit(
            lambda p: ba_lib.refine_cameras(p, iters=args.ba_iters),
            static_argnames=())(
            {k: jnp.asarray(preds[k]) for k in
             ("pts3d", "pts3d_conf", "depth", "camera_poses", "camera_intrs")})
        preds["camera_poses"] = np.asarray(refined["camera_poses"])
        print(f"  BA refinement: cost {float(refined['ba_cost0']):.3e} -> "
              f"{float(refined['ba_cost']):.3e} in {time.time() - t0:.1f}s")

    # ---- exports (mirror reference infer.py:196-360) ----
    pts = preds["pts3d"][0].reshape(-1, 3)
    conf = preds["pts3d_conf"][0].reshape(-1)
    colors = imgs[0].reshape(-1, 3)
    thresh = np.percentile(conf, args.conf_percent)
    io_ply.save_points_ply(out_dir / "points.ply", pts, colors, conf >= thresh)
    print(f"  wrote points.ply ({int((conf >= thresh).sum())} pts)")

    for s in range(S):
        io_ply.save_depth_png(out_dir / f"depth_{s:03d}.png", preds["depth"][0, s, ..., 0])
        io_ply.save_depth_npy(out_dir / f"depth_{s:03d}.npy", preds["depth"][0, s, ..., 0])
        if "normals" in preds:
            io_ply.save_normal_png(out_dir / f"normal_{s:03d}.png", preds["normals"][0, s])
    print(f"  wrote per-view depth/normal maps")

    c2w = preds["camera_poses"][0]
    K = preds["camera_intrs"][0]
    io_ply.save_camera_params(c2w, K, out_dir)

    if "splats" in preds:
        sp = preds["splats"]
        nd = int(np.asarray(sp.get("n_compact_dropped", 0)).max())
        if nd > 0:
            print(f"  WARNING: static compaction cap dropped {nd} live "
                  f"low-weight splats; raise gs config max_gaussians / "
                  f"compact_fraction (or set gs_compact=False) for dense "
                  f"scenes")
        alive = sp["opacities"][0] > 1e-4
        op = np.clip(sp["opacities"][0], 1e-6, 1 - 1e-6)
        io_ply.save_gs_ply(
            out_dir / "gaussians.ply",
            sp["means"][0][alive], sp["scales"][0][alive],
            sp["quats"][0][alive], sp["sh"][0][:, 0][alive],
            np.log(op / (1 - op))[alive])
        io_ply.gs_ply_to_splat(out_dir / "gaussians.ply", out_dir / "gaussians.splat")
        print(f"  wrote gaussians.ply/.splat ({int(alive.sum())} splats)")

    if args.glb:
        from hunyuanworld_mirror_tpu.io import scene as scene_lib
        gp = scene_lib.predictions_to_glb(
            {**preds, "images": imgs}, str(out_dir / "scene.glb"),
            conf_percent=args.conf_percent, mask_sky=args.mask_sky,
            as_mesh=args.glb_mesh)
        print(f"  wrote GLB scene -> {gp}")

    if args.video and "splats" in preds:
        from hunyuanworld_mirror_tpu.io import render as render_lib
        vp = render_lib.render_interpolated_video(
            preds, W, H, str(out_dir / "rendered.mp4"),
            impl=args.rasterizer, effect=args.effect)
        print(f"  wrote novel-view video -> {vp}")

    # COLMAP export: depth-unprojected points at subsampled pixels
    w2c = np.linalg.inv(c2w)
    stride = 4
    pix = np.asarray(geometry.create_pixel_coordinate_grid(S, H, W))[:, ::stride, ::stride]
    pts_frames = preds["pts3d"][0][:, ::stride, ::stride].reshape(-1, 3)
    pix_flat = pix.reshape(-1, 3)
    col_flat = (imgs[0][:, ::stride, ::stride].reshape(-1, 3) * 255).astype(np.uint8)
    conf_flat = preds["pts3d_conf"][0][:, ::stride, ::stride].reshape(-1)
    keep = conf_flat >= np.percentile(conf_flat, args.conf_percent)
    io_colmap.export_reconstruction(
        str(out_dir / "sparse"), pts_frames[keep], pix_flat[keep], col_flat[keep],
        w2c, K, (W, H))
    print(f"  wrote COLMAP sparse model -> {out_dir / 'sparse'}")
    print("Done.")


if __name__ == "__main__":
    main()
