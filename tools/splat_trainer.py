"""Post-inference 3DGS optimization CLI.

Equivalent of the reference's gsplat example trainer
(submodules/gsplat/examples/simple_trainer_worldmirror.py:1383): takes either
  * an infer.py output directory (gaussians.ply + camera_params.json) plus
    the source images, or
  * a COLMAP dataset directory (--colmap: sparse/0 + images/, the reference
    Parser path, examples/datasets/colmap.py:56) with optional scene
    normalization and points3D splat init,
optimizes the splats photometrically (optional pose optimization, depth loss,
random background, opacity/scale regs), evaluates PSNR/SSIM on a held-out
split, and writes the refined gaussians.ply (+ optional trajectory video).

  python tools/splat_trainer.py <infer_out_dir> <images_dir> [--iters N]
  python tools/splat_trainer.py --colmap <colmap_dir> [--normalize]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def init_splats_from_points(points: np.ndarray, rgb: np.ndarray,
                            init_opacity: float = 0.1,
                            max_points: int = 500_000):
    """Reference create_splats_with_optimizers init (simple_trainer:239-320):
    means = COLMAP points, scales = log(mean 3-NN distance), opacity 0.1,
    SH dc from RGB."""
    from hunyuanworld_mirror_tpu.utils.sh import rgb_to_sh

    if len(points) > max_points:
        sel = np.random.default_rng(0).choice(len(points), max_points,
                                              replace=False)
        points, rgb = points[sel], rgb[sel]
    n = len(points)
    try:
        from scipy.spatial import cKDTree
        d, _ = cKDTree(points).query(points, k=4)
        nn = d[:, 1:].mean(axis=1)
    except Exception:
        nn = np.full((n,), 0.02)
    nn = np.clip(nn, 1e-6, None)
    return {
        "means": points.astype(np.float32),
        "scales": np.repeat(nn[:, None], 3, axis=1).astype(np.float32),
        "quats": np.tile(np.array([1.0, 0, 0, 0], np.float32), (n, 1)),
        "opacities": np.full((n,), init_opacity, np.float32),
        "sh": np.asarray(rgb_to_sh(rgb.astype(np.float32) / 255.0))[:, None, :],
    }


def load_infer_dir(result_dir: str, images_dir: str, size: int):
    from hunyuanworld_mirror_tpu.io import images as io_images
    from hunyuanworld_mirror_tpu.io import ply as io_ply

    gs = io_ply.read_ply(os.path.join(result_dir, "gaussians.ply"))
    n = len(gs["x"])
    splats = {
        "means": np.stack([gs["x"], gs["y"], gs["z"]], -1).astype(np.float32),
        "scales": np.exp(np.stack([gs[f"scale_{i}"] for i in range(3)], -1)).astype(np.float32),
        "quats": np.stack([gs[f"rot_{i}"] for i in range(4)], -1).astype(np.float32),
        "opacities": (1 / (1 + np.exp(-np.asarray(gs["opacity"])))).astype(np.float32),
        "sh": np.stack([gs[f"f_dc_{i}"] for i in range(3)], -1)[:, None, :].astype(np.float32),
    }
    print(f"loaded {n} splats from {result_dir}/gaussians.ply")

    with open(os.path.join(result_dir, "camera_params.json")) as f:
        cams = json.load(f)
    c2w = np.asarray([c["matrix"] for c in cams["extrinsics"]], np.float32)
    Ks = np.asarray([c["matrix"] for c in cams["intrinsics"]], np.float32)

    imgs = io_images.load_inputs(images_dir, target_size=size)[0]
    assert len(imgs) == len(c2w), f"{len(imgs)} images vs {len(c2w)} cameras"

    # per-view depth maps written by infer.py (depth_%03d.npy) enable the
    # disparity depth loss (reference :202 — sparse there, dense here)
    depths = None
    import glob
    dps = sorted(glob.glob(os.path.join(result_dir, "depth_*.npy")))
    if len(dps) == len(imgs):
        d = np.stack([np.load(p) for p in dps])
        if d.shape[:3] == imgs.shape[:3]:
            depths = d
    return splats, imgs, c2w, Ks, depths


def load_colmap_dir(colmap_dir: str, size: int, normalize: bool,
                    result_dir=None):
    from hunyuanworld_mirror_tpu.training import colmap_dataset as cds
    from hunyuanworld_mirror_tpu.io import ply as io_ply

    scene = cds.parse_colmap(colmap_dir, normalize=normalize)
    imgs, Ks = cds.load_scene_arrays(scene, target_size=size)
    print(f"COLMAP scene: {len(imgs)} images, {len(scene.points)} points, "
          f"scene_scale {scene.scene_scale:.3f}")

    ply_path = os.path.join(result_dir or colmap_dir, "gaussians.ply")
    if os.path.exists(ply_path):
        gs = io_ply.read_ply(ply_path)
        splats = {
            "means": np.stack([gs["x"], gs["y"], gs["z"]], -1).astype(np.float32),
            "scales": np.exp(np.stack([gs[f"scale_{i}"] for i in range(3)], -1)).astype(np.float32),
            "quats": np.stack([gs[f"rot_{i}"] for i in range(4)], -1).astype(np.float32),
            "opacities": (1 / (1 + np.exp(-np.asarray(gs["opacity"])))).astype(np.float32),
            "sh": np.stack([gs[f"f_dc_{i}"] for i in range(3)], -1)[:, None, :].astype(np.float32),
        }
        if normalize:
            T = scene.transform
            s = float(np.cbrt(max(np.linalg.det(T[:3, :3]), 1e-12)))
            splats["means"] = cds.transform_points(T, splats["means"])
            splats["scales"] = splats["scales"] * s
        print(f"init from {ply_path}: {len(splats['means'])} splats")
    else:
        assert len(scene.points), "no points3D.bin and no gaussians.ply"
        splats = init_splats_from_points(scene.points, scene.points_rgb)
        print(f"init from COLMAP points: {len(splats['means'])} splats")
    return splats, imgs, scene.c2w, Ks, None


def main():
    p = argparse.ArgumentParser()
    p.add_argument("result_dir", nargs="?", help="infer.py output dir")
    p.add_argument("images_dir", nargs="?", help="source images dir")
    p.add_argument("--colmap", help="COLMAP dataset dir (sparse/0 + images/)")
    p.add_argument("--normalize", action="store_true",
                   help="COLMAP scene normalization (reference normalize.py)")
    p.add_argument("--iters", type=int, default=1000)
    p.add_argument("--size", type=int, default=518)
    p.add_argument("--rasterizer", choices=["jax", "pallas"], default="pallas")
    p.add_argument("--video", action="store_true",
                   help="render an interpolated-trajectory video after opt "
                        "(reference render_traj, simple_trainer:1094)")
    p.add_argument("--max-per-tile", type=int, default=4096,
                   help="per-tile splat cap (lower on CPU: XLA's grad compile "
                        "time grows superlinearly with it there)")
    p.add_argument("--strategy", choices=["default", "mcmc"], default="default",
                   help="densification: gsplat DefaultStrategy or MCMC "
                        "(teleport + growth + position noise)")
    p.add_argument("--selective-adam", action="store_true",
                   help="visibility-masked Adam (gsplat SelectiveAdam)")
    p.add_argument("--gs2d", action="store_true",
                   help="optimize as 2D Gaussian surfels (ops/gs2d.py) "
                        "instead of 3DGS")
    p.add_argument("--pose-opt", action="store_true",
                   help="optimize per-camera SE3 deltas (reference :177-183)")
    p.add_argument("--depth-loss", action="store_true",
                   help="disparity-space depth supervision (reference :202)")
    p.add_argument("--depth-lambda", type=float, default=1e-2)
    p.add_argument("--random-bkgd", action="store_true",
                   help="random background compositing (reference :143)")
    p.add_argument("--opacity-reg", type=float, default=0.0)
    p.add_argument("--scale-reg", type=float, default=0.0)
    p.add_argument("--bilateral-grid", action="store_true",
                   help="per-view bilateral-grid appearance compensation "
                        "(reference lib_bilagrid.py, :196-199)")
    p.add_argument("--tb", metavar="LOGDIR",
                   help="write TensorBoard events (loss/num_GS scalars + "
                        "render-vs-GT images, reference tb_every/"
                        "tb_save_image)")
    p.add_argument("--test-every", type=int, default=0,
                   help="hold out every Nth view for PSNR/SSIM eval "
                        "(reference eval loop :1005); 0 trains on all")
    p.add_argument("--eval-every", type=int, default=0,
                   help="in-loop eval cadence on the held-out split "
                        "(reference eval_steps :1005); needs --test-every")
    p.add_argument("--compress", action="store_true",
                   help="PNG-compress the optimized splats as a final "
                        "pipeline stage (io/compression.py, reference "
                        "compression step :1293-1300)")
    p.add_argument("--viewer", action="store_true",
                   help="serve a live in-training WebGL viewer "
                        "(training/live_viewer.py, reference viser loop "
                        ":1310-1334)")
    p.add_argument("--viewer-port", type=int, default=0)
    args = p.parse_args()

    from hunyuanworld_mirror_tpu.io import ply as io_ply
    from hunyuanworld_mirror_tpu.io import render as render_lib
    from hunyuanworld_mirror_tpu.training import splat_opt

    if args.colmap:
        out_dir = args.result_dir or args.colmap
        splats, imgs, c2w, Ks, depths = load_colmap_dir(
            args.colmap, args.size, args.normalize, args.result_dir)
    else:
        assert args.result_dir and args.images_dir, \
            "need <infer_out_dir> <images_dir> or --colmap <dir>"
        out_dir = args.result_dir
        splats, imgs, c2w, Ks, depths = load_infer_dir(
            args.result_dir, args.images_dir, args.size)

    # train/test split (reference colmap.py Dataset: every Nth view to test)
    S = len(imgs)
    idx = np.arange(S)
    if args.test_every > 0 and S > args.test_every:
        test_idx = idx[idx % args.test_every == 0]
        train_idx = idx[idx % args.test_every != 0]
    else:
        train_idx, test_idx = idx, np.empty((0,), np.int64)

    cfg = splat_opt.SplatOptConfig(iters=args.iters,
                                   rasterizer_impl=args.rasterizer,
                                   max_per_tile=args.max_per_tile,
                                   strategy=args.strategy,
                                   use_selective_adam=args.selective_adam,
                                   mode="2dgs" if args.gs2d else "3dgs",
                                   pose_opt=args.pose_opt,
                                   depth_loss=args.depth_loss and depths is not None,
                                   depth_lambda=args.depth_lambda,
                                   random_bkgd=args.random_bkgd,
                                   opacity_reg=args.opacity_reg,
                                   scale_reg=args.scale_reg,
                                   use_bilateral_grid=args.bilateral_grid,
                                   tb_save_image=bool(args.tb),
                                   eval_every=args.eval_every)
    viewer = None
    if args.viewer:
        from hunyuanworld_mirror_tpu.training.live_viewer import LiveViewer
        viewer = LiveViewer(os.path.join(out_dir, "live"),
                            port=args.viewer_port)
        print(f"live viewer: {viewer.url}")
    eval_data = ((imgs[test_idx], c2w[test_idx], Ks[test_idx])
                 if (args.eval_every > 0 and len(test_idx)) else None)
    out = splat_opt.optimize_splats(
        splats, imgs[train_idx], c2w[train_idx], Ks[train_idx], cfg,
        depths=depths[train_idx] if depths is not None else None,
        tb_logdir=args.tb, eval_data=eval_data, viewer=viewer)
    print(f"optimized: {len(out['means'])} splats alive")
    if viewer is not None:
        viewer.close()

    # held-out eval (reference simple_trainer:1005)
    if len(test_idx):
        from hunyuanworld_mirror_tpu.utils.metrics import nvs_metrics
        frames, _ = render_lib.render_trajectory(
            out, c2w[test_idx], Ks[test_idx],
            imgs.shape[2], imgs.shape[1], impl=args.rasterizer)
        m = nvs_metrics(np.clip(frames[..., :3], 0, 1), imgs[test_idx])
        print(f"eval on {len(test_idx)} held-out views: "
              f"PSNR {m['psnr']:.2f} SSIM {m['ssim']:.4f}")

    op = np.clip(out["opacities"], 1e-6, 1 - 1e-6)
    io_ply.save_gs_ply(os.path.join(out_dir, "gaussians_opt.ply"),
                       out["means"], out["scales"], out["quats"],
                       out["sh"][:, 0], np.log(op / (1 - op)),
                       scale_percentile=1.0)
    print(f"wrote {out_dir}/gaussians_opt.ply")
    if "c2w_opt" in out:
        np.savez(os.path.join(out_dir, "cameras_opt.npz"),
                 c2w=out["c2w_opt"], Ks=Ks[train_idx])
        print(f"wrote {out_dir}/cameras_opt.npz (pose-optimized cameras)")

    if args.compress:
        # final compression stage (reference :1293-1300 runs PNG compression
        # after training); pre-activation values compress best
        from hunyuanworld_mirror_tpu.io import compression
        cdir = os.path.join(out_dir, "compressed")
        meta = compression.compress(cdir, {
            "means": out["means"],
            "scales": np.log(np.maximum(out["scales"], 1e-12)),
            "quats": out["quats"],
            "opacities": np.log(op / (1 - op)),
            "sh": out["sh"]})
        sz = sum(os.path.getsize(os.path.join(cdir, f))
                 for f in os.listdir(cdir))
        print(f"wrote {cdir}: {meta['count']} splats, {sz / 1e6:.2f} MB")

    if args.video:
        H, W = imgs.shape[1:3]
        traj, traj_K = render_lib.interpolate_trajectory(c2w, Ks)
        frames, _ = render_lib.render_trajectory(out, traj, traj_K, W, H,
                                                 impl=args.rasterizer)
        vp = render_lib.save_video(os.path.join(out_dir, "optimized.mp4"), frames)
        print(f"wrote {vp}")


if __name__ == "__main__":
    main()
