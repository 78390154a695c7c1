"""Post-inference 3DGS optimization CLI.

Equivalent of the reference's gsplat example trainer
(submodules/gsplat/examples/simple_trainer_worldmirror.py:1383): takes an
infer.py output directory (gaussians.ply + camera_params.json) plus the
source images, optimizes the splats photometrically, and writes the refined
gaussians.ply (+ optional turntable video).

  python tools/splat_trainer.py <infer_out_dir> <images_dir> [--iters N]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("result_dir", help="infer.py output dir")
    p.add_argument("images_dir", help="source images dir")
    p.add_argument("--iters", type=int, default=1000)
    p.add_argument("--size", type=int, default=518)
    p.add_argument("--rasterizer", choices=["jax", "pallas"], default="pallas")
    p.add_argument("--video", action="store_true")
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
    args = p.parse_args()

    from hunyuanworld_mirror_tpu.io import images as io_images
    from hunyuanworld_mirror_tpu.io import ply as io_ply
    from hunyuanworld_mirror_tpu.io import render as render_lib
    from hunyuanworld_mirror_tpu.training import splat_opt

    gs = io_ply.read_ply(os.path.join(args.result_dir, "gaussians.ply"))
    n = len(gs["x"])
    splats = {
        "means": np.stack([gs["x"], gs["y"], gs["z"]], -1).astype(np.float32),
        "scales": np.exp(np.stack([gs[f"scale_{i}"] for i in range(3)], -1)).astype(np.float32),
        "quats": np.stack([gs[f"rot_{i}"] for i in range(4)], -1).astype(np.float32),
        "opacities": (1 / (1 + np.exp(-np.asarray(gs["opacity"])))).astype(np.float32),
        "sh": np.stack([gs[f"f_dc_{i}"] for i in range(3)], -1)[:, None, :].astype(np.float32),
    }
    print(f"loaded {n} splats from {args.result_dir}/gaussians.ply")

    with open(os.path.join(args.result_dir, "camera_params.json")) as f:
        cams = json.load(f)
    c2w = np.asarray([c["matrix"] for c in cams["extrinsics"]], np.float32)
    Ks = np.asarray([c["matrix"] for c in cams["intrinsics"]], np.float32)

    imgs = io_images.load_inputs(args.images_dir, target_size=args.size)[0]
    assert len(imgs) == len(c2w), f"{len(imgs)} images vs {len(c2w)} cameras"

    cfg = splat_opt.SplatOptConfig(iters=args.iters,
                                   rasterizer_impl=args.rasterizer,
                                   max_per_tile=args.max_per_tile,
                                   strategy=args.strategy,
                                   use_selective_adam=args.selective_adam,
                                   mode="2dgs" if args.gs2d else "3dgs")
    out = splat_opt.optimize_splats(splats, imgs, c2w, Ks, cfg)
    print(f"optimized: {len(out['means'])} splats alive")

    op = np.clip(out["opacities"], 1e-6, 1 - 1e-6)
    io_ply.save_gs_ply(os.path.join(args.result_dir, "gaussians_opt.ply"),
                       out["means"], out["scales"], out["quats"],
                       out["sh"][:, 0], np.log(op / (1 - op)),
                       scale_percentile=1.0)
    print(f"wrote {args.result_dir}/gaussians_opt.ply")

    if args.video:
        H, W = imgs.shape[1:3]
        traj, traj_K = render_lib.interpolate_trajectory(c2w, Ks)
        frames, _ = render_lib.render_trajectory(out, traj, traj_K, W, H,
                                                 impl=args.rasterizer)
        vp = render_lib.save_video(os.path.join(args.result_dir, "optimized.mp4"), frames)
        print(f"wrote {vp}")


if __name__ == "__main__":
    main()
