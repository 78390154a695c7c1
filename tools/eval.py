"""Evaluation CLI: point-recon Acc/Comp, camera ATE/RPE, NVS PSNR/SSIM.

The reference publishes these protocols (README.md:228-251, keyframe seq-id
maps in assets/seq-id-maps/*.json) but ships no eval code; this tool closes
that gap for the TPU build. Modes:

  # point clouds (PLY or .npy (N,3)):
  python tools/eval.py points --pred pred.ply --gt gt.ply [--align] [--median]

  # camera trajectories (.npz with key c2w (S,4,4), or .npy):
  python tools/eval.py cameras --pred pred.npz --gt gt.npz

  # novel-view renders vs GT frames (two directories of same-named images):
  python tools/eval.py nvs --pred pred_dir/ --gt gt_dir/

  # keyframe subsetting matching the reference protocol: --keyframe N takes
  # every Nth frame (e.g. 7-Scenes kf40/kf200, NRGBD kf100/kf500, DTU kf5).

Prints one JSON dict of metrics.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _load_points(path: str) -> np.ndarray:
    if path.endswith(".npy"):
        return np.load(path).reshape(-1, 3)
    if path.endswith((".ply", ".PLY")):
        from hunyuanworld_mirror_tpu.io import ply
        rec = ply.read_ply(path)
        return np.stack([rec["x"], rec["y"], rec["z"]], axis=-1).astype(np.float32)
    raise ValueError(f"unsupported point file {path}")


def _load_cams(path: str) -> np.ndarray:
    if path.endswith(".npz"):
        z = np.load(path)
        for k in ("c2w", "poses", "camera_poses", "extrinsic"):
            if k in z:
                return z[k].reshape(-1, 4, 4)
        raise KeyError(f"no camera key in {path}: {list(z.keys())}")
    return np.load(path).reshape(-1, 4, 4)


def _load_image_dir(path: str) -> np.ndarray:
    import cv2
    files = sorted(f for f in os.listdir(path)
                   if f.lower().endswith((".png", ".jpg", ".jpeg")))
    imgs = []
    for f in files:
        im = cv2.imread(os.path.join(path, f), cv2.IMREAD_COLOR)
        imgs.append(im[..., ::-1].astype(np.float32) / 255.0)
    return np.stack(imgs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["points", "cameras", "nvs"])
    ap.add_argument("--pred", required=True)
    ap.add_argument("--gt", required=True)
    ap.add_argument("--align", action="store_true",
                    help="Umeyama sim(3) alignment before point metrics")
    ap.add_argument("--median", action="store_true",
                    help="median instead of mean for Acc/Comp")
    ap.add_argument("--max-points", type=int, default=65536)
    ap.add_argument("--keyframe", type=int, default=1,
                    help="take every Nth camera/frame (seq-id-map protocol)")
    args = ap.parse_args()

    from hunyuanworld_mirror_tpu.utils import metrics

    if args.mode == "points":
        pred = _load_points(args.pred)
        gt = _load_points(args.gt)
        acc, comp = metrics.accuracy_completeness(
            pred, gt, align=args.align, max_points=args.max_points,
            statistic="median" if args.median else "mean")
        out = {"accuracy": acc, "completeness": comp,
               "chamfer": 0.5 * (acc + comp),
               "n_pred": len(pred), "n_gt": len(gt)}
    elif args.mode == "cameras":
        pred = _load_cams(args.pred)[::args.keyframe]
        gt = _load_cams(args.gt)[::args.keyframe]
        n = min(len(pred), len(gt))
        rot_e, t_e = metrics.rpe(pred[:n], gt[:n])
        out = {"ate_rmse": metrics.ate_rmse(pred[:n], gt[:n]),
               "rpe_rot_deg": rot_e, "rpe_trans": t_e, "n_frames": n}
    else:
        pred = _load_image_dir(args.pred)[::args.keyframe]
        gt = _load_image_dir(args.gt)[::args.keyframe]
        n = min(len(pred), len(gt))
        # nvs_metrics includes LPIPS (utils/lpips.py JAX net) when
        # $WM_LPIPS_WEIGHTS points at converted calibrated weights
        out = metrics.nvs_metrics(pred[:n], gt[:n])
        out["n_frames"] = n
        if "lpips" not in out:
            try:  # fall back to the torch lpips package if importable
                import lpips  # noqa: F401
                import torch
                net = lpips.LPIPS(net="alex")
                a = torch.from_numpy(pred[:n].transpose(0, 3, 1, 2)) * 2 - 1
                b = torch.from_numpy(gt[:n].transpose(0, 3, 1, 2)) * 2 - 1
                with torch.no_grad():
                    out["lpips"] = float(net(a, b).mean())
            except Exception:
                pass

    print(json.dumps(out))


if __name__ == "__main__":
    main()
