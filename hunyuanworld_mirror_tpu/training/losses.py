"""Training losses.

CenterSnap losses mirror reference training/losses/loss.py:13-240:
  total = 100 * MSE(heatmap) + MaskedL1(pose map), where the pose mask is
  GT-heatmap > 0.3 sampled with stride `downscale_factor`, and the pose term
  splits into rot6d vs translation+size halves.

NVS losses (for splat training) follow gsplat's example trainer
(reference submodules/gsplat/examples/simple_trainer_worldmirror.py:746-800):
  (1-lambda)*L1 + lambda*(1-SSIM).
"""

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def mse_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - target) ** 2)


def masked_l1_loss(pred: jnp.ndarray, target: jnp.ndarray,
                   heatmap_gt: jnp.ndarray,
                   centroid_threshold: float = 0.3,
                   downscale_factor: int = 2) -> jnp.ndarray:
    """pred/target (B, h, w, C); heatmap_gt (B, H, W) at full resolution."""
    mask_small = heatmap_gt[:, ::downscale_factor, ::downscale_factor]
    valid = mask_small > centroid_threshold
    per_px = jnp.sum(jnp.abs(pred - target), axis=-1)  # (B, h, w)
    per_px = jnp.where(valid, per_px, 0.0)
    n = jnp.sum(valid)
    return jnp.where(n == 0, jnp.sum(per_px), jnp.sum(per_px) / jnp.maximum(n, 1))


def centersnap_loss(preds: Dict, batch: Dict, heat_weight: float = 100.0,
                    pose_weight: float = 1.0,
                    centroid_threshold: float = 0.3) -> Tuple[jnp.ndarray, Dict]:
    """preds: heatmap (B,H,W,1), pose_map (B,h,w,12); batch: heatmap (B,H,W),
    pose_map (B,h,w,12)."""
    heat_pred = preds["heatmap"][..., 0]
    heat_gt = batch["heatmap"]
    heatmap_loss = mse_loss(heat_pred, heat_gt)

    pose_pred, pose_gt = preds["pose_map"], batch["pose_map"]
    dr = heat_gt.shape[-1] // pose_pred.shape[-2]
    abs_rot = masked_l1_loss(pose_pred[..., :6], pose_gt[..., :6], heat_gt,
                             centroid_threshold, dr)
    tran_size = masked_l1_loss(pose_pred[..., 6:], pose_gt[..., 6:], heat_gt,
                               centroid_threshold, dr)
    pose_loss = abs_rot + tran_size
    total = heat_weight * heatmap_loss + pose_weight * pose_loss
    return total, {"heatmap_loss": heatmap_loss, "abs_rot_loss": abs_rot,
                   "tran_size_loss": tran_size, "pose_loss": pose_loss}


# ---------------------------------------------------------------------------
# Photometric losses for novel-view / splat optimization
# ---------------------------------------------------------------------------

def _gaussian_kernel1d(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-x ** 2 / (2 * sigma ** 2))
    return g / jnp.sum(g)


def ssim(a: jnp.ndarray, b: jnp.ndarray, c1: float = 0.01 ** 2,
         c2: float = 0.03 ** 2) -> jnp.ndarray:
    """SSIM over (..., H, W, C) images in [0, 1], 11x11 separable gaussian
    window via depthwise convs (SAME padding)."""
    from jax import lax

    k = _gaussian_kernel1d()
    C = a.shape[-1]
    ky = jnp.broadcast_to(k[:, None, None, None], (11, 1, 1, C)).astype(a.dtype)
    kx = jnp.broadcast_to(k[None, :, None, None], (1, 11, 1, C)).astype(a.dtype)

    def blur(x):
        shape = x.shape
        x4 = x.reshape((-1,) + shape[-3:])
        for kern in (ky, kx):
            x4 = lax.conv_general_dilated(
                x4, kern, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=C)
        return x4.reshape(shape)

    mu_a, mu_b = blur(a), blur(b)
    var_a = blur(a * a) - mu_a ** 2
    var_b = blur(b * b) - mu_b ** 2
    cov = blur(a * b) - mu_a * mu_b
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
        (mu_a ** 2 + mu_b ** 2 + c1) * (var_a + var_b + c2))
    return jnp.mean(s)


def photometric_loss(pred: jnp.ndarray, target: jnp.ndarray,
                     ssim_lambda: float = 0.2) -> jnp.ndarray:
    l1 = jnp.mean(jnp.abs(pred - target))
    return (1.0 - ssim_lambda) * l1 + ssim_lambda * (1.0 - ssim(pred, target))


def psnr(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    mse = jnp.mean((pred - target) ** 2)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))
