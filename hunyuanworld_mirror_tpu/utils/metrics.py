"""Evaluation metrics: camera ATE/RPE, point-cloud Accuracy/Completeness, NVS.

The reference publishes these protocols without shipping eval code
(BASELINE.md / reference README.md:228-251: 7-Scenes & NRGBD & DTU point
reconstruction Acc/Comp, Re10K/DL3DV NVS PSNR/SSIM/LPIPS, keyframe seq-id maps
in assets/seq-id-maps). This module provides TPU-runnable implementations:
pairwise-distance reductions are chunked matmul-style ops that XLA maps to the
MXU; alignment solves are tiny host-side numpy SVDs.
"""

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Sim(3) alignment (Umeyama) — host-side numpy: the SVD is 3x3.
# ---------------------------------------------------------------------------

def umeyama_alignment(src: np.ndarray, dst: np.ndarray,
                      with_scale: bool = True
                      ) -> Tuple[float, np.ndarray, np.ndarray]:
    """Least-squares sim(3): returns (s, R, t) with  dst ≈ s·R·src + t.

    Closed-form Umeyama (IEEE TPAMI 13(4), 1991) over (N, 3) correspondences.
    """
    src = np.asarray(src, np.float64)
    dst = np.asarray(dst, np.float64)
    assert src.shape == dst.shape and src.shape[-1] == 3
    n = src.shape[0]
    mu_s, mu_d = src.mean(0), dst.mean(0)
    xs, xd = src - mu_s, dst - mu_d
    cov = xd.T @ xs / n
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1.0
    R = U @ S @ Vt
    if with_scale:
        var_s = (xs ** 2).sum() / n
        s = float(np.trace(np.diag(D) @ S) / max(var_s, 1e-12))
    else:
        s = 1.0
    t = mu_d - s * R @ mu_s
    return s, R, t


def apply_sim3(pts: np.ndarray, s: float, R: np.ndarray,
               t: np.ndarray) -> np.ndarray:
    return s * np.asarray(pts) @ np.asarray(R).T + np.asarray(t)


# ---------------------------------------------------------------------------
# Camera trajectory metrics
# ---------------------------------------------------------------------------

def ate_rmse(pred_c2w: np.ndarray, gt_c2w: np.ndarray,
             align: bool = True) -> float:
    """Absolute trajectory error: RMSE of camera centers after optional
    sim(3) alignment (the Re10K/CO3D relpose protocol, BASELINE.md)."""
    p = np.asarray(pred_c2w)[..., :3, 3].reshape(-1, 3)
    g = np.asarray(gt_c2w)[..., :3, 3].reshape(-1, 3)
    if align and len(p) >= 3:
        s, R, t = umeyama_alignment(p, g)
        p = apply_sim3(p, s, R, t)
    return float(np.sqrt(((p - g) ** 2).sum(-1).mean()))


def rpe(pred_c2w: np.ndarray, gt_c2w: np.ndarray,
        delta: int = 1) -> Tuple[float, float]:
    """Relative pose error over frame pairs (i, i+delta):
    (rotation error deg, translation error)."""
    P = np.asarray(pred_c2w).reshape(-1, 4, 4)
    G = np.asarray(gt_c2w).reshape(-1, 4, 4)
    rot_errs, t_errs = [], []
    for i in range(len(P) - delta):
        dp = np.linalg.inv(P[i]) @ P[i + delta]
        dg = np.linalg.inv(G[i]) @ G[i + delta]
        e = np.linalg.inv(dg) @ dp
        cos = np.clip((np.trace(e[:3, :3]) - 1) / 2, -1, 1)
        rot_errs.append(np.degrees(np.arccos(cos)))
        t_errs.append(np.linalg.norm(e[:3, 3]))
    return float(np.mean(rot_errs)), float(np.mean(t_errs))


# ---------------------------------------------------------------------------
# Point-cloud Accuracy / Completeness (chamfer split)
# ---------------------------------------------------------------------------

def _nn_dist_chunked(query: jnp.ndarray, ref: jnp.ndarray,
                     chunk: int = 4096) -> jnp.ndarray:
    """For each query point the distance to its nearest ref point.

    |q - r|^2 = |q|^2 + |r|^2 - 2 q·r: the cross term is one (chunk, N)
    matmul per step — MXU-shaped — scanned over query chunks so peak memory
    stays at chunk*N instead of M*N.
    """
    ref = ref.astype(jnp.float32)
    r2 = (ref ** 2).sum(-1)  # (N,)
    M = query.shape[0]
    pad = (-M) % chunk
    q = jnp.pad(query.astype(jnp.float32), ((0, pad), (0, 0)))
    q = q.reshape(-1, chunk, 3)

    def step(_, qc):
        q2 = (qc ** 2).sum(-1)  # (chunk,)
        cross = qc @ ref.T      # (chunk, N) MXU matmul
        d2 = q2[:, None] + r2[None, :] - 2.0 * cross
        return None, jnp.sqrt(jnp.maximum(d2.min(axis=1), 0.0))

    _, d = jax.lax.scan(step, None, q)
    return d.reshape(-1)[:M]


def accuracy_completeness(pred_pts: np.ndarray, gt_pts: np.ndarray,
                          align: bool = False,
                          max_points: int = 65536,
                          seed: int = 0,
                          statistic: str = "mean"
                          ) -> Tuple[float, float]:
    """Point reconstruction metrics (reference README.md:228-240 protocol):

      Accuracy      = statistic over pred points of distance to nearest GT
      Completeness  = statistic over GT points of distance to nearest pred

    `align=True` Umeyama-aligns pred→GT first using the (assumed pixel-
    aligned, equal-length) correspondence; both clouds are then subsampled to
    `max_points` for the O(M·N) nearest-neighbor reduction.
    """
    pred = np.asarray(pred_pts, np.float32).reshape(-1, 3)
    gt = np.asarray(gt_pts, np.float32).reshape(-1, 3)
    if align and pred.shape == gt.shape:
        s, R, t = umeyama_alignment(pred, gt)
        pred = apply_sim3(pred, s, R, t).astype(np.float32)

    rng = np.random.default_rng(seed)
    if len(pred) > max_points:
        pred = pred[rng.choice(len(pred), max_points, replace=False)]
    if len(gt) > max_points:
        gt = gt[rng.choice(len(gt), max_points, replace=False)]

    stat = {"mean": jnp.mean, "median": jnp.median}[statistic]
    acc = float(stat(_nn_dist_chunked(jnp.asarray(pred), jnp.asarray(gt))))
    comp = float(stat(_nn_dist_chunked(jnp.asarray(gt), jnp.asarray(pred))))
    return acc, comp


# ---------------------------------------------------------------------------
# NVS image metrics
# ---------------------------------------------------------------------------

def nvs_metrics(pred: np.ndarray, target: np.ndarray,
                lpips_params=None) -> dict:
    """PSNR + SSIM (+ LPIPS) over (..., H, W, 3) images in [0, 1].

    LPIPS (utils/lpips.py, JAX AlexNet reimplementation) is included only
    when calibrated weights are supplied — pass `lpips_params` or set
    $WM_LPIPS_WEIGHTS to a converted .npz (lpips.convert_torch_state); the
    published metric is meaningless with uncalibrated weights so it is
    omitted rather than faked when the gate is closed."""
    from ..training import losses
    from . import lpips as lpips_lib

    pred_j = jnp.asarray(pred, jnp.float32)
    tgt_j = jnp.asarray(target, jnp.float32)
    if pred_j.ndim == 3:
        pred_j, tgt_j = pred_j[None], tgt_j[None]
    out = {
        "psnr": float(losses.psnr(pred_j, tgt_j)),
        "ssim": float(losses.ssim(pred_j, tgt_j).mean()),
    }
    lp = lpips_params if lpips_params is not None else lpips_lib.load_params()
    if lp is not None:
        out["lpips"] = float(jnp.mean(lpips_lib.distance(lp, pred_j, tgt_j)))
    return out
