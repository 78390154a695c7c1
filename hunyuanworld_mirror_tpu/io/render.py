"""Novel-view trajectory rendering and video export.

Behavioral parity: reference src/utils/render_utils.py:121-376 — slerp-
interpolated camera trajectory between predicted views (15 steps/pair), a
"wobble" orbit when only one view exists, chunked rasterization, turbo
colormap depth visualization, mp4 at 30fps (cv2 here; the reference uses
moviepy, absent in this image).
"""

from typing import Dict, List, Optional, Tuple

import numpy as np

from ..utils import rotation as rot_utils


def slerp(q0: np.ndarray, q1: np.ndarray, t: np.ndarray) -> np.ndarray:
    """Spherical interpolation between XYZW quaternions; t (T,) -> (T, 4)."""
    q0 = q0 / np.linalg.norm(q0)
    q1 = q1 / np.linalg.norm(q1)
    dot = float(np.dot(q0, q1))
    if dot < 0.0:
        q1, dot = -q1, -dot
    if dot > 0.9995:
        out = q0[None] + t[:, None] * (q1 - q0)[None]
        return out / np.linalg.norm(out, axis=-1, keepdims=True)
    theta = np.arccos(np.clip(dot, -1, 1))
    s0 = np.sin((1 - t) * theta) / np.sin(theta)
    s1 = np.sin(t * theta) / np.sin(theta)
    return s0[:, None] * q0[None] + s1[:, None] * q1[None]


def interpolate_trajectory(c2w: np.ndarray, Ks: np.ndarray,
                           steps_per_pair: int = 15) -> Tuple[np.ndarray, np.ndarray]:
    """Slerp a smooth camera path through the predicted views.

    Args:
      c2w: (S, 4, 4) camera-to-world poses; Ks: (S, 3, 3).
    Returns:
      (T, 4, 4) c2w trajectory + (T, 3, 3) intrinsics.
    """
    import jax.numpy as jnp

    S = len(c2w)
    if S == 1:
        return wobble_trajectory(c2w[0], Ks[0])

    quats = np.asarray(rot_utils.rotmat_to_quat(jnp.asarray(c2w[:, :3, :3])))
    out_poses, out_Ks = [], []
    for i in range(S - 1):
        t = np.linspace(0, 1, steps_per_pair, endpoint=False)
        qs = slerp(quats[i], quats[i + 1], t)
        trans = (1 - t)[:, None] * c2w[i, :3, 3][None] + t[:, None] * c2w[i + 1, :3, 3][None]
        Rm = np.asarray(rot_utils.quat_to_rotmat(jnp.asarray(qs)))
        for k in range(steps_per_pair):
            m = np.eye(4, dtype=np.float32)
            m[:3, :3] = Rm[k]
            m[:3, 3] = trans[k]
            out_poses.append(m)
            out_Ks.append((1 - t[k]) * Ks[i] + t[k] * Ks[i + 1])
    out_poses.append(c2w[-1].astype(np.float32))
    out_Ks.append(Ks[-1])
    return np.stack(out_poses), np.stack(out_Ks).astype(np.float32)


def wobble_trajectory(c2w: np.ndarray, K: np.ndarray, n_frames: int = 60,
                      radius: float = 0.05) -> Tuple[np.ndarray, np.ndarray]:
    """Small circular orbit around a single camera (reference S==1 path)."""
    angles = np.linspace(0, 2 * np.pi, n_frames)
    poses = []
    for a in angles:
        m = c2w.copy().astype(np.float32)
        offset = c2w[:3, :3] @ np.array([np.cos(a), np.sin(a), 0.0]) * radius
        m[:3, 3] = c2w[:3, 3] + offset
        poses.append(m)
    return np.stack(poses), np.tile(K[None], (n_frames, 1, 1)).astype(np.float32)


def render_trajectory(splats: Dict[str, np.ndarray], c2w_traj: np.ndarray,
                      Ks_traj: np.ndarray, width: int, height: int,
                      chunk: int = 40, impl: str = "jax",
                      max_per_tile: int = 4096) -> Tuple[np.ndarray, np.ndarray]:
    """Rasterize the splat set along a trajectory -> (T, H, W, 3), (T, H, W)."""
    import jax.numpy as jnp
    from ..ops import rasterizer
    from ..utils import camera as cam_utils

    means = jnp.asarray(splats["means"])
    quats = jnp.asarray(splats["quats"])
    scales = jnp.asarray(splats["scales"])
    opac = jnp.asarray(splats["opacities"])
    colors = jnp.asarray(splats["sh"])

    frames, depths = [], []
    for i in range(0, len(c2w_traj), chunk):
        c2w = jnp.asarray(c2w_traj[i:i + chunk])
        viewmats = cam_utils.se3_inverse(c2w)
        out, alpha, _ = rasterizer.rasterize(
            means, quats, scales, opac, colors,
            viewmats, jnp.asarray(Ks_traj[i:i + chunk]), width, height,
            render_mode="RGB+ED", impl=impl, quat_order="wxyz",
            max_per_tile=max_per_tile)
        frames.append(np.asarray(out[..., :3]))
        depths.append(np.asarray(out[..., 3]))
    return np.concatenate(frames), np.concatenate(depths)


def turbo_colormap(x: np.ndarray) -> np.ndarray:
    """Normalized scalar map -> turbo RGB (polynomial approximation)."""
    x = np.clip(x, 0, 1)
    # Google's turbo polynomial approximation coefficients
    r = np.clip(0.13572138 + x * (4.61539260 + x * (-42.66032258 + x * (132.13108234 + x * (-152.94239396 + x * 59.28637943)))), 0, 1)
    g = np.clip(0.09140261 + x * (2.19418839 + x * (4.84296658 + x * (-14.18503333 + x * (4.27729857 + x * 2.82956604)))), 0, 1)
    b = np.clip(0.10667330 + x * (12.64194608 + x * (-60.58204836 + x * (110.36276771 + x * (-89.90310912 + x * 27.34824973)))), 0, 1)
    return np.stack([r, g, b], axis=-1)


def save_video(path: str, frames: np.ndarray, fps: int = 30) -> str:
    """(T, H, W, 3) float [0,1] -> mp4 via cv2."""
    import cv2
    T, H, W, _ = frames.shape
    vw = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), fps, (W, H))
    for f in frames:
        bgr = cv2.cvtColor((np.clip(f, 0, 1) * 255).astype(np.uint8),
                           cv2.COLOR_RGB2BGR)
        vw.write(bgr)
    vw.release()
    return str(path)


def render_interpolated_video(predictions: Dict, width: int, height: int,
                              out_path: str, batch_index: int = 0,
                              steps_per_pair: int = 15, fps: int = 30,
                              impl: str = "jax",
                              effect: str = None) -> str:
    """End-to-end: predicted splats + cameras -> smooth novel-view mp4
    (RGB top, turbo depth bottom, reference render_utils.py:121-376).

    `effect` ("twister" | "rain" | "spread") animates the splats over the
    trajectory via io/effects.py (reference gs_effects.py)."""
    c2w = np.asarray(predictions["camera_poses"][batch_index])
    Ks = np.asarray(predictions["camera_intrs"][batch_index])
    splats = {k: np.asarray(v[batch_index]) for k, v in predictions["splats"].items()
              if k in ("means", "quats", "scales", "opacities", "sh")}

    traj, traj_K = interpolate_trajectory(c2w, Ks, steps_per_pair)
    if effect:
        from . import effects as fx
        n = len(traj)
        frames_l, depths_l = [], []
        rng = np.random.default_rng(0)
        for i in range(n):
            t = 10.0 * i / max(n - 1, 1)
            sp = fx.apply_effect(splats, t, effect, rng)
            f, d = render_trajectory(sp, traj[i:i + 1], traj_K[i:i + 1],
                                     width, height, impl=impl)
            frames_l.append(f[0])
            depths_l.append(d[0])
        frames, depths = np.stack(frames_l), np.stack(depths_l)
    else:
        frames, depths = render_trajectory(splats, traj, traj_K, width, height,
                                           impl=impl)

    d = depths - depths.min()
    d = d / (d.max() + 1e-9)
    depth_vis = turbo_colormap(d)
    panel = np.concatenate([frames, depth_vis], axis=1)  # stack vertically
    return save_video(out_path, panel, fps)
