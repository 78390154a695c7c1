"""Pinhole unprojection and pixel-grid geometry.

Behavioral parity target: /root/reference/src/models/utils/geometry.py:5-137.
"""

from typing import Tuple

import jax.numpy as jnp


def pixel_grid(h: int, w: int, dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Return (u, v) integer pixel-coordinate grids of shape (H, W)."""
    v = jnp.arange(h, dtype=dtype)[:, None] * jnp.ones((1, w), dtype)
    u = jnp.ones((h, 1), dtype) * jnp.arange(w, dtype=dtype)[None, :]
    return u, v


def depth_to_camera_coords(depthmap: jnp.ndarray,
                           intrinsics: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Unproject depth maps into camera-frame points.

    Args:
      depthmap: (B, H, W) depth.
      intrinsics: (B, 3, 3) pinhole K.
    Returns:
      points (B, H, W, 3) camera coords, valid mask (B, H, W) where depth > 0.
    """
    B, H, W = depthmap.shape
    fx = intrinsics[:, 0, 0][:, None, None]
    fy = intrinsics[:, 1, 1][:, None, None]
    cx = intrinsics[:, 0, 2][:, None, None]
    cy = intrinsics[:, 1, 2][:, None, None]

    u, v = pixel_grid(H, W, depthmap.dtype)
    z = depthmap
    x = (u[None] - cx) * z / fx
    y = (v[None] - cy) * z / fy
    pts = jnp.stack([x, y, z], axis=-1)
    return pts, depthmap > 0.0


def depth_to_world_coords_points(
    depth_map: jnp.ndarray, extrinsic: jnp.ndarray, intrinsic: jnp.ndarray, eps: float = 1e-8
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Unproject depth maps to world coordinates through camera-to-world extrinsics.

    Args:
      depth_map: (B, H, W).
      extrinsic: (B, 4, 4) camera-to-world transform.
      intrinsic: (B, 3, 3).
    Returns:
      (world points (B,H,W,3), camera points (B,H,W,3), valid mask (B,H,W)).
    """
    point_mask = depth_map > eps
    cam_pts, _ = depth_to_camera_coords(depth_map, intrinsic)
    R = extrinsic[:, :3, :3]
    t = extrinsic[:, :3, 3]
    # precision='highest': geometry must stay true fp32 — JAX's default matmul
    # precision is bf16-class even for f32 operands.
    world = jnp.einsum("bhwi,bji->bhwj", cam_pts, R,
                       precision="highest") + t[:, None, None, :]
    return world, cam_pts, point_mask


def create_pixel_coordinate_grid(num_frames: int, height: int, width: int) -> jnp.ndarray:
    """(S, H, W, 3) grid of (x, y, frame-index) per pixel."""
    u, v = pixel_grid(height, width)
    x = jnp.broadcast_to(u[None], (num_frames, height, width))
    y = jnp.broadcast_to(v[None], (num_frames, height, width))
    f = jnp.broadcast_to(
        jnp.arange(num_frames, dtype=jnp.float32)[:, None, None], (num_frames, height, width)
    )
    return jnp.stack([x, y, f], axis=-1)
