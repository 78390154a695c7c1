"""Cross-view frustum visibility masks (for NVS supervision).

Behavioral parity: reference src/models/utils/frustum.py:7-195 — unproject a
target view's depth into world space, reproject into the context views, and
mark pixels that land in-bounds with consistent depth (bilinear-sampled).
"""

from typing import Tuple

import jax.numpy as jnp

from . import geometry
from .camera import se3_inverse


def bilinear_sample(img: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Sample (H, W) or (H, W, C) at continuous pixel coords uv (..., 2)=(x, y)."""
    H, W = img.shape[:2]
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    x = jnp.clip(uv[..., 0], 0.0, W - 1.0)
    y = jnp.clip(uv[..., 1], 0.0, H - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]
    v = (img[y0, x0] * (1 - wx) * (1 - wy) + img[y0, x1] * wx * (1 - wy)
         + img[y1, x0] * (1 - wx) * wy + img[y1, x1] * wx * wy)
    return v[..., 0] if squeeze else v


def project_points(points_w: jnp.ndarray, w2c: jnp.ndarray,
                   K: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """World points (..., 3) -> pixel coords (..., 2) + camera depth (...,)."""
    p_cam = jnp.einsum("ij,...j->...i", w2c[:3, :3], points_w,
                       precision="highest") + w2c[:3, 3]
    z = p_cam[..., 2]
    uv = p_cam[..., :2] / jnp.maximum(jnp.abs(z[..., None]), 1e-8) * jnp.sign(z[..., None])
    u = uv[..., 0] * K[0, 0] + K[0, 2]
    v = uv[..., 1] * K[1, 1] + K[1, 2]
    return jnp.stack([u, v], axis=-1), z


def calculate_unprojected_mask(
    target_depth: jnp.ndarray,      # (H, W)
    target_c2w: jnp.ndarray,        # (4, 4)
    target_K: jnp.ndarray,          # (3, 3)
    context_depths: jnp.ndarray,    # (S, H, W)
    context_c2w: jnp.ndarray,       # (S, 4, 4)
    context_K: jnp.ndarray,         # (S, 3, 3)
    depth_tolerance: float = 0.05,
) -> jnp.ndarray:
    """Mask of target pixels visible in at least one context view.

    A target pixel counts as covered when its world point reprojects inside a
    context image with positive depth matching that view's depth map within a
    relative tolerance.
    """
    H, W = target_depth.shape
    world, _, valid = geometry.depth_to_world_coords_points(
        target_depth[None], target_c2w[None], target_K[None])
    world = world[0]  # (H, W, 3)

    covered = jnp.zeros((H, W), bool)
    S = context_depths.shape[0]
    for s in range(S):
        w2c = se3_inverse(context_c2w[s])
        uv, z = project_points(world, w2c, context_K[s])
        in_bounds = ((uv[..., 0] >= 0) & (uv[..., 0] <= W - 1)
                     & (uv[..., 1] >= 0) & (uv[..., 1] <= H - 1) & (z > 0))
        sampled = bilinear_sample(context_depths[s], uv)
        consistent = jnp.abs(sampled - z) <= depth_tolerance * jnp.maximum(sampled, 1e-6)
        covered = covered | (in_bounds & consistent)

    return covered & valid[0]
