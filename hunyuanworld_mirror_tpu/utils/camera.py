"""Camera parameterization codec and SE(3) helpers.

The model regresses a compact 9-vector per view:
    [t(3), quat XYZW(4), fov_v, fov_u]
encoding the world-to-camera extrinsic [R|t] plus vertical/horizontal FOV,
with the principal point fixed at the image center.

Behavioral parity targets:
  /root/reference/src/models/utils/camera_utils.py:5-75
  /root/reference/src/models/utils/geometry.py:92-111 (closed-form SE3 inverse)
"""

from typing import Optional, Tuple

import jax.numpy as jnp

from .rotation import quat_to_rotmat, rotmat_to_quat


def camera_params_to_vector(ext: jnp.ndarray, intr: jnp.ndarray,
                            image_hw: Tuple[int, int]) -> jnp.ndarray:
    """(..., 3, 4) extrinsic + (..., 3, 3) intrinsics -> (..., 9) vector."""
    R = ext[..., :3, :3]
    t = ext[..., :3, 3]
    q = rotmat_to_quat(R)
    h, w = image_hw
    fov_v = 2.0 * jnp.arctan(h * 0.5 / intr[..., 1, 1])
    fov_u = 2.0 * jnp.arctan(w * 0.5 / intr[..., 0, 0])
    return jnp.concatenate(
        [t, q, fov_v[..., None], fov_u[..., None]], axis=-1
    ).astype(jnp.float32)


def extrinsics_to_vector(ext: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 4) extrinsic -> (..., 7) [t, quat XYZW] vector."""
    R = ext[..., :3, :3]
    t = ext[..., :3, 3]
    q = rotmat_to_quat(R)
    return jnp.concatenate([t, q], axis=-1).astype(jnp.float32)


def vector_to_extrinsics(cam_vec: jnp.ndarray) -> jnp.ndarray:
    """(..., 7+) [t, quat] vector -> (..., 3, 4) extrinsic [R|t]."""
    t = cam_vec[..., 0:3]
    q = cam_vec[..., 3:7]
    R = quat_to_rotmat(q)
    return jnp.concatenate([R, t[..., None]], axis=-1)


def vector_to_camera_matrices(
    cam_vec: jnp.ndarray,
    image_hw: Optional[Tuple[int, int]] = None,
    build_intr: bool = True,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """(..., 9) vector -> ((..., 3, 4) extrinsic, (..., 3, 3) intrinsics).

    The intrinsics place the principal point at the image center and rebuild
    focal lengths from the FOV components.
    """
    t = cam_vec[..., 0:3]
    q = cam_vec[..., 3:7]
    fov_v = cam_vec[..., 7]
    fov_u = cam_vec[..., 8]

    R = quat_to_rotmat(q)
    ext = jnp.concatenate([R, t[..., None]], axis=-1)

    intr = None
    if build_intr:
        h, w = image_hw
        # tan clamp: the head's relu fov activation can emit exactly 0 (or
        # >= pi) early in training; the reference would produce inf/negative
        # focals there. Keep focals finite and positive instead.
        fy = h * 0.5 / jnp.maximum(jnp.tan(fov_v * 0.5), 1e-6)
        fx = w * 0.5 / jnp.maximum(jnp.tan(fov_u * 0.5), 1e-6)
        zeros = jnp.zeros_like(fx)
        ones = jnp.ones_like(fx)
        row0 = jnp.stack([fx, zeros, jnp.full_like(fx, w * 0.5)], axis=-1)
        row1 = jnp.stack([zeros, fy, jnp.full_like(fy, h * 0.5)], axis=-1)
        row2 = jnp.stack([zeros, zeros, ones], axis=-1)
        intr = jnp.stack([row0, row1, row2], axis=-2)

    return ext, intr


def se3_inverse(se3: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of batched SE(3) matrices (..., 4, 4)."""
    R = se3[..., :3, :3]
    t = se3[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    t_inv = -jnp.einsum("...ij,...j->...i", Rt, t, precision="highest")
    top = jnp.concatenate([Rt, t_inv[..., None]], axis=-1)
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def to_homogeneous(ext3x4: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 4) -> (..., 4, 4) with [0, 0, 0, 1] appended."""
    bottom = jnp.zeros_like(ext3x4[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([ext3x4, bottom], axis=-2)
