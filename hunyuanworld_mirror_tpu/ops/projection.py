"""3D Gaussian EWA projection (world -> camera -> screen conics), pure JAX.

Semantics mirror gsplat's reference implementation
(reference submodules/gsplat/gsplat/cuda/_torch_impl.py:45-374): quat/scale ->
covariance, world->cam transform, perspective EWA with FOV-limit clamping,
eps2d=0.3 low-pass dilation with optional AA compensation, conics = inverse
2D covariance, 3.33-sigma integer radii, near/far + frustum culling via
radius zeroing.

This is plain vectorized JAX — XLA fuses it; the Pallas effort goes into the
tile rasterizer, not here.
"""

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp

from ..utils.rotation import quat_to_rotmat


class Projected(NamedTuple):
    radii: jnp.ndarray          # (C, N, 2) int32 — 0 marks culled
    means2d: jnp.ndarray        # (C, N, 2)
    depths: jnp.ndarray         # (C, N)
    conics: jnp.ndarray         # (C, N, 3) upper-triangle inverse covariance
    compensations: Optional[jnp.ndarray]  # (C, N) or None


def quat_scale_to_covar(quats: jnp.ndarray, scales: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) XYZW quats + (..., 3) scales -> (..., 3, 3) covariance RSS^TR^T."""
    R = quat_to_rotmat(quats / jnp.linalg.norm(quats, axis=-1, keepdims=True))
    M = R * scales[..., None, :]
    return jnp.einsum("...ij,...kj->...ik", M, M, precision="highest")


def world_to_cam(means: jnp.ndarray, covars: jnp.ndarray,
                 viewmats: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Transform N gaussians into C camera frames.

    Args:
      means: (N, 3), covars: (N, 3, 3), viewmats: (C, 4, 4) world->cam.
    Returns:
      means_c (C, N, 3), covars_c (C, N, 3, 3).
    """
    R = viewmats[:, :3, :3]
    t = viewmats[:, :3, 3]
    means_c = jnp.einsum("cij,nj->cni", R, means, precision="highest") + t[:, None]
    covars_c = jnp.einsum("cij,njk,clk->cnil", R, covars, R, precision="highest")
    return means_c, covars_c


def persp_proj(means_c: jnp.ndarray, covars_c: jnp.ndarray, Ks: jnp.ndarray,
               width: int, height: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Perspective EWA: camera-frame gaussians -> screen means + 2D covariance."""
    tx, ty, tz = means_c[..., 0], means_c[..., 1], means_c[..., 2]
    tz2 = tz * tz

    fx = Ks[:, 0, 0, None]
    fy = Ks[:, 1, 1, None]
    cx = Ks[:, 0, 2, None]
    cy = Ks[:, 1, 2, None]
    tan_fovx = 0.5 * width / fx
    tan_fovy = 0.5 * height / fy

    lim_x_pos = (width - cx) / fx + 0.3 * tan_fovx
    lim_x_neg = cx / fx + 0.3 * tan_fovx
    lim_y_pos = (height - cy) / fy + 0.3 * tan_fovy
    lim_y_neg = cy / fy + 0.3 * tan_fovy
    txc = tz * jnp.clip(tx / tz, -lim_x_neg, lim_x_pos)
    tyc = tz * jnp.clip(ty / tz, -lim_y_neg, lim_y_pos)

    O = jnp.zeros_like(tz)
    J = jnp.stack([fx / tz, O, -fx * txc / tz2,
                   O, fy / tz, -fy * tyc / tz2], axis=-1).reshape(*tz.shape, 2, 3)

    cov2d = jnp.einsum("...ij,...jk,...lk->...il", J, covars_c, J,
                       precision="highest")
    means2d = jnp.einsum("cij,cnj->cni", Ks[:, :2, :3], means_c,
                         precision="highest") / tz[..., None]
    return means2d, cov2d


def finish_projection(means2d: jnp.ndarray, covars2d: jnp.ndarray,
                      depths: jnp.ndarray, width: int, height: int,
                      eps2d: float = 0.3, near_plane: float = 0.01,
                      far_plane: float = 1e10,
                      calc_compensations: bool = False,
                      extra_valid: Optional[jnp.ndarray] = None) -> Projected:
    """Shared tail: 2D covariance -> (dilated conic, radii, culling).

    Used by both the EWA path below and the unscented-transform path
    (ops/cameras.py) so the two projections agree on dilation/culling."""
    det_orig = (covars2d[..., 0, 0] * covars2d[..., 1, 1]
                - covars2d[..., 0, 1] * covars2d[..., 1, 0])
    covars2d = covars2d + jnp.eye(2, dtype=means2d.dtype) * eps2d
    det = (covars2d[..., 0, 0] * covars2d[..., 1, 1]
           - covars2d[..., 0, 1] * covars2d[..., 1, 0])
    det = jnp.maximum(det, 1e-10)

    compensations = None
    if calc_compensations:
        compensations = jnp.sqrt(jnp.maximum(det_orig / det, 0.0))

    conics = jnp.stack([
        covars2d[..., 1, 1] / det,
        -(covars2d[..., 0, 1] + covars2d[..., 1, 0]) / 2.0 / det,
        covars2d[..., 0, 0] / det,
    ], axis=-1)

    radius_x = jnp.ceil(3.33 * jnp.sqrt(covars2d[..., 0, 0]))
    radius_y = jnp.ceil(3.33 * jnp.sqrt(covars2d[..., 1, 1]))
    radius = jnp.stack([radius_x, radius_y], axis=-1)

    valid = (det > 0) & (depths > near_plane) & (depths < far_plane)
    if extra_valid is not None:
        valid = valid & extra_valid
    inside = ((means2d[..., 0] + radius[..., 0] > 0)
              & (means2d[..., 0] - radius[..., 0] < width)
              & (means2d[..., 1] + radius[..., 1] > 0)
              & (means2d[..., 1] - radius[..., 1] < height))
    radius = jnp.where((valid & inside)[..., None], radius, 0.0)
    return Projected(radius.astype(jnp.int32), means2d, depths, conics,
                     compensations)


def fully_fused_projection(
    means: jnp.ndarray, covars: jnp.ndarray, viewmats: jnp.ndarray,
    Ks: jnp.ndarray, width: int, height: int,
    eps2d: float = 0.3, near_plane: float = 0.01, far_plane: float = 1e10,
    calc_compensations: bool = False,
) -> Projected:
    """Project N world-space gaussians into C cameras (dense [C, N] layout)."""
    means_c, covars_c = world_to_cam(means, covars, viewmats)
    means2d, covars2d = persp_proj(means_c, covars_c, Ks, width, height)
    return finish_projection(means2d, covars2d, means_c[..., 2], width, height,
                             eps2d, near_plane, far_plane, calc_compensations)
