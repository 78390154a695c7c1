"""2D Gaussian Splatting (surfel) projection + tile rasterization.

Behavioral parity: reference submodules/gsplat/gsplat/cuda/_torch_impl_2dgs.py
:10-198 (the pure-torch oracle for Projection2DGSFused.cu /
RasterizeToPixels2DGSFwd.cu) — "2D Gaussian Splatting for Geometrically
Accurate Radiance Fields" (Huang et al., SIGGRAPH 2024).

Each splat is a planar disk: local tangent frame = R diag(s_u, s_v), normal =
R e_z (sign-flipped toward the camera). Projection builds the 3x3 ray
transform M = (K [R|t] H)^T that maps pixel homogeneous coords into the
splat's local (u, v) plane; rasterization intersects each pixel ray with the
plane via two homography rows (h_u x h_v), evaluates the local Gaussian
exp(-(u^2+v^2)/2) against a 2D screen-space low-pass floor (the paper's
object-space vs 2px filter min), and alpha-composites front-to-back with the
same masked prefix-product formulation as the 3DGS path (rasterizer.py),
additionally accumulating surfel normals.

Not used by WorldMirror's heads (SURVEY.md §2.8 "optional") but part of the
rasterization subsystem surface.
"""

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from . import tiles
from .rasterizer_ref import ALPHA_THRESHOLD, T_EPS
from ..utils.rotation import quat_to_rotmat


class Projection2D(NamedTuple):
    radii: jnp.ndarray          # (C, N, 2) int32 screen extents (0 = culled)
    means2d: jnp.ndarray        # (C, N, 2)
    depths: jnp.ndarray         # (C, N)
    ray_transforms: jnp.ndarray  # (C, N, 3, 3) M
    normals: jnp.ndarray        # (C, N, 3) camera-space, flipped to face cam


def fully_fused_projection_2dgs(
    means: jnp.ndarray, quats: jnp.ndarray, scales: jnp.ndarray,
    viewmats: jnp.ndarray, Ks: jnp.ndarray, width: int, height: int,
    near_plane: float = 0.01, far_plane: float = 1e10, eps: float = 1e-6,
    quat_order: str = "xyzw",
) -> Projection2D:
    """Project surfels for all cameras (oracle _torch_impl_2dgs.py:10-92)."""
    if quat_order == "wxyz":
        quats = quats[..., jnp.array([1, 2, 3, 0])]
    R_cw = viewmats[:, :3, :3]                      # (C, 3, 3)
    t_cw = viewmats[:, :3, 3]
    means_c = jnp.einsum("cij,nj->cni", R_cw, means) + t_cw[:, None, :]

    R_wl = quat_to_rotmat(quats)                    # (N, 3, 3)
    RS_wl = R_wl * scales[:, None, :]               # columns scaled
    RS_cl = jnp.einsum("cij,njk->cnik", R_cw, RS_wl)  # (C, N, 3, 3)

    normals = RS_cl[..., 2]                         # third column (normal dir)
    cos = -jnp.sum(normals * means_c, axis=-1, keepdims=True)
    normals = normals * jnp.where(cos > 0, 1.0, -1.0)

    # T maps local (u, v, 1) -> pixel homogeneous; M = T^T is applied to
    # pixel-plane rows in the rasterizer.
    T_cl = jnp.concatenate([RS_cl[..., :2], means_c[..., None]], axis=-1)
    T_sl = jnp.einsum("cij,cnjk->cnik", Ks[:, :3, :3], T_cl)
    M = jnp.swapaxes(T_sl, -1, -2)                  # (C, N, 3, 3)

    # screen AABB from the conic of the projected disk (oracle :63-77)
    test = jnp.array([1.0, 1.0, -1.0])
    d = jnp.sum(M[..., 2] * M[..., 2] * test, axis=-1, keepdims=True)
    valid = jnp.abs(d) > eps
    f = jnp.where(valid, test / jnp.where(valid, d, 1.0), 0.0)[..., None]
    means2d = jnp.sum(M[..., :2] * M[..., 2:3] * f, axis=-2)
    extents = jnp.sqrt(jnp.maximum(
        means2d ** 2 - jnp.sum(M[..., :2] * M[..., :2] * f, axis=-2), 1e-4))

    depths = means_c[..., 2]
    radius = jnp.ceil(3.33 * extents)
    ok = (valid[..., 0] & (depths > near_plane) & (depths < far_plane))
    inside = ((means2d[..., 0] + radius[..., 0] > 0)
              & (means2d[..., 0] - radius[..., 0] < width)
              & (means2d[..., 1] + radius[..., 1] > 0)
              & (means2d[..., 1] - radius[..., 1] < height))
    radius = jnp.where((ok & inside)[..., None], radius, 0.0)
    # the oracle returns transpose(M) == T_sl; its accumulate indexes ROWS of
    # that returned matrix (h_u = -M[0] + M[2]*x), so hand back T_sl.
    return Projection2D(radius.astype(jnp.int32), means2d, depths,
                        jnp.swapaxes(M, -1, -2), normals)


def _tile_weights_2dgs(M, means2d, opacities, live, px_xy):
    """Per-(surfel, pixel) blend weights for one tile.

    M (K, 3, 3) ray transforms, means2d (K, 2) conic centers, opacities (K,),
    px_xy (P, 2) the pixel centers in the PINHOLE frame — for a distorted
    camera the caller passes each pixel's undistorted coordinate, so both
    the homography evaluation and the 2px screen-space low-pass floor live
    in the same (pinhole) frame. Returns w (K, P).
    """
    px = px_xy[None, :, 0]                            # (1, P)
    py = px_xy[None, :, 1]
    # h_u = -M[0] + M[2] * x ; h_v = -M[1] + M[2] * y   (oracle :160-165)
    h_u = -M[:, None, 0, :] + M[:, None, 2, :] * px[..., None]   # (K, P, 3)
    h_v = -M[:, None, 1, :] + M[:, None, 2, :] * py[..., None]
    tmp = jnp.cross(h_u, h_v)
    denom = jnp.where(jnp.abs(tmp[..., 2]) > 1e-12, tmp[..., 2], 1e-12)
    us = tmp[..., 0] / denom
    vs = tmp[..., 1] / denom
    sigma3d = us ** 2 + vs ** 2
    dx = px - means2d[:, 0:1]
    dy = py - means2d[:, 1:2]
    sigma2d = 2.0 * (dx ** 2 + dy ** 2)
    sigma = 0.5 * jnp.minimum(sigma3d, sigma2d)        # (K, P)

    alpha = jnp.minimum(0.999, opacities[:, None] * jnp.exp(-sigma))
    keep = (alpha >= ALPHA_THRESHOLD) & live[:, None]
    alpha = jnp.where(keep, alpha, 0.0)

    lg = jnp.log1p(-alpha)
    T_before = jnp.exp(jnp.cumsum(lg, axis=0) - lg)
    tripped = (T_before * (1.0 - alpha) <= T_EPS) & (alpha > 0)
    stopped = jnp.cumsum(tripped, axis=0) > 0
    return jnp.where(stopped, 0.0, alpha * T_before)


def _blend_tile_2dgs(M, means2d, colors, opacities, live, px_xy):
    """Blend K depth-ordered surfels into one tile's pixels.

    colors (K, D) (normals may ride as channels). Returns (out (P, D),
    alpha (P,))."""
    w = _tile_weights_2dgs(M, means2d, opacities, live, px_xy)
    out = jnp.einsum("kp,kd->pd", w, colors, precision="highest")
    return out, jnp.sum(w, axis=0)


def _undistort_pixel_map(K, width_pad: int, height_pad: int,
                         camera_model: str, radial, tangential):
    """Pinhole-equivalent pixel coordinate for every (padded) pixel center.

    The ray through a distorted pixel equals the pinhole ray through its
    undistorted coordinate, so the surfel plane-intersection homography
    (built for the pinhole K) is EXACT when evaluated there — distortion
    only changes where each ray lands on screen, not the ray itself.
    Returns (Hp, Wp, 2).
    """
    from . import cameras as cam

    gy, gx = jnp.meshgrid(
        jnp.arange(height_pad, dtype=jnp.float32) + 0.5,
        jnp.arange(width_pad, dtype=jnp.float32) + 0.5, indexing="ij")
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    xd = (gx - cx) / fx
    yd = (gy - cy) / fy
    xy_d = jnp.stack([xd, yd], -1)
    if camera_model == "fisheye":
        rd = jnp.maximum(jnp.linalg.norm(xy_d, axis=-1), 1e-12)
        theta = cam._invert_fisheye_theta(rd, radial)
        xy_u = xy_d * (jnp.tan(theta) / rd)[..., None]
    else:  # opencv pinhole distortion
        rad = radial if radial is not None else jnp.zeros((1,), jnp.float32)
        xy_u = cam.undistort_opencv(xy_d, rad, tangential)
    return jnp.stack([fx * xy_u[..., 0] + cx, fy * xy_u[..., 1] + cy], -1)


def _prep_camera_2dgs(means, quats, scales, colors, viewmat, K,
                      width, height, near_plane, far_plane, quat_order,
                      camera_model, radial, tangential, sh_degree,
                      tile_size, tw, th):
    """Shared per-camera projection/undistortion setup for render + indices.

    Returns (m2d, dep, Mrt, nrm, rad, col, und_map, m2d_bin): m2d stays the
    PINHOLE conic center (evaluation frame); m2d_bin is the center to BIN
    around (the distorted projection when distorted, else m2d); und_map maps
    padded pixels to their pinhole-equivalent coords (None when pinhole).
    """
    from . import cameras as cam

    proj = fully_fused_projection_2dgs(
        means, quats, scales, viewmat[None], K[None], width, height,
        near_plane=near_plane, far_plane=far_plane, quat_order=quat_order)
    m2d = proj.means2d[0]
    dep = proj.depths[0]
    Mrt = proj.ray_transforms[0]
    nrm = proj.normals[0]
    rad = proj.radii[0]

    distorted = (camera_model != "pinhole" or radial is not None
                 or tangential is not None)
    und_map = None
    m2d_bin = m2d
    if distorted:
        # bin around the conic center SHIFTED by the local distortion
        # displacement (distorted vs pinhole projection of the 3D mean):
        # exact when coeffs are zero, first-order correct under mild
        # distortion. Binning-only approximation — per-pixel evaluation
        # stays exact via the undistorted-coordinate map.
        means_c = (jnp.einsum("ij,nj->ni", viewmat[:3, :3], means)
                   + viewmat[:3, 3][None])
        m2d_d = cam.camera_project(means_c, K, camera_model=camera_model,
                                   radial=radial, tangential=tangential)
        z = jnp.maximum(means_c[..., 2], 1e-8)
        xy = means_c[..., :2] / z[..., None]
        u_pin = jnp.stack([K[0, 0] * xy[..., 0] + K[0, 2],
                           K[1, 1] * xy[..., 1] + K[1, 2]], -1)
        delta = m2d_d - u_pin
        delta = jnp.where(jnp.isfinite(delta), delta, 0.0)
        m2d_bin = m2d + delta
        und_map = _undistort_pixel_map(K, tw * tile_size, th * tile_size,
                                       camera_model, radial, tangential)

    if sh_degree is not None:
        from ..utils import sh as sh_utils
        cam_t = -jnp.einsum("ij,i->j", viewmat[:3, :3], viewmat[:3, 3],
                            precision="highest")
        dirs = means - cam_t[None, :]
        dirs = dirs / jnp.maximum(
            jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-8)
        col = sh_utils.eval_sh(sh_degree, jnp.swapaxes(colors, -1, -2), dirs)
        col = jnp.clip(col + 0.5, 0.0, None)
    else:
        col = colors
    return m2d, dep, Mrt, nrm, rad, col, und_map, m2d_bin


@partial(jax.jit, static_argnames=(
    "width", "height", "tile_size", "render_mode", "max_per_tile",
    "max_tiles_per_gauss", "quat_order", "camera_model", "sh_degree"))
def rasterize_2dgs(
    means: jnp.ndarray, quats: jnp.ndarray, scales: jnp.ndarray,
    opacities: jnp.ndarray, colors: jnp.ndarray,
    viewmats: jnp.ndarray, Ks: jnp.ndarray,
    width: int, height: int,
    tile_size: int = 16,
    render_mode: str = "RGB+ED",
    near_plane: float = 0.01, far_plane: float = 1e10,
    max_per_tile: int = 1024, max_tiles_per_gauss: int = 9,
    quat_order: str = "xyzw",
    camera_model: str = "pinhole",
    radial_coeffs=None,        # (C, k) opencv / fisheye distortion
    tangential_coeffs=None,    # (C, 2)
    sh_degree=None,            # colors (N, K_sh, 3) when set
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """2DGS rasterization. Returns (render_colors (C,H,W,D[+1]),
    render_alphas (C,H,W,1), render_normals (C,H,W,3)).

    Distorted cameras (camera_model="fisheye" or opencv radial/tangential
    coeffs): the surfel homography is evaluated at each pixel's
    pinhole-equivalent (undistorted) coordinate — exact plane intersection,
    reference has no 2DGS analogue (its UT path is 3DGS-only,
    ProjectionUT3DGSFused.cu) — while tile binning uses the distorted
    centers with 1.5x-inflated pinhole extents (approximation, binning only).
    """
    tw = (width + tile_size - 1) // tile_size
    th = (height + tile_size - 1) // tile_size
    P = tile_size * tile_size
    n_pairs = means.shape[0] * max_tiles_per_gauss
    max_per_tile = min(max_per_tile, -(-n_pairs // 512) * 512)

    py, px = jnp.meshgrid(jnp.arange(tile_size), jnp.arange(tile_size),
                          indexing="ij")
    local_xy = jnp.stack([px.reshape(-1), py.reshape(-1)],
                         -1).astype(jnp.float32) + 0.5

    def per_camera(viewmat, K, rad_c, tang_c):
        m2d, dep, Mrt, nrm, rad, col, und_map, m2d_bin = _prep_camera_2dgs(
            means, quats, scales, colors, viewmat, K, width, height,
            near_plane, far_plane, quat_order, camera_model, rad_c, tang_c,
            sh_degree, tile_size, tw, th)

        if render_mode in ("RGB+D", "RGB+ED"):
            col = jnp.concatenate([col, dep[..., None]], -1)
        elif render_mode in ("D", "ED"):
            col = dep[..., None]
        col = jnp.concatenate([col, nrm], -1)  # normals ride as channels

        bins = tiles.bin_gaussians(m2d_bin, rad, dep, tile_size, tw, th,
                                   max_tiles_per_gauss, max_per_tile)

        def tile_fn(tile_idx, tile_gauss, tile_count):
            origin = jnp.stack([(tile_idx % tw) * tile_size,
                                (tile_idx // tw) * tile_size]).astype(jnp.float32)
            live = jnp.arange(bins.gauss_ids.shape[1],
                              dtype=jnp.int32) < tile_count
            if und_map is None:
                pxy = local_xy + origin[None]
            else:
                ty, tx = tile_idx // tw, tile_idx % tw
                pxy = lax.dynamic_slice(
                    und_map, (ty * tile_size, tx * tile_size, 0),
                    (tile_size, tile_size, 2)).reshape(P, 2)
            return _blend_tile_2dgs(Mrt[tile_gauss], m2d[tile_gauss],
                                    col[tile_gauss], opacities[tile_gauss],
                                    live, pxy)

        tile_index = jnp.arange(tw * th, dtype=jnp.int32)
        out_t, a_t = lax.map(lambda args: tile_fn(*args),
                             (tile_index, bins.gauss_ids, bins.counts))
        D = col.shape[-1]
        out_t = out_t.reshape(th, tw, tile_size, tile_size, D)
        a_t = a_t.reshape(th, tw, tile_size, tile_size)
        img = out_t.transpose(0, 2, 1, 3, 4).reshape(
            th * tile_size, tw * tile_size, D)[:height, :width]
        a = a_t.transpose(0, 2, 1, 3).reshape(
            th * tile_size, tw * tile_size)[:height, :width, None]
        return img, a

    C = viewmats.shape[0]
    rad_all = (radial_coeffs if radial_coeffs is not None
               else jnp.zeros((C, 0), jnp.float32))
    tang_all = (tangential_coeffs if tangential_coeffs is not None
                else jnp.zeros((C, 0), jnp.float32))

    def percam_args(args):
        viewmat, K, rc, tc = args
        return per_camera(viewmat, K,
                          rc if radial_coeffs is not None else None,
                          tc if tangential_coeffs is not None else None)

    # static unroll beats lax.map ~4x on TPU for small C (scan carries copy
    # the multi-MB sorted lists across iterations — see ops/rasterizer.py)
    if C <= 16:
        outs = [percam_args((viewmats[c], Ks[c], rad_all[c], tang_all[c]))
                for c in range(C)]
        out = jnp.stack([o[0] for o in outs])
        alphas = jnp.stack([o[1] for o in outs])
    else:
        out, alphas = lax.map(percam_args, (viewmats, Ks, rad_all, tang_all))
    render_normals = out[..., -3:]
    out = out[..., :-3]
    if render_mode in ("ED", "RGB+ED"):
        out = jnp.concatenate(
            [out[..., :-1], out[..., -1:] / jnp.maximum(alphas, 1e-10)], -1)
    return out, alphas, render_normals


@partial(jax.jit, static_argnames=(
    "width", "height", "k", "tile_size", "max_per_tile",
    "max_tiles_per_gauss", "quat_order", "camera_model"))
def rasterize_to_indices_2dgs(
    means: jnp.ndarray, quats: jnp.ndarray, scales: jnp.ndarray,
    opacities: jnp.ndarray, viewmats: jnp.ndarray, Ks: jnp.ndarray,
    width: int, height: int, k: int = 8,
    tile_size: int = 16,
    near_plane: float = 0.01, far_plane: float = 1e10,
    max_per_tile: int = 1024, max_tiles_per_gauss: int = 9,
    quat_order: str = "xyzw",
    camera_model: str = "pinhole",
    radial_coeffs=None, tangential_coeffs=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pixel surfel-index enumeration (gsplat
    rasterize_to_indices_in_range_2dgs, reference
    csrc/RasterizeToIndices2DGS.cu:296 — pruning/analysis).

    Static-shape reformulation like the 3DGS variant
    (rasterizer.rasterize_to_indices): per pixel the top-`k` contributing
    surfels by blend weight. Returns (ids (C, H, W, k) int32 with -1
    padding, weights (C, H, W, k) f32).
    """
    tw = (width + tile_size - 1) // tile_size
    th = (height + tile_size - 1) // tile_size
    P = tile_size * tile_size
    n_pairs = means.shape[0] * max_tiles_per_gauss
    max_per_tile = min(max_per_tile, -(-n_pairs // 512) * 512)

    py, px = jnp.meshgrid(jnp.arange(tile_size), jnp.arange(tile_size),
                          indexing="ij")
    local_xy = jnp.stack([px.reshape(-1), py.reshape(-1)],
                         -1).astype(jnp.float32) + 0.5

    def per_camera(viewmat, K, rad_c, tang_c):
        m2d, dep, Mrt, _, rad, _, und_map, m2d_bin = _prep_camera_2dgs(
            means, quats, scales, None, viewmat, K, width, height,
            near_plane, far_plane, quat_order, camera_model, rad_c, tang_c,
            None, tile_size, tw, th)
        bins = tiles.bin_gaussians(m2d_bin, rad, dep, tile_size, tw, th,
                                   max_tiles_per_gauss, max_per_tile)

        def tile_fn(tile_idx, tile_gauss, tile_count):
            origin = jnp.stack([(tile_idx % tw) * tile_size,
                                (tile_idx // tw) * tile_size]).astype(jnp.float32)
            live = jnp.arange(bins.gauss_ids.shape[1],
                              dtype=jnp.int32) < tile_count
            if und_map is None:
                pxy = local_xy + origin[None]
            else:
                ty, tx = tile_idx // tw, tile_idx % tw
                pxy = lax.dynamic_slice(
                    und_map, (ty * tile_size, tx * tile_size, 0),
                    (tile_size, tile_size, 2)).reshape(P, 2)
            w = _tile_weights_2dgs(Mrt[tile_gauss], m2d[tile_gauss],
                                   opacities[tile_gauss], live, pxy)
            vals, idx = lax.top_k(w.T, k)                     # (P, k)
            ids = jnp.where(vals > 0, tile_gauss[idx], -1)
            return ids, vals

        tile_index = jnp.arange(tw * th, dtype=jnp.int32)
        ids_t, w_t = lax.map(lambda args: tile_fn(*args),
                             (tile_index, bins.gauss_ids, bins.counts))
        ids_t = ids_t.reshape(th, tw, tile_size, tile_size, k)
        w_t = w_t.reshape(th, tw, tile_size, tile_size, k)
        ids_img = ids_t.transpose(0, 2, 1, 3, 4).reshape(
            th * tile_size, tw * tile_size, k)[:height, :width]
        w_img = w_t.transpose(0, 2, 1, 3, 4).reshape(
            th * tile_size, tw * tile_size, k)[:height, :width]
        return ids_img, w_img

    C = viewmats.shape[0]
    rad_all = (radial_coeffs if radial_coeffs is not None
               else jnp.zeros((C, 0), jnp.float32))
    tang_all = (tangential_coeffs if tangential_coeffs is not None
                else jnp.zeros((C, 0), jnp.float32))

    def percam_args(args):
        viewmat, K, rc, tc = args
        return per_camera(viewmat, K,
                          rc if radial_coeffs is not None else None,
                          tc if tangential_coeffs is not None else None)

    if C <= 16:  # see unroll note above
        outs = [percam_args((viewmats[c], Ks[c], rad_all[c], tang_all[c]))
                for c in range(C)]
        return tuple(jnp.stack([o[i] for o in outs]) for i in range(2))
    return lax.map(percam_args, (viewmats, Ks, rad_all, tang_all))
