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


def _blend_tile_2dgs(M, means2d, colors, opacities, live, px_xy):
    """Blend K depth-ordered surfels into one tile's pixels.

    M (K, 3, 3) ray transforms, means2d (K, 2), colors (K, D) (normals may be
    concatenated as channels), opacities (K,), px_xy (P, 2).
    Returns (out (P, D), alpha (P,)).
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
    w = jnp.where(stopped, 0.0, alpha * T_before)

    out = jnp.einsum("kp,kd->pd", w, colors, precision="highest")
    return out, jnp.sum(w, axis=0)


@partial(jax.jit, static_argnames=(
    "width", "height", "tile_size", "render_mode", "max_per_tile",
    "max_tiles_per_gauss", "quat_order"))
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
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """2DGS rasterization. Returns (render_colors (C,H,W,D[+1]),
    render_alphas (C,H,W,1), render_normals (C,H,W,3))."""
    tw = (width + tile_size - 1) // tile_size
    th = (height + tile_size - 1) // tile_size
    P = tile_size * tile_size
    n_pairs = means.shape[0] * max_tiles_per_gauss
    max_per_tile = min(max_per_tile, -(-n_pairs // 512) * 512)

    py, px = jnp.meshgrid(jnp.arange(tile_size), jnp.arange(tile_size),
                          indexing="ij")
    local_xy = jnp.stack([px.reshape(-1), py.reshape(-1)],
                         -1).astype(jnp.float32) + 0.5

    def per_camera(viewmat, K):
        proj = fully_fused_projection_2dgs(
            means, quats, scales, viewmat[None], K[None], width, height,
            near_plane=near_plane, far_plane=far_plane, quat_order=quat_order)
        m2d = proj.means2d[0]
        dep = proj.depths[0]
        Mrt = proj.ray_transforms[0]
        nrm = proj.normals[0]
        rad = proj.radii[0]  # (N, 2) per-axis extents, as bin_gaussians wants

        col = colors
        if render_mode in ("RGB+D", "RGB+ED"):
            col = jnp.concatenate([col, dep[..., None]], -1)
        elif render_mode in ("D", "ED"):
            col = dep[..., None]
        col = jnp.concatenate([col, nrm], -1)  # normals ride as channels

        bins = tiles.bin_gaussians(m2d, rad, dep, tile_size, tw, th,
                                   max_tiles_per_gauss, max_per_tile)

        def tile_fn(tile_idx, tile_gauss, tile_count):
            origin = jnp.stack([(tile_idx % tw) * tile_size,
                                (tile_idx // tw) * tile_size]).astype(jnp.float32)
            live = jnp.arange(bins.gauss_ids.shape[1],
                              dtype=jnp.int32) < tile_count
            return _blend_tile_2dgs(Mrt[tile_gauss], m2d[tile_gauss],
                                    col[tile_gauss], opacities[tile_gauss],
                                    live, local_xy + origin[None])

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

    out, alphas = lax.map(lambda args: per_camera(*args), (viewmats, Ks))
    render_normals = out[..., -3:]
    out = out[..., :-3]
    if render_mode in ("ED", "RGB+ED"):
        out = jnp.concatenate(
            [out[..., :-1], out[..., -1:] / jnp.maximum(alphas, 1e-10)], -1)
    return out, alphas, render_normals
