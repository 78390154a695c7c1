"""Tile-based 3D Gaussian rasterization, TPU-native formulation.

Replaces gsplat's CUDA pipeline (reference gsplat/rendering.py:33-720 and
csrc/RasterizeToPixels3DGSFwd/Bwd.cu) with:

  projection (ops/projection.py, plain JAX)
    -> tile binning (ops/tiles.py, lex-sort + dense gather, static shapes)
    -> per-tile blending, reformulated for the VPU/MXU:
         alpha_i = min(0.999, op_i * exp(-sigma_i))        (VPU)
         T_i     = exclusive-cumprod(1 - alpha)            (VPU cumsum in log)
         w_i     = alpha_i * T_i * live_i                  (VPU)
         out     = w^T @ colors                            (MXU matmul)
       The CUDA kernel's sequential per-splat loop with early exit becomes a
       closed-form masked prefix product — identical numerics (see
       rasterizer_ref.py for the proof sketch), but data-parallel.

The `impl="jax"` path below runs this formulation via a scanned vmap (works
on CPU; autodiff gives the backward). `impl="pallas"` (rasterizer_pallas.py)
is the hand-tiled VMEM kernel with a custom VJP. Both share the binning.

Render modes mirror gsplat: "RGB", "RGB+ED" (expected depth = accumulated
depth / alpha, rendering.py:760-766).
"""

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from . import projection, tiles
from .rasterizer_ref import ALPHA_THRESHOLD, T_EPS


def _blend_tile(means2d, conics, colors, opacities, live, px_xy):
    """Blend K depth-ordered gaussians into one tile's pixels.

    Args:
      means2d (K, 2), conics (K, 3), colors (K, D), opacities (K,),
      live (K,) bool, px_xy (P, 2) global pixel centers.
    Returns:
      (out (P, D), alpha (P,)).
    """
    dx = px_xy[None, :, 0] - means2d[:, 0:1]   # (K, P)
    dy = px_xy[None, :, 1] - means2d[:, 1:2]
    sigma = (0.5 * (conics[:, 0:1] * dx * dx + conics[:, 2:3] * dy * dy)
             + conics[:, 1:2] * dx * dy)
    alpha = jnp.minimum(0.999, opacities[:, None] * jnp.exp(-sigma))
    keep = (sigma >= 0) & (alpha >= ALPHA_THRESHOLD) & live[:, None]
    alpha = jnp.where(keep, alpha, 0.0)

    # log-space prefix product: cumsum has a cheap transpose rule, while
    # cumprod's VJP makes XLA compile time explode superlinearly in K
    # (measured 16s -> 137s going K=512 -> 1024 for the grad at this shape)
    lg = jnp.log1p(-alpha)
    cum_incl = jnp.cumsum(lg, axis=0)
    T_before = jnp.exp(cum_incl - lg)
    T_after = T_before * (1.0 - alpha)

    # monotone-T early stop: T only decreases, so "an earlier entry tripped
    # (T_after <= T_EPS)" is equivalent to this entry's own T_after <= T_EPS
    # — no cumulative trip scan needed (matches the Pallas kernels)
    w = jnp.where(T_after > T_EPS, alpha * T_before, 0.0)  # (K, P)

    out = jnp.einsum("kp,kd->pd", w, colors, precision="highest")
    return out, jnp.sum(w, axis=0)


def rasterize_binned_jax(
    means2d: jnp.ndarray, conics: jnp.ndarray, colors: jnp.ndarray,
    opacities: jnp.ndarray, bins: tiles.TileBins,
    width: int, height: int, tile_size: int,
    tile_batch: int = 8,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rasterize one camera from dense tile bins (scan over tile batches)."""
    tw = (width + tile_size - 1) // tile_size
    th = (height + tile_size - 1) // tile_size
    n_tiles = tw * th
    K = bins.gauss_ids.shape[1]
    D = colors.shape[-1]
    P = tile_size * tile_size

    # Local pixel offsets within a tile (+0.5 center).
    py, px = jnp.meshgrid(jnp.arange(tile_size), jnp.arange(tile_size), indexing="ij")
    local_xy = jnp.stack([px.reshape(-1), py.reshape(-1)], -1).astype(jnp.float32) + 0.5

    pad = (-n_tiles) % tile_batch
    ids = jnp.concatenate([bins.gauss_ids,
                           jnp.zeros((pad, K), jnp.int32)]) if pad else bins.gauss_ids
    counts = jnp.concatenate([bins.counts,
                              jnp.zeros((pad,), jnp.int32)]) if pad else bins.counts
    tile_index = jnp.arange(n_tiles + pad, dtype=jnp.int32)

    def tile_fn(tile_idx, tile_gauss, tile_count):
        origin = jnp.stack([(tile_idx % tw) * tile_size,
                            (tile_idx // tw) * tile_size]).astype(jnp.float32)
        live = jnp.arange(K, dtype=jnp.int32) < tile_count
        m = means2d[tile_gauss]
        c = conics[tile_gauss]
        col = colors[tile_gauss]
        op = opacities[tile_gauss]
        return _blend_tile(m, c, col, op, live, local_xy + origin[None])

    def batch_fn(_, batch):
        idxs, gids, cnts = batch
        out, a = jax.vmap(tile_fn)(idxs, gids, cnts)
        return None, (out, a)

    _, (out_tiles, alpha_tiles) = lax.scan(
        batch_fn, None,
        (tile_index.reshape(-1, tile_batch),
         ids.reshape(-1, tile_batch, K),
         counts.reshape(-1, tile_batch)))

    out_tiles = out_tiles.reshape(-1, P, D)[:n_tiles]
    alpha_tiles = alpha_tiles.reshape(-1, P)[:n_tiles]
    out_tiles = out_tiles.reshape(th, tw, tile_size, tile_size, D)
    alpha_tiles = alpha_tiles.reshape(th, tw, tile_size, tile_size)
    img = out_tiles.transpose(0, 2, 1, 3, 4).reshape(th * tile_size, tw * tile_size, D)
    alpha = alpha_tiles.transpose(0, 2, 1, 3).reshape(th * tile_size, tw * tile_size)
    return img[:height, :width], alpha[:height, :width, None]


def _blend_tile_world(means, iscl_rots, colors, opacities, live,
                      ray_o, ray_d):
    """World-space (eval3d) blend: each Gaussian is evaluated at its closest
    approach to the pixel ray in its own normalized frame (reference
    RasterizeToPixelsFromWorld3DGSFwd.cu:249-276).

    Args:
      means (K, 3), iscl_rots (K, 3, 3) = diag(1/s) R^T, colors (K, D),
      opacities (K,), live (K,), ray_o (3,) — or (P, 3) per-pixel origins
      under a rolling shutter — and ray_d (P, 3) world unit dirs.
    Returns (out (P, D), alpha (P,)).
    """
    if ray_o.ndim == 1:
        gro = jnp.einsum("kij,kj->ki", iscl_rots, ray_o[None] - means,
                         precision="highest")[:, None, :]      # (K, 1, 3)
    else:
        gro = jnp.einsum("kij,kpj->kpi", iscl_rots,
                         ray_o[None] - means[:, None, :],
                         precision="highest")                  # (K, P, 3)
    grd = jnp.einsum("kij,pj->kpi", iscl_rots, ray_d,
                     precision="highest")                      # (K, P, 3)
    grd = grd / jnp.maximum(
        jnp.linalg.norm(grd, axis=-1, keepdims=True), 1e-12)
    cr = jnp.cross(grd, gro)                                   # (K, P, 3)
    gray_dist = jnp.sum(cr * cr, axis=-1)                      # (K, P)

    alpha = jnp.minimum(0.999, opacities[:, None] * jnp.exp(-0.5 * gray_dist))
    keep = (alpha >= ALPHA_THRESHOLD) & live[:, None]
    alpha = jnp.where(keep, alpha, 0.0)

    lg = jnp.log1p(-alpha)
    T_before = jnp.exp(jnp.cumsum(lg, axis=0) - lg)
    T_after = T_before * (1.0 - alpha)
    # monotone-T early stop (see _blend_tile)
    w = jnp.where(T_after > T_EPS, alpha * T_before, 0.0)

    out = jnp.einsum("kp,kd->pd", w, colors, precision="highest")
    return out, jnp.sum(w, axis=0)


def rasterize_binned_world_jax(
    means: jnp.ndarray, iscl_rots: jnp.ndarray, colors: jnp.ndarray,
    opacities: jnp.ndarray, bins: tiles.TileBins,
    ray_o: jnp.ndarray, ray_dirs: jnp.ndarray,
    width: int, height: int, tile_size: int,
    tile_batch: int = 8,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """World-space rasterization from dense tile bins.

    `ray_dirs` is (th*ts, tw*ts, 3) — unit world dirs for the PADDED pixel
    grid; binning (by UT/EWA-projected footprints) is shared with the 2D path.
    """
    tw = (width + tile_size - 1) // tile_size
    th = (height + tile_size - 1) // tile_size
    n_tiles = tw * th
    K = bins.gauss_ids.shape[1]
    D = colors.shape[-1]
    P = tile_size * tile_size

    def to_tile_major(grid):     # (H_pad, W_pad, 3) -> (n_tiles, P, 3)
        g = grid.reshape(th, tile_size, tw, tile_size, 3)
        return g.transpose(0, 2, 1, 3, 4).reshape(n_tiles, P, 3)

    rays = to_tile_major(ray_dirs)
    # per-pixel origins (rolling shutter) ride the same tile layout
    origs = to_tile_major(ray_o) if ray_o.ndim == 3 else None

    pad = (-n_tiles) % tile_batch
    ids = jnp.concatenate([bins.gauss_ids,
                           jnp.zeros((pad, K), jnp.int32)]) if pad else bins.gauss_ids
    counts = jnp.concatenate([bins.counts,
                              jnp.zeros((pad,), jnp.int32)]) if pad else bins.counts
    rays_p = jnp.concatenate([rays, jnp.zeros((pad, P, 3))]) if pad else rays
    origs_p = None if origs is None else (
        jnp.concatenate([origs, jnp.zeros((pad, P, 3))]) if pad else origs)

    def tile_fn(tile_gauss, tile_count, tile_rays, tile_orig):
        live = jnp.arange(K, dtype=jnp.int32) < tile_count
        o = ray_o if tile_orig is None else tile_orig
        return _blend_tile_world(means[tile_gauss], iscl_rots[tile_gauss],
                                 colors[tile_gauss], opacities[tile_gauss],
                                 live, o, tile_rays)

    def batch_fn(_, batch):
        gids, cnts, rys, orgs = batch
        out, a = jax.vmap(tile_fn)(gids, cnts, rys, orgs)
        return None, (out, a)

    _, (out_tiles, alpha_tiles) = lax.scan(
        batch_fn, None,
        (ids.reshape(-1, tile_batch, K),
         counts.reshape(-1, tile_batch),
         rays_p.reshape(-1, tile_batch, P, 3),
         None if origs_p is None else origs_p.reshape(-1, tile_batch, P, 3)))

    out_tiles = out_tiles.reshape(-1, P, D)[:n_tiles]
    alpha_tiles = alpha_tiles.reshape(-1, P)[:n_tiles]
    out_tiles = out_tiles.reshape(th, tw, tile_size, tile_size, D)
    alpha_tiles = alpha_tiles.reshape(th, tw, tile_size, tile_size)
    img = out_tiles.transpose(0, 2, 1, 3, 4).reshape(
        th * tile_size, tw * tile_size, D)
    alpha = alpha_tiles.transpose(0, 2, 1, 3).reshape(
        th * tile_size, tw * tile_size)
    return img[:height, :width], alpha[:height, :width, None]


@partial(jax.jit, static_argnames=(
    "width", "height", "tile_size", "render_mode", "max_per_tile",
    "max_tiles_per_gauss", "impl", "calc_compensations", "quat_order",
    "camera_model", "with_eval3d", "ftheta_coeffs", "rolling_shutter",
    "ut_params", "radius_clip", "camera_batch", "payload_f16", "slot_fracs",
    "tight_radius", "exact_tile_test"))
def _rasterize_jit(
    means: jnp.ndarray,      # (N, 3) world-space
    quats: jnp.ndarray,      # (N, 4) — `quat_order` selects XYZW (framework
                             # default) or WXYZ (gsplat/3DGS-PLY convention)
    scales: jnp.ndarray,     # (N, 3)
    opacities: jnp.ndarray,  # (N,)
    colors: jnp.ndarray,     # (N, D) or (N, K_sh, 3) if sh_degree given
    viewmats: jnp.ndarray,   # (C, 4, 4) world->cam
    Ks: jnp.ndarray,         # (C, 3, 3)
    width: int, height: int,
    tile_size: int = 16,
    render_mode: str = "RGB+ED",
    eps2d: float = 0.3,
    near_plane: float = 0.01,
    far_plane: float = 1e10,
    max_per_tile: int = 1024,
    max_tiles_per_gauss: int = 9,
    impl: str = "jax",
    calc_compensations: bool = False,
    quat_order: str = "xyzw",
    camera_model: str = "pinhole",
    radial_coeffs: Optional[jnp.ndarray] = None,      # (C, k) distortion
    tangential_coeffs: Optional[jnp.ndarray] = None,  # (C, 2)
    ftheta_coeffs=None,  # cameras.FThetaParams, shared across cameras
    with_eval3d: bool = False,
    rolling_shutter: str = "global",  # cameras.SHUTTER_* scan order
    viewmats_rs: Optional[jnp.ndarray] = None,  # (C, 4, 4) end-of-frame pose
    ut_params=None,  # cameras.UTParams overriding the Merwe defaults
    radius_clip: float = 0.0,  # cull footprints with max radius <= this
    abs_tap: Optional[jnp.ndarray] = None,  # (N, 2) zeros; grad w.r.t. it is
                                            # the AbsGS absgrad (pallas impl)
    camera_batch: bool = False,  # pallas INFERENCE fast path: one isect sort
                                 # + one kernel launch for all C cameras
                                 # (forward-only, no VJP — see
                                 # rasterize_flat_pallas_multi)
    payload_f16: bool = False,   # pack conics/opacity/colors as f16 pairs in
                                 # the isect sort (sort operands 12 -> 8,
                                 # 18.4 -> ~11 ms/cam); ~1e-3 output delta —
                                 # inference knob, keep False for parity /
                                 # training (bwd replays exact f32)
    slot_fracs=None,             # coverage-scheduled binning (pallas impl):
                                 # "auto" or per-slot prefix fractions —
                                 # ~4x fewer isect-sort rows (see
                                 # tiles.bin_gaussians_packed_prefix);
                                 # inference knob like payload_f16
    tight_radius: bool = True,   # shrink binning radii to the alpha>=1/255
                                 # level set (tiles.opacity_tight_radii) —
                                 # EXACT (bit-identical renders+grads) and
                                 # the reference's own default
                                 # (gsplat rendering.py:388)
    exact_tile_test: bool = True,  # exact ellipse-tile overlap mask in
                                 # binning (tiles.conic_test_planes): drops
                                 # AABB cells outside the alpha>=1/255 level
                                 # set — EXACT like tight_radius, and a
                                 # genuine improvement over gsplat's AABB
                                 # test (IntersectTile.cu). Ignored by the
                                 # eval3d path (world-space blend has no
                                 # exact 2D conic).
) -> Tuple[jnp.ndarray, jnp.ndarray, Dict]:
    """gsplat.rasterization equivalent (dense single-batch layout).

    camera_model "fisheye" or any distortion coeffs switch projection to the
    unscented transform (ops/cameras.py, reference ProjectionUT3DGSFused.cu);
    the tile pipeline downstream is shared.

    `with_eval3d=True` evaluates each Gaussian in world space at its closest
    approach to the per-pixel camera ray (reference
    RasterizeToPixelsFromWorld3DGSFwd.cu) instead of via the projected 2D
    conic — exact under distortion/fisheye where the EWA footprint is only a
    binning approximation.

    Returns (render_colors (C, H, W, D[+1]), render_alphas (C, H, W, 1), meta).
    """
    if impl == "pallas" and jax.default_backend() != "tpu":
        # the Pallas kernel only lowers on TPU (CPU would need interpret
        # mode, ~100x slower); the jax path is parity-tested identical
        impl = "jax"
    if abs_tap is not None and (impl != "pallas" or with_eval3d):
        # only the flat Pallas backward computes the AbsGS tap; every other
        # path would silently return a zero cotangent and starve an
        # absgrad-driven densifier
        raise ValueError(
            "abs_tap is only differentiable with impl='pallas' on TPU "
            f"(got impl={impl!r}, with_eval3d={with_eval3d}, "
            f"backend={jax.default_backend()!r}); drop abs_tap or use the "
            "mean-gradient densification signal instead")
    if quat_order == "wxyz":
        quats = quats[..., jnp.array([1, 2, 3, 0])]

    tw = (width + tile_size - 1) // tile_size
    th = (height + tile_size - 1) // tile_size

    # A tile can never hold more than every (gaussian, tile) pair; clamping
    # keeps small scenes from paying the full static cap (rounded up so the
    # Pallas chunking still divides evenly).
    n_pairs = means.shape[0] * max_tiles_per_gauss
    max_per_tile = min(max_per_tile, -(-n_pairs // 512) * 512)

    # Project, color, bin, and blend one camera at a time inside a lax.map:
    # for N ~ 1M gaussians the dense [C, N, 3, 3] intermediates of an
    # all-camera projection dominate HBM, and XLA reuses the single-camera
    # buffers across map iterations.
    use_ut = (camera_model != "pinhole" or radial_coeffs is not None
              or tangential_coeffs is not None or rolling_shutter != "global")
    # UT needs the (N, 3, 3) matrix form (per-splat Cholesky); the pinhole EWA
    # path takes the 6-plane tuple — the matrix form's trailing (3, 3) pads to
    # an (8, 128) TPU tile and costs ~50 ms/M splats of pure HBM traffic.
    covars = (projection.quat_scale_to_covar(quats, scales) if use_ut
              else projection.quat_scale_to_covar_planes(quats, scales))

    iscl_rots = None
    if with_eval3d:
        # diag(1/s) R(q)^T per splat (reference ...FromWorld3DGSFwd.cu:219-236)
        from ..utils.rotation import quat_to_rotmat
        Rg = quat_to_rotmat(
            quats / jnp.linalg.norm(quats, axis=-1, keepdims=True))
        iscl_rots = jnp.swapaxes(Rg, -1, -2) / \
            jnp.maximum(scales, 1e-12)[..., :, None]

    if (camera_batch and impl == "pallas" and not use_ut and not with_eval3d
            and abs_tap is None):
        # Batched-camera inference path: project all cameras in one SoA call,
        # then ONE global isect sort + ONE Pallas launch. Rationale: TPU
        # lax.sort cost is flat in row count (tools/sort_ab.py: 39-49 ms from
        # 1M to 4.2M rows), so C per-camera sorts cost ~C x one batched sort.
        from .rasterizer_pallas import rasterize_flat_pallas_multi

        proj = projection.fully_fused_projection(
            means, covars, viewmats, Ks, width, height, eps2d=eps2d,
            near_plane=near_plane, far_plane=far_plane,
            calc_compensations=calc_compensations, radius_clip=radius_clip)
        op_all = (opacities[None] * proj.compensations
                  if proj.compensations is not None
                  else jnp.broadcast_to(opacities[None],
                                        proj.depths.shape))
        radii_all = (tiles.opacity_tight_radii(proj.radii, op_all)
                     if tight_radius else proj.radii)

        if colors.ndim == 2:
            col_all = jnp.broadcast_to(colors[None],
                                       (viewmats.shape[0],) + colors.shape)
        else:
            from ..utils import sh as sh_utils
            cam_t = -jnp.einsum("cij,ci->cj", viewmats[:, :3, :3],
                                viewmats[:, :3, 3], precision="highest")
            dirs = means[None] - cam_t[:, None, :]
            dirs = dirs / jnp.maximum(
                jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-8)
            deg = int(colors.shape[-2] ** 0.5) - 1
            col_all = jax.vmap(lambda d: sh_utils.eval_sh(
                deg, jnp.swapaxes(colors, -1, -2), d))(dirs)
            col_all = jnp.clip(col_all + 0.5, 0.0, None)
        if render_mode in ("RGB+D", "RGB+ED"):
            col_all = jnp.concatenate([col_all, proj.depths[..., None]], -1)
        elif render_mode in ("D", "ED"):
            col_all = proj.depths[..., None]

        render_colors, render_alphas, n_drop = rasterize_flat_pallas_multi(
            proj.means2d, proj.conics, col_all, op_all, radii_all,
            proj.depths, width, height, tile_size, max_tiles_per_gauss,
            max_per_tile, exact_test=exact_tile_test)
        if render_mode in ("ED", "RGB+ED"):
            render_colors = jnp.concatenate([
                render_colors[..., :-1],
                render_colors[..., -1:] / jnp.maximum(render_alphas, 1e-10),
            ], axis=-1)
        meta = {"radii": proj.radii, "means2d": proj.means2d,
                "depths": proj.depths,
                "n_dropped": jnp.broadcast_to(n_drop, (viewmats.shape[0],))}
        return render_colors, render_alphas, meta

    def per_camera(args):
        viewmat, K, rad_c, tang_c, vm_rs = args
        if use_ut:
            from . import cameras as cam_models
            proj = cam_models.fully_fused_projection_ut(
                means, covars, viewmat[None], K[None], width, height,
                camera_model=camera_model,
                radial_coeffs=None if rad_c is None else rad_c[None],
                tangential_coeffs=None if tang_c is None else tang_c[None],
                ftheta_coeffs=ftheta_coeffs,
                eps2d=eps2d, near_plane=near_plane, far_plane=far_plane,
                calc_compensations=calc_compensations,
                rolling_shutter=rolling_shutter,
                viewmats_rs=None if vm_rs is None else vm_rs[None],
                ut_params=(cam_models.UTParams() if ut_params is None
                           else ut_params),
                radius_clip=radius_clip)
        else:
            proj = projection.fully_fused_projection(
                means, covars, viewmat[None], K[None], width, height, eps2d=eps2d,
                near_plane=near_plane, far_plane=far_plane,
                calc_compensations=calc_compensations,
                radius_clip=radius_clip)
        m2d, con, dep, rad = (proj.means2d[0], proj.conics[0],
                              proj.depths[0], proj.radii[0])
        op = opacities * proj.compensations[0] if proj.compensations is not None \
            else opacities
        if tight_radius:
            rad = tiles.opacity_tight_radii(rad, op)

        if colors.ndim == 2:
            col = colors
        else:
            # SH colors evaluated toward this camera.
            from ..utils import sh as sh_utils
            cam_t = -jnp.einsum("ij,i->j", viewmat[:3, :3], viewmat[:3, 3],
                                precision="highest")
            dirs = means - cam_t[None, :]
            dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-8)
            deg = int(colors.shape[-2] ** 0.5) - 1
            # eval_sh broadcasts dirs (..., 3) against coeffs (..., C, K):
            # pass dirs as (N, 3) so x/y/z are (N, 1) vs sh[..., i] (N, C).
            col = sh_utils.eval_sh(deg, jnp.swapaxes(colors, -1, -2), dirs)
            col = jnp.clip(col + 0.5, 0.0, None)

        if render_mode in ("RGB+D", "RGB+ED"):
            col = jnp.concatenate([col, dep[..., None]], axis=-1)
        elif render_mode in ("D", "ED"):
            col = dep[..., None]

        if with_eval3d:
            # bin by the projected footprint, blend in world space with the
            # RAW opacities: eps2d dilation/compensation is a 2D-footprint
            # artifact that does not apply to exact ray-space evaluation
            op = opacities
            from . import cameras as cam_models
            bins = tiles.bin_gaussians(m2d, rad, dep, tile_size, tw, th,
                                       max_tiles_per_gauss, max_per_tile)
            gy, gx = jnp.meshgrid(
                jnp.arange(th * tile_size, dtype=jnp.float32) + 0.5,
                jnp.arange(tw * tile_size, dtype=jnp.float32) + 0.5,
                indexing="ij")
            ray_o, ray_d = cam_models.image_point_to_world_ray(
                jnp.stack([gx, gy], -1), viewmat, K,
                camera_model=camera_model,
                radial=rad_c, tangential=tang_c, ftheta=ftheta_coeffs,
                rolling_shutter=rolling_shutter, viewmat_rs=vm_rs,
                width=width, height=height)
            out, alpha = rasterize_binned_world_jax(
                means, iscl_rots, col, op, bins, ray_o, ray_d,
                width, height, tile_size)
            n_drop = bins.n_dropped
        elif impl == "pallas":
            # flat sorted-list path: payload rides the isect sort; no dense
            # per-tile gathers (see rasterizer_pallas._kernel_flat)
            from .rasterizer_pallas import rasterize_flat_pallas
            tap = abs_tap if abs_tap is not None else jnp.zeros_like(m2d)
            out, alpha, n_drop = rasterize_flat_pallas(
                m2d, con, col, op, rad, dep, tap, width, height, tile_size,
                max_tiles_per_gauss, max_per_tile, False, payload_f16,
                slot_fracs, exact_tile_test)
        else:
            bins = tiles.bin_gaussians(
                m2d, rad, dep, tile_size, tw, th,
                max_tiles_per_gauss, max_per_tile,
                conic_test=(tiles.conic_test_planes(con, op)
                            if exact_tile_test else None))
            out, alpha = rasterize_binned_jax(m2d, con, col, op, bins,
                                              width, height, tile_size)
            n_drop = bins.n_dropped
        return out, alpha, n_drop, rad, m2d, dep

    cam_args = (viewmats, Ks, radial_coeffs, tangential_coeffs, viewmats_rs)
    C = viewmats.shape[0]
    # Static python unroll beats lax.map by ~4x on TPU (round-3 isolation:
    # 161.6 ms -> 39.3 ms for the identical 4-camera pipeline at 537k
    # splats — scan carries force cross-iteration buffer copies of the
    # multi-MB sorted intersection lists). lax.map stays for long camera
    # lists where C unrolled copies would blow compile time.
    import os
    unroll_max = int(os.environ.get("WM_RASTER_UNROLL", "16"))
    if C <= unroll_max:
        outs = [per_camera(tuple(None if a is None else a[c]
                                 for a in cam_args)) for c in range(C)]
        (render_colors, render_alphas, n_dropped, radii_all, means2d_all,
         depths_all) = (jnp.stack([o[i] for o in outs]) for i in range(6))
    else:
        (render_colors, render_alphas, n_dropped, radii_all, means2d_all,
         depths_all) = lax.map(per_camera, cam_args)

    if render_mode in ("ED", "RGB+ED"):
        render_colors = jnp.concatenate([
            render_colors[..., :-1],
            render_colors[..., -1:] / jnp.maximum(render_alphas, 1e-10),
        ], axis=-1)

    meta = {"radii": radii_all, "means2d": means2d_all, "depths": depths_all,
            # per-camera count of intersections dropped by the static caps —
            # nonzero means max_per_tile / max_tiles_per_gauss need raising
            "n_dropped": n_dropped}
    return render_colors, render_alphas, meta


def rasterize(*args, slot_fracs=None, **kwargs):
    """Public entry: normalizes `slot_fracs` (a jit-static arg) so the
    natural list-of-fractions spelling doesn't hit an unhashable-static
    TypeError at trace time (advisor r3). Note the knob only applies to
    impl="pallas" — the jax / eval3d / UT paths ignore it. See
    _rasterize_jit for the full signature/docs."""
    if slot_fracs is not None and not isinstance(slot_fracs, (str, tuple)):
        slot_fracs = tuple(slot_fracs)
    return _rasterize_jit(*args, slot_fracs=slot_fracs, **kwargs)


def _tile_weights(means2d, conics, opacities, live, px_xy):
    """Per-(gaussian, pixel) blend weights for one tile — the w of
    _blend_tile without the color contraction. (K, P)."""
    dx = px_xy[None, :, 0] - means2d[:, 0:1]
    dy = px_xy[None, :, 1] - means2d[:, 1:2]
    sigma = (0.5 * (conics[:, 0:1] * dx * dx + conics[:, 2:3] * dy * dy)
             + conics[:, 1:2] * dx * dy)
    alpha = jnp.minimum(0.999, opacities[:, None] * jnp.exp(-sigma))
    keep = (sigma >= 0) & (alpha >= ALPHA_THRESHOLD) & live[:, None]
    alpha = jnp.where(keep, alpha, 0.0)
    lg = jnp.log1p(-alpha)
    T_before = jnp.exp(jnp.cumsum(lg, axis=0) - lg)
    T_after = T_before * (1.0 - alpha)
    # monotone-T early stop (see _blend_tile)
    return jnp.where(T_after > T_EPS, alpha * T_before, 0.0)


@partial(jax.jit, static_argnames=(
    "width", "height", "k", "tile_size", "max_per_tile",
    "max_tiles_per_gauss", "quat_order"))
def rasterize_to_indices(
    means: jnp.ndarray, quats: jnp.ndarray, scales: jnp.ndarray,
    opacities: jnp.ndarray, viewmats: jnp.ndarray, Ks: jnp.ndarray,
    width: int, height: int, k: int = 8,
    tile_size: int = 16, eps2d: float = 0.3,
    near_plane: float = 0.01, far_plane: float = 1e10,
    max_per_tile: int = 1024, max_tiles_per_gauss: int = 9,
    quat_order: str = "xyzw",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pixel gaussian-index enumeration (gsplat rasterize_to_indices_*,
    reference csrc/RasterizeToIndices3DGS.cu — used for pruning/analysis).

    Static-shape reformulation: instead of variable-length (gaussian, pixel)
    pair lists, returns for every pixel its top-`k` contributing gaussians by
    blend weight alpha*T. Returns (ids (C, H, W, k) int32 with -1 padding,
    weights (C, H, W, k) f32).
    """
    if quat_order == "wxyz":
        quats = quats[..., jnp.array([1, 2, 3, 0])]
    covars = projection.quat_scale_to_covar_planes(quats, scales)
    tw = (width + tile_size - 1) // tile_size
    th = (height + tile_size - 1) // tile_size
    P = tile_size * tile_size

    py, px = jnp.meshgrid(jnp.arange(tile_size), jnp.arange(tile_size),
                          indexing="ij")
    local_xy = jnp.stack([px.reshape(-1), py.reshape(-1)], -1).astype(jnp.float32) + 0.5

    def per_camera(viewmat, K):
        proj = projection.fully_fused_projection(
            means, covars, viewmat[None], K[None], width, height, eps2d=eps2d,
            near_plane=near_plane, far_plane=far_plane)
        m2d, con, dep, rad = (proj.means2d[0], proj.conics[0],
                              proj.depths[0], proj.radii[0])
        bins = tiles.bin_gaussians(m2d, rad, dep, tile_size, tw, th,
                                   max_tiles_per_gauss, max_per_tile)

        def tile_fn(tile_idx, tile_gauss, tile_count):
            origin = jnp.stack([(tile_idx % tw) * tile_size,
                                (tile_idx // tw) * tile_size]).astype(jnp.float32)
            live = jnp.arange(bins.gauss_ids.shape[1], dtype=jnp.int32) < tile_count
            w = _tile_weights(m2d[tile_gauss], con[tile_gauss],
                              opacities[tile_gauss], live,
                              local_xy + origin[None])         # (K_bin, P)
            vals, idx = lax.top_k(w.T, k)                      # (P, k)
            ids = jnp.where(vals > 0, tile_gauss[idx], -1)
            return ids, vals

        tile_index = jnp.arange(tw * th, dtype=jnp.int32)
        ids_t, w_t = lax.map(
            lambda args: tile_fn(*args),
            (tile_index, bins.gauss_ids, bins.counts))
        ids_t = ids_t.reshape(th, tw, tile_size, tile_size, k)
        w_t = w_t.reshape(th, tw, tile_size, tile_size, k)
        ids_img = ids_t.transpose(0, 2, 1, 3, 4).reshape(
            th * tile_size, tw * tile_size, k)[:height, :width]
        w_img = w_t.transpose(0, 2, 1, 3, 4).reshape(
            th * tile_size, tw * tile_size, k)[:height, :width]
        return ids_img, w_img

    C = viewmats.shape[0]
    if C <= 16:  # static unroll beats lax.map on TPU (see rasterize note)
        outs = [per_camera(viewmats[c], Ks[c]) for c in range(C)]
        return tuple(jnp.stack([o[i] for o in outs]) for i in range(2))
    return lax.map(lambda args: per_camera(*args), (viewmats, Ks))
