"""Bilateral-grid appearance compensation for the post-opt splat trainer.

Behavioral parity: reference submodules/gsplat/examples/lib_bilagrid.py
(BilateralGrid: per-view (12, L, H, W) grids of 3x4 color affines initialized
to identity, sliced trilinearly by (x, y, BT601-gray) guidance with
align_corners=True + border padding, applied as rgb' = A[:, :3] @ rgb + A[:, 3];
total_variation_loss regularizer) and its use in the trainer
(simple_trainer_worldmirror.py:196-199, 556-566, 765-768, 813).

Pure JAX: the grid is a plain (num, 12, L, H, W) array in the optimization
pytree; slicing is vectorized trilinear interpolation (no grid_sample op
needed).
"""

from typing import Tuple

import jax
import jax.numpy as jnp

_BT601 = jnp.asarray([0.299, 0.587, 0.114])


def init_bilateral_grids(num: int, grid_x: int = 16, grid_y: int = 16,
                         grid_w: int = 8) -> jnp.ndarray:
    """(num, 12, L, H, W) grids, every cell the identity 3x4 affine."""
    ident = jnp.asarray([1.0, 0, 0, 0, 0, 1.0, 0, 0, 0, 0, 1.0, 0])
    return jnp.broadcast_to(ident[None, :, None, None, None],
                            (num, 12, grid_w, grid_y, grid_x)).astype(
        jnp.float32)


def _trilinear(grid: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray,
               w: jnp.ndarray) -> jnp.ndarray:
    """Sample (12, L, H, W) at continuous (w->L, v->H, u->W) index coords
    (already scaled to [0, size-1], border-clamped). Returns (..., 12)."""
    L, H, W = grid.shape[1:]

    def axis(c, n):
        c = jnp.clip(c, 0.0, n - 1.0)
        lo = jnp.clip(jnp.floor(c).astype(jnp.int32), 0, n - 1)
        hi = jnp.clip(lo + 1, 0, n - 1)
        return lo, hi, c - lo.astype(c.dtype)

    ul, uh, uf = axis(u, W)
    vl, vh, vf = axis(v, H)
    wl, wh, wf = axis(w, L)

    def g(wi, vi, ui):
        return grid[:, wi, vi, ui]  # (12, ...) -> moveaxis below

    out = 0.0
    for wi, wwt in ((wl, 1 - wf), (wh, wf)):
        for vi, vwt in ((vl, 1 - vf), (vh, vf)):
            for ui, uwt in ((ul, 1 - uf), (uh, uf)):
                out = out + g(wi, vi, ui) * (wwt * vwt * uwt)[None]
    return jnp.moveaxis(out, 0, -1)  # (..., 12)


def slice_grids(grids: jnp.ndarray, xy: jnp.ndarray, rgb: jnp.ndarray,
                idx) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Slice per-view grids and apply the color affine.

    Args:
      grids: (num, 12, L, H, W); xy: (..., 2) in [0, 1]; rgb: (..., 3) in
      [0, 1]; idx: int view index (scalar) or (...,) per-pixel indices.
    Returns (rgb_out (..., 3), affine_mats (..., 3, 4)).
    """
    L, H, W = grids.shape[2:]
    g = grids[idx] if jnp.ndim(idx) == 0 else grids[idx[..., 0]]
    # align_corners=True: [-1, 1] maps to [0, size-1]; xy in [0,1] -> 2x-1
    gx = (xy[..., 0] * 2.0 - 1.0 + 1.0) * 0.5 * (W - 1)
    gy = (xy[..., 1] * 2.0 - 1.0 + 1.0) * 0.5 * (H - 1)
    gray = rgb @ _BT601 * 2.0 - 1.0                      # [-1, 1]
    gz = (gray + 1.0) * 0.5 * (L - 1)
    if jnp.ndim(idx) == 0:
        aff = _trilinear(g, gx, gy, gz)                  # (..., 12)
    else:
        aff = jax.vmap(_trilinear)(g, gx, gy, gz)
    aff = aff.reshape(aff.shape[:-1] + (3, 4))
    out = jnp.einsum("...ij,...j->...i", aff[..., :3], rgb) + aff[..., 3]
    return out, aff


def slice_image_grids(grids: jnp.ndarray, images: jnp.ndarray,
                      view_idx=None) -> jnp.ndarray:
    """Convenience: apply per-view grids to (C, H, W, 3) rendered images.

    view_idx defaults to arange(C) (grid i <-> image i, the trainer's
    layout, reference :765-768)."""
    C, H, W, _ = images.shape
    ys, xs = jnp.meshgrid((jnp.arange(H) + 0.5) / H,
                          (jnp.arange(W) + 0.5) / W, indexing="ij")
    xy = jnp.broadcast_to(jnp.stack([xs, ys], -1)[None], (C, H, W, 2))
    idx = jnp.arange(C) if view_idx is None else view_idx

    def one(g, xy_c, rgb_c):
        out, _ = slice_grids(g[None], xy_c, rgb_c, jnp.int32(0))
        return out

    return jax.vmap(one)(grids[idx], xy, images)


def total_variation_loss(grids: jnp.ndarray) -> jnp.ndarray:
    """Mean squared difference along each spatial/guidance axis (reference
    lib_bilagrid.total_variation_loss)."""
    B = grids.shape[0]
    tv = 0.0
    for axis in range(2, grids.ndim):
        d = (jnp.diff(grids, axis=axis) ** 2)
        count = max(int(jnp.size(d) / B), 1)
        tv = tv + jnp.sum(d) / count
    return tv / B
