"""Pure-JAX oracle rasterizer: exact front-to-back alpha blending semantics.

Mirrors the CUDA kernel's per-pixel behavior
(reference submodules/gsplat/gsplat/cuda/csrc/RasterizeToPixels3DGSFwd.cu:42-180):
  * pixel center at +0.5; sigma = 0.5(a dx^2 + c dy^2) + b dx dy
  * alpha = min(0.999, opacity * exp(-sigma)); skipped if sigma < 0 or
    alpha < 1/255
  * front-to-back transmittance; a gaussian that would push T below 1e-4 is
    itself NOT rendered (exclusive early stop) and blending ends there
  * a gaussian only renders into tiles its radius box overlaps.

O(H*W*N) — use for tests and small scenes only. The early-stop is expressed
in closed form over the depth-sorted alpha sequence (hypothetical cumprod),
which is mathematically identical to the sequential loop because alphas are
non-negative and T is monotone.
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

ALPHA_THRESHOLD = 1.0 / 255.0
T_EPS = 1e-4


def rasterize_reference(
    means2d: jnp.ndarray,    # (N, 2)
    conics: jnp.ndarray,     # (N, 3)
    colors: jnp.ndarray,     # (N, D)
    opacities: jnp.ndarray,  # (N,)
    depths: jnp.ndarray,     # (N,)
    radii: jnp.ndarray,      # (N, 2) int — 0 marks culled
    width: int, height: int, tile_size: int = 16,
    backgrounds: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rasterize one camera. Returns (colors (H, W, D), alphas (H, W, 1))."""
    N = means2d.shape[0]
    order = jnp.argsort(depths)
    means2d = means2d[order]
    conics = conics[order]
    colors = colors[order]
    opacities = opacities[order]
    radii = radii[order]

    xs = (jnp.arange(width, dtype=jnp.float32) + 0.5)[None, :]    # (1, W)
    ys = (jnp.arange(height, dtype=jnp.float32) + 0.5)[:, None]   # (H, 1)

    # Tile-membership mask per (gaussian, pixel): a pixel sees the gaussian iff
    # its tile lies in the gaussian's clamped tile box.
    tile_x = (jnp.arange(width, dtype=jnp.int32) // tile_size)[None, :]
    tile_y = (jnp.arange(height, dtype=jnp.int32) // tile_size)[:, None]
    tw = (width + tile_size - 1) // tile_size
    th = (height + tile_size - 1) // tile_size
    tm = means2d / tile_size
    tr = radii.astype(jnp.float32) / tile_size
    tmin = jnp.clip(jnp.floor(tm - tr).astype(jnp.int32), 0,
                    jnp.asarray([tw, th], jnp.int32))
    tmax = jnp.clip(jnp.ceil(tm + tr).astype(jnp.int32), 0,
                    jnp.asarray([tw, th], jnp.int32))

    def per_gaussian_alpha(mean, conic, op, rad, tmn, tmx):
        dx = xs - mean[0]
        dy = ys - mean[1]
        sigma = (0.5 * (conic[0] * dx * dx + conic[2] * dy * dy)
                 + conic[1] * dx * dy)  # (H, W)
        alpha = jnp.minimum(0.999, op * jnp.exp(-sigma))
        in_tile = ((tile_x >= tmn[0]) & (tile_x < tmx[0])
                   & (tile_y >= tmn[1]) & (tile_y < tmx[1]))
        live = (rad > 0).all()
        keep = (sigma >= 0) & (alpha >= ALPHA_THRESHOLD) & in_tile & live
        return jnp.where(keep, alpha, 0.0)

    alphas = jax.vmap(per_gaussian_alpha)(
        means2d, conics, opacities, radii, tmin, tmax)  # (N, H, W)

    # Hypothetical transmittance before each gaussian (exclusive cumprod).
    one_minus = 1.0 - alphas
    T_before = jnp.concatenate(
        [jnp.ones((1,) + alphas.shape[1:]), jnp.cumprod(one_minus, axis=0)[:-1]],
        axis=0)  # (N, H, W)
    T_after = T_before * one_minus

    # Exclusive early stop: gaussian i renders iff no j <= i tripped the bound.
    tripped = (T_after <= T_EPS) & (alphas > 0)
    stopped_before = jnp.concatenate(
        [jnp.zeros((1,) + alphas.shape[1:], bool),
         jnp.cumsum(tripped, axis=0)[:-1] > 0], axis=0)
    render = ~(tripped | stopped_before)

    weights = jnp.where(render, alphas * T_before, 0.0)  # (N, H, W)
    out = jnp.einsum("nhw,nd->hwd", weights, colors, precision="highest")
    alpha_out = jnp.sum(weights, axis=0)[..., None]

    if backgrounds is not None:
        out = out + backgrounds[None, None, :] * (1.0 - alpha_out)
    return out, alpha_out
