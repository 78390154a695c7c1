"""Tile binning for the TPU rasterizer: static-shape sort-based intersection.

CUDA gsplat builds variable-length packed intersection lists with CUB radix
sort (reference submodules/gsplat/gsplat/cuda/csrc/IntersectTile.cu and the
oracle _torch_impl.py:378-473). TPU/XLA wants static shapes, so this module
reformulates the same binning as:

  1. every gaussian owns up to `max_tiles_per_gauss` (tile, gaussian) slots,
     enumerated row-major over its clamped tile box;
  2. a lexicographic `lax.sort` on (tile_id, depth_rank) orders slots
     front-to-back within each tile (invalid slots sort to a sentinel tile);
  3. per-tile start offsets come from a searchsorted over the sorted tile ids;
  4. a dense (n_tiles, max_per_tile) gather stages the front-most
     `max_per_tile` gaussians of every tile for the rasterizer kernel.

Both caps are static-size/accuracy knobs: overflowing `max_per_tile` drops
the *furthest* gaussians of a saturated tile (the ones a front-to-back
blender would almost certainly early-stop before anyway).
"""

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax


class TileBins(NamedTuple):
    gauss_ids: jnp.ndarray   # (n_tiles, max_per_tile) int32 indices into N
    counts: jnp.ndarray      # (n_tiles,) int32 valid entries per tile
    n_dropped: jnp.ndarray   # () int32 — intersections beyond the caps


def tile_ranges(means2d: jnp.ndarray, radii: jnp.ndarray, tile_size: int,
                tile_width: int, tile_height: int):
    """Per-gaussian clamped tile boxes; (tmin, tmax) each (N, 2) int32."""
    tm = means2d / tile_size
    tr = radii.astype(means2d.dtype) / tile_size
    tmin = jnp.floor(tm - tr).astype(jnp.int32)
    tmax = jnp.ceil(tm + tr).astype(jnp.int32)
    lim = jnp.asarray([tile_width, tile_height], jnp.int32)
    tmin = jnp.clip(tmin, 0, lim)
    tmax = jnp.clip(tmax, 0, lim)
    valid = (radii > 0).all(axis=-1)
    return tmin, tmax, valid


def bin_gaussians(means2d: jnp.ndarray, radii: jnp.ndarray, depths: jnp.ndarray,
                  tile_size: int, tile_width: int, tile_height: int,
                  max_tiles_per_gauss: int = 9,
                  max_per_tile: int = 1024) -> TileBins:
    """Bin N projected gaussians of ONE camera into per-tile depth-sorted lists.

    Args:
      means2d: (N, 2); radii: (N, 2) int; depths: (N,).
    """
    N = means2d.shape[0]
    n_tiles = tile_width * tile_height
    TPG = max_tiles_per_gauss

    # tile_ranges math in (N,) component planes (the (N, 2) form pays TPU
    # lane padding — see projection.fully_fused_projection note)
    u, v = means2d[:, 0], means2d[:, 1]
    rx = radii[:, 0].astype(means2d.dtype)
    ry = radii[:, 1].astype(means2d.dtype)
    txmin = jnp.clip(jnp.floor((u - rx) / tile_size).astype(jnp.int32), 0, tile_width)
    txmax = jnp.clip(jnp.ceil((u + rx) / tile_size).astype(jnp.int32), 0, tile_width)
    tymin = jnp.clip(jnp.floor((v - ry) / tile_size).astype(jnp.int32), 0, tile_height)
    tymax = jnp.clip(jnp.ceil((v + ry) / tile_size).astype(jnp.int32), 0, tile_height)
    valid = (radii[:, 0] > 0) & (radii[:, 1] > 0)
    bw = txmax - txmin  # (N,)
    bh = tymax - tymin
    n_cover = bw * bh

    # Slot k of gaussian n -> tile (tmin + (k % bw, k // bw)), row-major.
    k = jnp.arange(TPG, dtype=jnp.int32)[None, :]           # (1, TPG)
    bw_safe = jnp.maximum(bw, 1)[:, None]
    tx = txmin[:, None] + k % bw_safe
    ty = tymin[:, None] + k // bw_safe
    slot_valid = (k < n_cover[:, None]) & valid[:, None]
    tile_id = jnp.where(slot_valid, ty * tile_width + tx, n_tiles)  # sentinel

    # ONE unstable 2-key sort over (tile, depth-bits) — the CUDA isect-key
    # trick (IntersectTile.cu packs (tile|depth) 64-bit keys for CUB radix
    # sort); i64 packing is unavailable without x64, but a fused 2-key i32
    # sort still beats the previous argsort(depths) + stable-by-tile pair
    # (measured 51ms vs 32+36ms at 4M entries on v5p). Positive-float bit
    # patterns are order-preserving as int32, so the second key sorts
    # front-to-back within each tile.
    depth_bits = lax.bitcast_convert_type(jnp.maximum(depths, 0.0), jnp.int32)
    flat_tiles = tile_id.reshape(-1)
    flat_depth = jnp.broadcast_to(depth_bits[:, None], (N, TPG)).reshape(-1)
    flat_gauss = jnp.broadcast_to(
        jnp.arange(N, dtype=jnp.int32)[:, None], (N, TPG)).reshape(-1)

    sorted_tiles, _, sorted_gauss = lax.sort(
        (flat_tiles, flat_depth, flat_gauss), num_keys=2, is_stable=False)

    edges = jnp.searchsorted(
        sorted_tiles, jnp.arange(n_tiles + 1, dtype=jnp.int32),
        side="left").astype(jnp.int32)
    starts = edges[:-1]
    counts_full = edges[1:] - starts
    counts = jnp.minimum(counts_full, max_per_tile)
    n_dropped = jnp.sum(counts_full - counts) + jnp.sum(
        jnp.maximum(n_cover - TPG, 0) * valid)

    idx = starts[:, None] + jnp.arange(max_per_tile, dtype=jnp.int32)[None, :]
    idx = jnp.minimum(idx, N * TPG - 1)
    gauss_dense = sorted_gauss[idx]  # (n_tiles, max_per_tile)

    return TileBins(gauss_dense, counts, n_dropped.astype(jnp.int32))
