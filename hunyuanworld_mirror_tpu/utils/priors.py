"""Prior-input normalization (camera poses and depth maps), fully vectorized.

The reference normalizes per-sample with Python loops
(/root/reference/src/models/utils/priors.py:4-168); here the same semantics are
expressed as batched XLA ops (masked quantiles via nanquantile) so the whole
thing stays inside jit with static shapes.
"""

import jax.numpy as jnp


def normalize_poses(extrinsics: jnp.ndarray, padding: float = 0.1) -> jnp.ndarray:
    """Normalize camera centers to the unit cube, per batch element.

    Args:
      extrinsics: (B, S, 3, 4) camera extrinsics; the translation column is
        normalized, rotations pass through unchanged.
      padding: boundary margin inside [0, 1].
    Returns:
      (B, S, 3, 4) with normalized translations, clamped to [0, 1].
    """
    B, S = extrinsics.shape[:2]
    ext = jnp.nan_to_num(extrinsics, nan=0.0, posinf=1e6, neginf=-1e6)
    positions = ext[:, :, :3, 3]  # (B, S, 3)

    # Robust bounds: 5/95 percentiles when there are enough views, else min/max.
    if S > 10:
        min_pos = jnp.quantile(positions, 0.05, axis=1)
        max_pos = jnp.quantile(positions, 0.95, axis=1)
    else:
        min_pos = jnp.min(positions, axis=1)
        max_pos = jnp.max(positions, axis=1)

    pos_range = max_pos - min_pos
    eps = jnp.maximum(1e-6, jnp.abs(max_pos) * 1e-6)
    pos_range = jnp.maximum(pos_range, eps)

    scale_factor = jnp.clip(jnp.max(pos_range, axis=-1), 1e-6, 1e6)  # (B,)
    center = (min_pos + max_pos) / 2.0  # (B, 3)

    actual_scale = scale_factor / (1.0 - 2.0 * padding)
    normalized = (positions - center[:, None, :]) / actual_scale[:, None, None] + 0.5
    normalized = jnp.clip(normalized, 0.0, 1.0)

    return ext.at[:, :, :3, 3].set(normalized)


def normalize_depth(depth: jnp.ndarray, eps: float = 1e-6,
                    min_percentile: float = 1, max_percentile: float = 99) -> jnp.ndarray:
    """Normalize depth to [0, 1] per image with robust percentile bounds.

    Zero pixels are excluded from the statistics; images with <= 100 valid
    pixels fall back to min/max bounds; degenerate (constant) images get a
    unit range.

    Args:
      depth: (B, S, H, W).
    Returns:
      (B, S, H, W) in [0, 1].
    """
    B, S, H, W = depth.shape
    x = jnp.nan_to_num(depth, nan=0.0, posinf=1e6, neginf=0.0)
    flat = x.reshape(B * S, H * W)

    mask = flat > 0
    n_valid = jnp.sum(mask, axis=-1)

    masked = jnp.where(mask, flat, jnp.nan)
    q_lo = jnp.nanquantile(masked, min_percentile / 100.0, axis=-1)
    q_hi = jnp.nanquantile(masked, max_percentile / 100.0, axis=-1)
    mn_nz = jnp.nanmin(masked, axis=-1)
    mx_nz = jnp.nanmax(masked, axis=-1)

    mn_all = jnp.min(flat, axis=-1)
    mx_all = jnp.max(flat, axis=-1)

    use_q = n_valid > 100
    has_nz = n_valid > 0
    d_min = jnp.where(use_q, q_lo, jnp.where(has_nz, mn_nz, mn_all))
    d_max = jnp.where(use_q, q_hi, jnp.where(has_nz, mx_nz, mx_all))

    d_max = jnp.where(d_max == d_min, d_min + 1.0, d_max)

    scale = jnp.abs(d_max - d_min)
    eps_val = jnp.maximum(eps, scale * eps)

    out = (flat - d_min[:, None]) / (d_max - d_min + eps_val)[:, None]
    return jnp.clip(out, 0.0, 1.0).reshape(B, S, H, W)


def normalize_depth_fixed(depth: jnp.ndarray, max_depth: float = 25.0) -> jnp.ndarray:
    """Fixed-range depth normalization used by the 6D-pose training fork.

    Parity: /root/reference/models/utils/priors.py:3-7.
    """
    return jnp.clip(depth, 0.0, max_depth) / max_depth
