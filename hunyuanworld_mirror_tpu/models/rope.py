"""2D axial rotary position embedding with precomputed tables.

Behavioral parity: reference src/models/layers/rope.py:56-182 (freq base 100,
head dim split y/x halves, each half rotated 1-D). The reference caches
cos/sin per (dim, len, device, dtype) dict at runtime; here the tables are
pure functions of static shapes, computed at trace time so everything lives
inside one jit program.
"""

from typing import NamedTuple, Tuple

import numpy as np
import jax.numpy as jnp


class RopeTables(NamedTuple):
    """Per-token rotation tables, each (N, half_dim) where half = head_dim // 2."""
    cos_y: jnp.ndarray
    sin_y: jnp.ndarray
    cos_x: jnp.ndarray
    sin_x: jnp.ndarray


def grid_positions(h: int, w: int, n_special: int) -> np.ndarray:
    """Token (y, x) positions: `n_special` leading tokens at (0, 0), patch
    tokens on a 1-based grid (reference: visual_transformer.py:299-306)."""
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    pos = np.stack([ys.reshape(-1), xs.reshape(-1)], axis=-1) + 1
    special = np.zeros((n_special, 2), dtype=np.int64)
    return np.concatenate([special, pos], axis=0)  # (n_special + h*w, 2)


def make_rope_tables(positions: np.ndarray, head_dim: int,
                     frequency: float = 100.0,
                     dtype=jnp.float32) -> RopeTables:
    """Build cos/sin tables for given integer (N, 2) positions.

    Each spatial direction rotates `head_dim // 2` features with inverse
    frequencies 1 / frequency^(2i / (head_dim//2)).
    """
    half = head_dim // 2
    exponents = np.arange(0, half, 2, dtype=np.float64) / half
    inv_freq = 1.0 / (frequency ** exponents)  # (half/2,)

    def tables(p):
        ang = p[:, None].astype(np.float64) * inv_freq[None, :]  # (N, half/2)
        ang = np.concatenate([ang, ang], axis=-1)  # (N, half)
        return (jnp.asarray(np.cos(ang), dtype), jnp.asarray(np.sin(ang), dtype))

    cos_y, sin_y = tables(positions[:, 0])
    cos_x, sin_x = tables(positions[:, 1])
    return RopeTables(cos_y, sin_y, cos_x, sin_x)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    d = x.shape[-1]
    x1, x2 = x[..., : d // 2], x[..., d // 2:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope2d(x: jnp.ndarray, tables: RopeTables) -> jnp.ndarray:
    """Rotate features by 2D position.

    The rotation is written as the explicit complex form
    (a, b) -> (a*cos - b*sin, b*cos + a*sin) instead of
    t*cos + rotate_half(t)*sin: the tables duplicate their angle block
    (concatenate([ang, ang]) in make_rope_tables) so cos/sin are identical
    across the two quarter-blocks, and the rotate_half spelling materialized
    a negated copy of half the tensor per q/k per layer (xprof r5: 5.9 ms
    of `neg` per S=4 forward). Negation is exact, so outputs are
    BIT-IDENTICAL to the rotate_half form.

    Args:
      x: (B, N, num_heads, head_dim) query or key tensor.
      tables: RopeTables with leading dim N (matching token axis).
    Returns:
      Rotated tensor, same shape/dtype.
    """
    dtype = x.dtype
    half = x.shape[-1] // 2
    q = half // 2
    xv, xh = x[..., :half], x[..., half:]

    def rot(t, cos, sin):
        c = cos[None, :, None, :q].astype(dtype)
        s = sin[None, :, None, :q].astype(dtype)
        a, b = t[..., :q], t[..., q:]
        return jnp.concatenate([a * c - b * s, b * c + a * s], axis=-1)

    xv = rot(xv, tables.cos_y, tables.sin_y)
    xh = rot(xh, tables.cos_x, tables.sin_x)
    return jnp.concatenate([xv, xh], axis=-1)


def tile_tables(tables: RopeTables, reps: int) -> RopeTables:
    """Repeat token tables `reps` times along N (for global attention over
    S frames' concatenated tokens — positions are per-frame, no cross-frame
    index, reference: visual_transformer.py:380-387)."""
    return RopeTables(*(jnp.tile(t, (reps, 1)) for t in tables))
