"""UV grids and sinusoidal 2D positional embeddings for the dense heads.

Parity target: /root/reference/src/models/utils/grid.py:4-90
(omega base 100, aspect-ratio diagonal normalization).
"""

import numpy as np
import jax.numpy as jnp


def create_uv_grid(width: int, height: int, aspect_ratio: float = None,
                   dtype=jnp.float32) -> jnp.ndarray:
    """Normalized UV grid of shape (H, W, 2) spanning +-span/diagonal."""
    if aspect_ratio is None:
        aspect_ratio = float(width) / float(height)

    diag_factor = (aspect_ratio ** 2 + 1.0) ** 0.5
    span_x = aspect_ratio / diag_factor
    span_y = 1.0 / diag_factor

    left_x = -span_x * (width - 1) / width
    right_x = span_x * (width - 1) / width
    top_y = -span_y * (height - 1) / height
    bottom_y = span_y * (height - 1) / height

    x = np.linspace(left_x, right_x, width)
    y = np.linspace(top_y, bottom_y, height)
    uu, vv = np.meshgrid(x, y)  # (H, W)
    return jnp.asarray(np.stack([uu, vv], axis=-1), dtype=dtype)


def position_grid_to_embed(pos_grid: jnp.ndarray, embed_dim: int,
                           omega_0: float = 100.0) -> jnp.ndarray:
    """(H, W, 2) positions -> (H, W, embed_dim) sinusoidal embedding."""
    H, W, _ = pos_grid.shape
    assert embed_dim % 2 == 0

    d4 = embed_dim // 4
    omega = np.arange(d4, dtype=np.float64) / (embed_dim / 4.0)
    omega = 1.0 / omega_0 ** omega  # (D/4,)
    omega = jnp.asarray(omega, dtype=jnp.float32)

    pos = pos_grid.reshape(-1, 2)
    out_x = pos[:, 0:1] * omega[None, :]  # (HW, D/4)
    out_y = pos[:, 1:2] * omega[None, :]

    emb_x = jnp.concatenate([jnp.sin(out_x), jnp.cos(out_x)], axis=1)
    emb_y = jnp.concatenate([jnp.sin(out_y), jnp.cos(out_y)], axis=1)
    emb = jnp.concatenate([emb_x, emb_y], axis=-1)
    return emb.reshape(H, W, embed_dim)
