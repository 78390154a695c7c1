"""Resampling ops expressed as dense matmuls (MXU-friendly).

The reference's DPT decoder leans on torch's align_corners=True bilinear
interpolate (reference: src/models/heads/dense_head.py:535,541-579). XLA has
no align-corners resize, so we build the 1-D interpolation operators as small
dense matrices (computed host-side at trace time — all shapes are static) and
apply them as two matmuls. That runs on the MXU and fuses cleanly, instead of
gather chains on the VPU.
"""

import functools

import numpy as np
import jax.numpy as jnp


@functools.lru_cache(maxsize=256)
def _interp_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """(out_size, in_size) row-stochastic linear-interpolation operator."""
    m = np.zeros((out_size, in_size), dtype=np.float32)
    if in_size == 1:
        m[:, 0] = 1.0
        return m
    if align_corners:
        if out_size == 1:
            src = np.zeros(1)
        else:
            src = np.arange(out_size) * (in_size - 1) / (out_size - 1)
    else:
        src = (np.arange(out_size) + 0.5) * in_size / out_size - 0.5
        src = np.clip(src, 0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    w_hi = src - lo
    m[np.arange(out_size), lo] += 1.0 - w_hi
    m[np.arange(out_size), hi] += w_hi
    return m


def resize_bilinear(x: jnp.ndarray, size, align_corners: bool = True) -> jnp.ndarray:
    """Bilinear resize of NHWC tensors via two dense matmuls.

    Args:
      x: (..., H, W, C).
      size: (out_h, out_w) static ints.
    """
    out_h, out_w = size
    in_h, in_w = x.shape[-3], x.shape[-2]
    if (in_h, in_w) == (out_h, out_w):
        return x
    dtype = x.dtype
    mh = jnp.asarray(_interp_matrix(in_h, out_h, align_corners), dtype)
    mw = jnp.asarray(_interp_matrix(in_w, out_w, align_corners), dtype)
    # (..., H, W, C): contract H then W.
    x = jnp.einsum("oh,...hwc->...owc", mh, x)
    x = jnp.einsum("pw,...hwc->...hpc", mw, x)
    return x


def scale2x(x: jnp.ndarray, align_corners: bool = True) -> jnp.ndarray:
    """scale_factor=2 resize (torch semantics: out = in * 2)."""
    return resize_bilinear(x, (x.shape[-3] * 2, x.shape[-2] * 2), align_corners)
