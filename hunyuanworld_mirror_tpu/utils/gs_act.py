"""Activations mapping raw Gaussian-head outputs to splat parameters.

Parity target: /root/reference/src/models/utils/act_gs.py:5-22.
"""

import jax.numpy as jnp


def reg_dense_offsets(xyz: jnp.ndarray, shift: float = 6.0) -> jnp.ndarray:
    """Direction-preserving bounded offsets: dir * (e^(|d|-shift) - e^-shift)."""
    d = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    return xyz / jnp.maximum(d, 1e-8) * (jnp.exp(d - shift) - jnp.exp(-shift))


def reg_dense_scales(scales: jnp.ndarray) -> jnp.ndarray:
    return jnp.exp(scales)


def reg_dense_rotation(rotations: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    return rotations / (jnp.linalg.norm(rotations, axis=-1, keepdims=True) + eps)


def reg_dense_sh(sh: jnp.ndarray) -> jnp.ndarray:
    """(..., nums_sh * 3) -> (..., nums_sh, 3)."""
    return sh.reshape(sh.shape[:-1] + (-1, 3))


def reg_dense_opacities(opacities: jnp.ndarray) -> jnp.ndarray:
    return jax_sigmoid(opacities)


def reg_dense_weights(weights: jnp.ndarray) -> jnp.ndarray:
    return jax_sigmoid(weights)


def jax_sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    return 1.0 / (1.0 + jnp.exp(-x))
