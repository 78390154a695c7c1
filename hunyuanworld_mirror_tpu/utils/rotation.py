"""Quaternion <-> rotation-matrix conversions (scalar-last XYZW order).

Behavioral parity target: /root/reference/src/models/utils/rotation.py:8-126
(PyTorch3D-derived, XYZW quaternions, sign-standardized real part >= 0).
Implemented branch-free for XLA.
"""

import jax.numpy as jnp


def quat_to_rotmat(quaternions: jnp.ndarray) -> jnp.ndarray:
    """Convert quaternions (..., 4) in XYZW order to rotation matrices (..., 3, 3)."""
    i, j, k, r = jnp.moveaxis(quaternions, -1, 0)
    two_s = 2.0 / jnp.sum(quaternions * quaternions, axis=-1)

    o = jnp.stack(
        (
            1 - two_s * (j * j + k * k),
            two_s * (i * j - k * r),
            two_s * (i * k + j * r),
            two_s * (i * j + k * r),
            1 - two_s * (i * i + k * k),
            two_s * (j * k - i * r),
            two_s * (i * k - j * r),
            two_s * (j * k + i * r),
            1 - two_s * (i * i + j * j),
        ),
        axis=-1,
    )
    return o.reshape(quaternions.shape[:-1] + (3, 3))


def _sqrt_positive_part(x: jnp.ndarray) -> jnp.ndarray:
    """sqrt(max(0, x)) with a zero subgradient at x == 0."""
    safe = jnp.where(x > 0, x, 1.0)
    return jnp.where(x > 0, jnp.sqrt(safe), jnp.zeros_like(x))


def standardize_quaternion(quaternions: jnp.ndarray) -> jnp.ndarray:
    """Flip sign so the real (last) component is non-negative."""
    return jnp.where(quaternions[..., 3:4] < 0, -quaternions, quaternions)


def rotmat_to_quat(matrix: jnp.ndarray) -> jnp.ndarray:
    """Convert rotation matrices (..., 3, 3) to XYZW quaternions (..., 4).

    Uses the numerically robust 4-candidate construction (pick the candidate
    with the largest denominator), mirroring the reference semantics.
    """
    batch_dim = matrix.shape[:-2]
    m = matrix.reshape(batch_dim + (9,))
    m00, m01, m02, m10, m11, m12, m20, m21, m22 = jnp.moveaxis(m, -1, 0)

    q_abs = _sqrt_positive_part(
        jnp.stack(
            [
                1.0 + m00 + m11 + m22,
                1.0 + m00 - m11 - m22,
                1.0 - m00 + m11 - m22,
                1.0 - m00 - m11 + m22,
            ],
            axis=-1,
        )
    )

    # Candidate quaternions in WXYZ order, each scaled by one of (r, i, j, k).
    quat_by_rijk = jnp.stack(
        [
            jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], axis=-1),
            jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], axis=-1),
            jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], axis=-1),
            jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], axis=-1),
        ],
        axis=-2,
    )

    flr = jnp.asarray(0.1, dtype=q_abs.dtype)
    quat_candidates = quat_by_rijk / (2.0 * jnp.maximum(q_abs[..., None], flr))

    # Select the best-conditioned candidate (largest q_abs) per element.
    best = jnp.argmax(q_abs, axis=-1)
    onehot = jnp.eye(4, dtype=matrix.dtype)[best]  # (..., 4)
    out = jnp.sum(quat_candidates * onehot[..., None], axis=-2)  # (..., 4) WXYZ

    # WXYZ -> XYZW (scalar-last), then standardize sign.
    out = out[..., jnp.array([1, 2, 3, 0])]
    return standardize_quaternion(out)


def rot6d_to_matrix(d6: jnp.ndarray) -> jnp.ndarray:
    """6D rotation representation -> (..., 3, 3) via Gram-Schmidt.

    Matches the reference's rotation_6d_to_matrix (Zhou et al.; used by the
    post-opt trainer's CameraOptModule, gsplat examples/utils.py:12-48, and
    the CenterSnap pose maps): first two 3-vectors are orthonormalized, third
    is their cross product; rows are the basis vectors.
    """
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=-1, keepdims=True), 1e-8)
    a2p = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2p / jnp.maximum(jnp.linalg.norm(a2p, axis=-1, keepdims=True), 1e-8)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix [w]x of (..., 3) vectors -> (..., 3, 3)."""
    wx, wy, wz = jnp.moveaxis(w, -1, 0)
    z = jnp.zeros_like(wx)
    return jnp.stack([
        jnp.stack([z, -wz, wy], -1),
        jnp.stack([wz, z, -wx], -1),
        jnp.stack([-wy, wx, z], -1),
    ], -2)


def so3_exp(w: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Rodrigues exponential map (..., 3) -> (..., 3, 3), branch-free near 0.

    Taylor-guards the sin/cos coefficients so gradients stay finite at w=0
    (needed because BA twists start exactly at zero).
    """
    theta2 = jnp.sum(w * w, axis=-1)[..., None, None]
    # safe values keep the *untaken* where-branch NaN-free so gradients at
    # w=0 stay finite (BA twists start exactly at zero).
    t2s = jnp.maximum(theta2, eps)
    theta = jnp.sqrt(t2s)
    small = theta2 < eps
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / t2s)
    K = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye + A * K + B * (K @ K)


def se3_exp(twist: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """SE(3) exponential: twist (..., 6) = (omega, upsilon) -> (..., 4, 4)."""
    w, u = twist[..., :3], twist[..., 3:]
    theta2 = jnp.sum(w * w, axis=-1)[..., None, None]
    t2s = jnp.maximum(theta2, eps)
    theta = jnp.sqrt(t2s)
    small = theta2 < eps
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / t2s)
    C = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (1.0 - A) / t2s)
    K = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    R = eye + A * K + B * (K @ K)
    V = eye + B * K + C * (K @ K)
    t = (V @ u[..., None])
    top = jnp.concatenate([R, t], axis=-1)
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)
