"""Distorted camera models + UT projection.

Parity anchor: the EWA path (itself oracle-tested against gsplat's torch
reference) — with an undistorted pinhole, the unscented transform must agree
with the EWA linearization for small splats."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hunyuanworld_mirror_tpu.ops import cameras, projection, rasterizer


def _scene(rng, N=64):
    means = rng.uniform(-0.8, 0.8, (N, 3)).astype(np.float32) + [0, 0, 3.0]
    quats = rng.normal(size=(N, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    scales = np.exp(rng.uniform(-4.5, -3.0, (N, 3))).astype(np.float32)
    vm = np.eye(4, dtype=np.float32)[None]
    K = np.array([[[60.0, 0, 32], [0, 60.0, 32], [0, 0, 1]]], np.float32)
    return (jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
            jnp.asarray(vm), jnp.asarray(K))


def test_ut_matches_ewa_pinhole(rng):
    means, quats, scales, vm, K = _scene(rng)
    covars = projection.quat_scale_to_covar(quats, scales)
    ewa = projection.fully_fused_projection(means, covars, vm, K, 64, 64)
    ut = cameras.fully_fused_projection_ut(means, covars, vm, K, 64, 64)
    live = (np.asarray(ewa.radii).max(-1) > 0) & (np.asarray(ut.radii).max(-1) > 0)
    np.testing.assert_allclose(np.asarray(ut.means2d)[live],
                               np.asarray(ewa.means2d)[live], atol=0.05)
    np.testing.assert_allclose(np.asarray(ut.depths), np.asarray(ewa.depths),
                               atol=1e-5)
    # conics agree to a few percent (UT captures curvature EWA linearizes)
    np.testing.assert_allclose(np.asarray(ut.conics)[live],
                               np.asarray(ewa.conics)[live], rtol=0.08,
                               atol=0.02)


def test_distort_opencv_zero_is_identity(rng):
    xy = jnp.asarray(rng.normal(size=(32, 2)) * 0.3, jnp.float32)
    out = cameras.distort_opencv(xy, jnp.zeros((32, 1)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(xy), atol=1e-7)
    # positive k1 pushes points outward
    out2 = cameras.distort_opencv(xy, jnp.full((32, 1), 0.2))
    r0 = np.linalg.norm(np.asarray(xy), axis=-1)
    r1 = np.linalg.norm(np.asarray(out2), axis=-1)
    assert (r1 >= r0 - 1e-7).all() and r1.max() > r0.max()


def test_fisheye_matches_pinhole_on_axis():
    K = jnp.asarray([[60.0, 0, 32], [0, 60.0, 32], [0, 0, 1]])
    # on-axis point projects to the principal point in both models
    p = jnp.asarray([[0.0, 0.0, 2.0]])
    uv_f = cameras.project_fisheye(p, K)
    np.testing.assert_allclose(np.asarray(uv_f), [[32.0, 32.0]], atol=1e-5)
    # small angle: fisheye ~= pinhole (theta ~ tan(theta))
    p2 = jnp.asarray([[0.02, -0.01, 2.0]])
    uv_f2 = np.asarray(cameras.project_fisheye(p2, K))
    uv_p2 = np.asarray(cameras.camera_project(p2, K))
    np.testing.assert_allclose(uv_f2, uv_p2, atol=1e-3)
    # wide angle: fisheye pulls points INSIDE the pinhole projection
    p3 = jnp.asarray([[2.0, 0.0, 1.0]])
    uv_f3 = np.asarray(cameras.project_fisheye(p3, K))
    uv_p3 = np.asarray(cameras.camera_project(p3, K))
    assert uv_f3[0, 0] < uv_p3[0, 0]


def test_rasterize_fisheye_end_to_end(rng):
    means, quats, scales, vm, K = _scene(rng)
    N = means.shape[0]
    opac = jnp.full((N,), 0.8)
    colors = jnp.asarray(rng.uniform(0, 1, (N, 3)), jnp.float32)
    out, alpha, _ = rasterizer.rasterize(
        means, quats, scales, opac, colors, vm, K, width=64, height=64,
        render_mode="RGB", impl="jax", camera_model="fisheye")
    out, alpha = np.asarray(out), np.asarray(alpha)
    # fisheye compresses the FOV -> lower coverage than pinhole; just require
    # a meaningful rendered footprint
    assert np.isfinite(out).all() and alpha.mean() > 0.02

    # distorted pinhole also runs end-to-end
    out2, alpha2, _ = rasterizer.rasterize(
        means, quats, scales, opac, colors, vm, K, width=64, height=64,
        render_mode="RGB", impl="jax",
        radial_coeffs=jnp.asarray([[0.1, 0.01]]))
    assert np.isfinite(np.asarray(out2)).all()
    # zero-distortion UT render matches the EWA render closely
    out3, _, _ = rasterizer.rasterize(
        means, quats, scales, opac, colors, vm, K, width=64, height=64,
        render_mode="RGB", impl="jax",
        radial_coeffs=jnp.zeros((1, 1)))
    ref, _, _ = rasterizer.rasterize(
        means, quats, scales, opac, colors, vm, K, width=64, height=64,
        render_mode="RGB", impl="jax")
    assert np.abs(np.asarray(out3) - np.asarray(ref)).mean() < 5e-3
