"""Schur-complement bundle adjustment: synthetic recovery + sharded parity.

Greenfield subsystem (no reference counterpart — BASELINE.json north star)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hunyuanworld_mirror_tpu.parallel import mesh as mesh_lib
from hunyuanworld_mirror_tpu.refine import ba
from hunyuanworld_mirror_tpu.utils.rotation import se3_exp, so3_exp


def test_se3_exp_identity_and_rotation():
    np.testing.assert_allclose(np.asarray(se3_exp(jnp.zeros(6))), np.eye(4), atol=1e-7)
    # pure z-rotation by pi/2
    T = np.asarray(se3_exp(jnp.array([0.0, 0.0, np.pi / 2, 0.0, 0.0, 0.0])))
    np.testing.assert_allclose(T[:3, :3] @ np.array([1.0, 0, 0]), [0, 1, 0], atol=1e-6)
    # gradient finite at zero
    g = jax.grad(lambda t: jnp.sum(se3_exp(t)))(jnp.zeros(6))
    assert np.isfinite(np.asarray(g)).all()


def _synthetic_problem(rng, S=4, M=64, noise=0.0):
    pts = jnp.asarray(rng.uniform(-1, 1, (M, 3)) + np.array([0, 0, 4.0]))
    K = jnp.broadcast_to(
        jnp.array([[100.0, 0, 64], [0, 100.0, 64], [0, 0, 1]]), (S, 3, 3))
    # cameras: small twists around identity, all looking down +z
    twists = jnp.asarray(rng.uniform(-0.05, 0.05, (S, 6)))
    w2c = se3_exp(twists)
    uv, z, _ = ba._project(pts, w2c, K)
    uv = uv + rng.normal(0, noise, uv.shape) if noise else uv
    tracks = ba.Tracks(points=pts, uv=uv,
                       mask=jnp.ones((M, S), bool),
                       weight=jnp.ones((M, S), jnp.float32))
    return w2c, K, tracks


def test_ba_recovers_perturbed_bundle(rng):
    w2c_gt, K, tracks = _synthetic_problem(rng)
    # perturb cameras AND landmarks -> a genuinely inconsistent initial bundle
    d = jnp.asarray(rng.uniform(-0.02, 0.02, (w2c_gt.shape[0], 6)))
    d = d.at[0].set(0.0)  # pin the gauge to frame 0
    tracks_noisy = tracks._replace(
        points=tracks.points + jnp.asarray(rng.normal(0, 0.01, tracks.points.shape)))
    w2c0 = se3_exp(d) @ w2c_gt

    w2c_ref, pts_ref, cost0, cost = jax.jit(
        lambda w, t: ba.bundle_adjust(w, K, t, iters=15))(w2c0, tracks_noisy)
    assert float(cost0) > 1e2
    assert float(cost) < 1e-4 * float(cost0), (float(cost0), float(cost))

    # relative poses (gauge-free) should match GT
    rel_ref = np.asarray(w2c_ref[1:] @ jnp.linalg.inv(w2c_ref[:1]))
    rel_gt = np.asarray(w2c_gt[1:] @ jnp.linalg.inv(w2c_gt[:1]))
    np.testing.assert_allclose(rel_ref, rel_gt, atol=5e-3)


def test_ba_sharded_matches_single(rng):
    w2c_gt, K, tracks = _synthetic_problem(rng, S=4, M=64)
    d = jnp.asarray(rng.uniform(-0.02, 0.02, (4, 6)))
    w2c0 = se3_exp(d) @ w2c_gt

    ref_poses, _, _, ref_cost = ba.bundle_adjust(w2c0, K, tracks, iters=8)
    mesh = mesh_lib.make_mesh(1, 8, 1)
    sh_poses, _, _, sh_cost = jax.jit(
        lambda w, t: ba.bundle_adjust(w, K, t, iters=8, mesh=mesh))(w2c0, tracks)
    np.testing.assert_allclose(np.asarray(sh_poses), np.asarray(ref_poses),
                               atol=1e-4, rtol=1e-4)
    # both converge to (near) zero; compare absolutely at f32 resolution
    np.testing.assert_allclose(float(sh_cost), float(ref_cost), atol=1e-6)


def test_build_tracks_and_refine_pipeline(rng):
    """Perfectly consistent predictions -> BA is (near) a no-op; noisy depth
    predictions -> BA reduces the reprojection cost."""
    from hunyuanworld_mirror_tpu.utils import camera as cam_utils
    from hunyuanworld_mirror_tpu.utils.geometry import depth_to_world_coords_points

    S, H, W = 3, 32, 32
    K = jnp.broadcast_to(jnp.array([[40.0, 0, 16], [0, 40.0, 16], [0, 0, 1]]),
                         (S, 3, 3))
    w2c = se3_exp(jnp.asarray(rng.uniform(-0.03, 0.03, (S, 6))))
    depth = jnp.asarray(2.0 + 0.1 * rng.random((S, H, W)), jnp.float32)
    # smooth depth so bilinear sampling at reprojections stays consistent
    depth = jnp.ones((S, H, W), jnp.float32) * 2.5
    c2w = cam_utils.se3_inverse(w2c)
    pts3d, _, _ = depth_to_world_coords_points(depth, c2w, K)

    preds = {
        "pts3d": pts3d[None], "pts3d_conf": jnp.ones((1, S, H, W)),
        "depth": depth[None, ..., None], "camera_poses": c2w[None],
        "camera_intrs": K[None],
    }
    out = ba.refine_cameras(preds, stride=8, iters=5)
    assert float(out["ba_cost"]) <= float(out["ba_cost0"]) + 1e-6
    # consistent input => tiny residual throughout
    assert float(out["ba_cost0"]) < 1.0
    assert np.isfinite(np.asarray(out["camera_poses"])).all()
