"""Rolling-shutter projection and ray generation.

Parity target: reference Cameras.cuh:276-430 (interpolate_shutter_pose,
shutter_relative_frame_time, world_point_to_image_point_shutter_pose, 10
fixed-point iterations) and cuda/_wrapper.py:31-36 RollingShutterType, as
exercised by ProjectionUT3DGSFused.cu:72-99 (depth at mid-frame pose).
"""

import numpy as np
import jax.numpy as jnp

from hunyuanworld_mirror_tpu.ops import cameras as cam
from hunyuanworld_mirror_tpu.ops import rasterizer
from hunyuanworld_mirror_tpu.utils.rotation import quat_to_rotmat

from test_rasterizer import _random_scene

W, H = 64, 48
K = np.array([[60.0, 0, 32.0], [0, 60.0, 24.0], [0, 0, 1]], np.float32)


def _pose_pair(dx=0.4, dyaw=0.08):
    """Start/end world->cam poses of a camera translating+yawing mid-frame."""
    vm0 = np.eye(4, dtype=np.float32)
    ca, sa = np.cos(dyaw), np.sin(dyaw)
    vm1 = np.array([[ca, 0, sa, dx], [0, 1, 0, 0],
                    [-sa, 0, ca, 0], [0, 0, 0, 1]], np.float32)
    return vm0, vm1


def test_slerp_endpoints_and_midpoint(rng):
    q0 = rng.normal(size=4).astype(np.float32)
    q0 /= np.linalg.norm(q0)
    q1 = rng.normal(size=4).astype(np.float32)
    q1 /= np.linalg.norm(q1)
    s0 = np.asarray(cam._quat_slerp(jnp.asarray(q0), jnp.asarray(q1),
                                    jnp.zeros(())))
    s1 = np.asarray(cam._quat_slerp(jnp.asarray(q0), jnp.asarray(q1),
                                    jnp.ones(())))
    # sign-ambiguous: compare rotations
    np.testing.assert_allclose(np.asarray(quat_to_rotmat(jnp.asarray(s0))),
                               np.asarray(quat_to_rotmat(jnp.asarray(q0))),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(quat_to_rotmat(jnp.asarray(s1))),
                               np.asarray(quat_to_rotmat(jnp.asarray(q1))),
                               atol=1e-5)


def test_shutter_time_orders():
    uv = jnp.asarray(np.array([[0.5, 0.5], [W - 0.5, H - 0.5]], np.float32))
    t = cam.shutter_relative_time(uv, W, H, cam.SHUTTER_TOP_TO_BOTTOM)
    np.testing.assert_allclose(np.asarray(t), [0.0, 1.0])
    t = cam.shutter_relative_time(uv, W, H, cam.SHUTTER_BOTTOM_TO_TOP)
    np.testing.assert_allclose(np.asarray(t), [1.0, 0.0])
    t = cam.shutter_relative_time(uv, W, H, cam.SHUTTER_LEFT_TO_RIGHT)
    np.testing.assert_allclose(np.asarray(t), [0.0, 1.0])
    t = cam.shutter_relative_time(uv, W, H, cam.SHUTTER_RIGHT_TO_LEFT)
    np.testing.assert_allclose(np.asarray(t), [1.0, 0.0])


def test_identical_poses_match_global(rng):
    """start == end pose: rolling shutter must reduce to global projection."""
    vm0, _ = _pose_pair()
    pts = rng.normal(size=(64, 3)).astype(np.float32)
    pts[:, 2] += 4.0
    q0, t0 = cam._viewmat_pose(jnp.asarray(vm0))
    uv_rs, valid = cam.world_point_to_image_shutter(
        jnp.asarray(pts), jnp.asarray(K), (q0, t0), (q0, t0), W, H,
        cam.SHUTTER_TOP_TO_BOTTOM)
    uv_gl = cam.camera_project(
        jnp.asarray(pts @ vm0[:3, :3].T + vm0[:3, 3]), jnp.asarray(K))
    np.testing.assert_allclose(np.asarray(uv_rs), np.asarray(uv_gl),
                               atol=1e-3)
    assert np.asarray(valid).any()


def test_fixed_point_consistency(rng):
    """Converged RS projection satisfies its own equation: re-projecting with
    the pose at the solved pixel's shutter time reproduces the pixel."""
    vm0, vm1 = _pose_pair()
    pts = rng.normal(size=(128, 3)).astype(np.float32) * 0.6
    pts[:, 2] += 4.0
    q0, t0 = cam._viewmat_pose(jnp.asarray(vm0))
    q1, t1 = cam._viewmat_pose(jnp.asarray(vm1))
    uv, valid = cam.world_point_to_image_shutter(
        jnp.asarray(pts), jnp.asarray(K), (q0, t0), (q1, t1), W, H,
        cam.SHUTTER_TOP_TO_BOTTOM)
    tr = cam.shutter_relative_time(uv, W, H, cam.SHUTTER_TOP_TO_BOTTOM)
    q = cam._quat_slerp(q0, q1, tr)
    t = (1 - tr)[..., None] * t0 + tr[..., None] * t1
    pts_c = cam._quat_rotate(q, jnp.asarray(pts)) + t
    uv2 = cam.camera_project(pts_c, jnp.asarray(K))
    v = np.asarray(valid)
    err = np.abs(np.asarray(uv2) - np.asarray(uv))[v]
    assert v.sum() > 32
    assert err.max() < 0.51, err.max()  # floor() quantizes time per row


def test_rs_differs_from_global(rng):
    """A fast mid-frame camera motion must shift bottom rows, not top rows."""
    vm0, vm1 = _pose_pair(dx=0.8, dyaw=0.0)
    q0, t0 = cam._viewmat_pose(jnp.asarray(vm0))
    q1, t1 = cam._viewmat_pose(jnp.asarray(vm1))
    # two points: one imaging near the top, one near the bottom
    pts = np.array([[0.0, -1.5, 4.0], [0.0, 1.5, 4.0]], np.float32)
    uv_rs, _ = cam.world_point_to_image_shutter(
        jnp.asarray(pts), jnp.asarray(K), (q0, t0), (q1, t1), W, H,
        cam.SHUTTER_TOP_TO_BOTTOM)
    uv_gl = cam.camera_project(
        jnp.asarray(pts @ vm0[:3, :3].T + vm0[:3, 3]), jnp.asarray(K))
    shift = np.abs(np.asarray(uv_rs) - np.asarray(uv_gl))[:, 0]
    assert shift[0] < 1.0          # top row: pose ~ start pose
    assert shift[1] > 3.0          # bottom row: pose ~ end pose


def test_ray_roundtrip_rolling(rng):
    """RS ray generation inverts RS projection: cast a ray from the solved
    pixel and check it passes through the world point."""
    vm0, vm1 = _pose_pair()
    q0, t0 = cam._viewmat_pose(jnp.asarray(vm0))
    q1, t1 = cam._viewmat_pose(jnp.asarray(vm1))
    pts = rng.normal(size=(96, 3)).astype(np.float32) * 0.5
    pts[:, 2] += 4.0
    uv, valid = cam.world_point_to_image_shutter(
        jnp.asarray(pts), jnp.asarray(K), (q0, t0), (q1, t1), W, H,
        cam.SHUTTER_TOP_TO_BOTTOM)
    origin, dirs = cam.image_point_to_world_ray(
        uv, jnp.asarray(vm0), jnp.asarray(K),
        rolling_shutter=cam.SHUTTER_TOP_TO_BOTTOM,
        viewmat_rs=jnp.asarray(vm1), width=W, height=H)
    assert origin.shape == dirs.shape  # per-pixel origins under RS
    v = jnp.asarray(pts) - origin
    t = jnp.sum(v * dirs, axis=-1, keepdims=True) / \
        jnp.sum(dirs * dirs, axis=-1, keepdims=True)
    closest = origin + t * dirs
    d = np.asarray(jnp.linalg.norm(jnp.asarray(pts) - closest, axis=-1))
    m = np.asarray(valid)
    # ray pose time is quantized per row (floor) while the projection solve
    # converged on the same quantization -> sub-0.1 world-unit agreement
    assert m.sum() > 48
    assert d[m].max() < 0.02, d[m].max()


def test_rasterize_rolling_shutter_both_paths(rng):
    """End-to-end render under rolling shutter (conic/UT and eval3d): finite,
    non-empty, and actually different from the global-shutter render."""
    means, quats, scales, opac, colors, viewmats, Ks = _random_scene(
        rng, n=80, c=2)
    vm_rs = viewmats.copy()
    vm_rs[:, 0, 3] += 0.5  # strong intra-frame translation

    common = dict(width=W, height=H, render_mode="RGB",
                  max_per_tile=512, max_tiles_per_gauss=9)
    for eval3d in (False, True):
        out_gl, _, _ = rasterizer.rasterize(
            jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
            jnp.asarray(opac), jnp.asarray(colors), jnp.asarray(viewmats),
            jnp.asarray(Ks), with_eval3d=eval3d, **common)
        out_rs, alpha_rs, _ = rasterizer.rasterize(
            jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
            jnp.asarray(opac), jnp.asarray(colors), jnp.asarray(viewmats),
            jnp.asarray(Ks), with_eval3d=eval3d,
            rolling_shutter=cam.SHUTTER_TOP_TO_BOTTOM,
            viewmats_rs=jnp.asarray(vm_rs), **common)
        out_rs, alpha_rs = np.asarray(out_rs), np.asarray(alpha_rs)
        assert np.isfinite(out_rs).all() and np.isfinite(alpha_rs).all()
        assert alpha_rs.max() > 0.1, eval3d
        assert np.abs(out_rs - np.asarray(out_gl)).max() > 0.05, eval3d


def test_rasterize_rs_degenerate_matches_global(rng):
    """viewmats_rs == viewmats must reproduce the global-shutter image."""
    means, quats, scales, opac, colors, viewmats, Ks = _random_scene(
        rng, n=60, c=1)
    common = dict(width=W, height=H, render_mode="RGB",
                  max_per_tile=512, max_tiles_per_gauss=9)
    out_gl, _, _ = rasterizer.rasterize(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opac), jnp.asarray(colors), jnp.asarray(viewmats),
        jnp.asarray(Ks), **common)
    out_rs, _, _ = rasterizer.rasterize(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opac), jnp.asarray(colors), jnp.asarray(viewmats),
        jnp.asarray(Ks), rolling_shutter=cam.SHUTTER_TOP_TO_BOTTOM,
        viewmats_rs=jnp.asarray(viewmats), **common)
    # same geometry; conic path goes through UT instead of EWA, so allow a
    # small footprint-approximation tolerance
    diff = np.abs(np.asarray(out_rs) - np.asarray(out_gl))
    assert diff.mean() < 0.01, diff.mean()


def test_ut_params_knobs(rng):
    """UTParams plumbs through: require_any keeps more splats valid than
    require_all when the camera moves hard mid-frame; alpha change perturbs
    the recovered 2D covariance but not the mean."""
    from hunyuanworld_mirror_tpu.ops import projection
    vm0, vm1 = _pose_pair(dx=1.2, dyaw=0.2)
    means = rng.normal(size=(200, 3)).astype(np.float32) * 1.5
    means[:, 2] += 4.0
    quats = rng.normal(size=(200, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    scales = np.full((200, 3), 0.1, np.float32)
    covars = projection.quat_scale_to_covar(jnp.asarray(quats),
                                            jnp.asarray(scales))

    def run(ut):
        return cam.fully_fused_projection_ut(
            jnp.asarray(means), covars, jnp.asarray(vm0[None]),
            jnp.asarray(K[None]), W, H,
            rolling_shutter=cam.SHUTTER_TOP_TO_BOTTOM,
            viewmats_rs=jnp.asarray(vm1[None]), ut_params=ut)

    p_all = run(cam.UTParams(require_all_sigma_points_valid=True))
    p_any = run(cam.UTParams(require_all_sigma_points_valid=False))
    n_all = int((np.asarray(p_all.radii) > 0).sum())
    n_any = int((np.asarray(p_any.radii) > 0).sum())
    assert n_any >= n_all > 0

    # a wider in-image margin admits strictly-not-fewer valid splats
    p_tight = run(cam.UTParams(in_image_margin_factor=0.0))
    p_wide = run(cam.UTParams(in_image_margin_factor=0.5))
    n_tight = int((np.asarray(p_tight.radii) > 0).sum())
    n_wide = int((np.asarray(p_wide.radii) > 0).sum())
    assert n_wide >= n_tight > 0

    # alpha rescales the sigma spread -> different recovered 2D covariance
    p_a2 = run(cam.UTParams(alpha=0.5))
    live = ((np.asarray(p_all.radii) > 0).all(-1)
            & (np.asarray(p_a2.radii) > 0).all(-1))
    assert live.any()
    c1 = np.asarray(p_all.conics)[live]
    c2 = np.asarray(p_a2.conics)[live]
    assert np.abs(c1 - c2).max() > 1e-4
