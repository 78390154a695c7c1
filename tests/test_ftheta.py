"""F-theta camera model: projection, ray inversion, rasterization.

Parity target: reference Cameras.cuh:1049-1195 (FThetaCameraModel) and
submodules/gsplat/tests/test_ftheta.py. The polynomial coefficients below are
the reference test's published NVIDIA ftheta calibration
(test_ftheta.py:92-110).
"""

import numpy as np
import jax.numpy as jnp

from hunyuanworld_mirror_tpu.ops import cameras as cam
from hunyuanworld_mirror_tpu.ops import rasterizer

from test_rasterizer import _random_scene

# the reference calibration is for a ~3848px-wide sensor (delta ~ 118*theta);
# scale the forward poly down to our 128px test images and rebuild the inverse
_SCALE = 0.2
FTHETA = cam.FThetaParams(
    reference_poly=cam.ANGLE_TO_PIXELDIST,
    pixeldist_to_angle_poly=(
        0.0, 8.4335003e-03 / _SCALE, 2.3174282e-06 / _SCALE,
        -5.0478608e-08 / _SCALE, 6.1392608e-10 / _SCALE,
        -1.7447865e-12 / _SCALE),
    angle_to_pixeldist_poly=(
        0.0, 118.43232 * _SCALE, -2.562147 * _SCALE, 6.317949 * _SCALE,
        -10.41861 * _SCALE, 3.6694396 * _SCALE),
    max_angle=1000.0,
    linear_cde=(9.9968284e-01, 1.8735906e-05, 1.7659619e-05),
)


def test_newton_poly_inverse():
    """Newton inversion recovers theta from the forward polynomial."""
    theta = jnp.linspace(0.01, 0.8, 64)
    delta = cam._horner(FTHETA.angle_to_pixeldist_poly, theta)
    theta2 = cam._newton_invert_poly(FTHETA.angle_to_pixeldist_poly,
                                     FTHETA.pixeldist_to_angle_poly, delta)
    np.testing.assert_allclose(np.asarray(theta2), np.asarray(theta),
                               atol=1e-4)


def test_ftheta_ray_roundtrip(rng):
    """world point -> ftheta pixel -> ray passes through the point."""
    viewmat = np.eye(4, dtype=np.float32)
    viewmat[:3, 3] = [0.1, -0.2, 0.3]
    K = np.array([[1.0, 0, 64.0], [0, 1.0, 48.0], [0, 0, 1]], np.float32)

    pts_w = rng.normal(size=(64, 3)).astype(np.float32) * 0.5
    pts_w[:, 2] += 3.0
    pts_c = pts_w @ viewmat[:3, :3].T + viewmat[:3, 3]

    uv = cam.camera_project(jnp.asarray(pts_c), jnp.asarray(K), cam.FTHETA,
                            ftheta=FTHETA)
    assert np.isfinite(np.asarray(uv)).all()
    origin, dirs = cam.image_point_to_world_ray(
        uv, jnp.asarray(viewmat), jnp.asarray(K), cam.FTHETA, ftheta=FTHETA)

    v = jnp.asarray(pts_w) - origin[None]
    t = jnp.sum(v * dirs, axis=-1, keepdims=True)
    closest = origin[None] + t * dirs
    d = np.asarray(jnp.linalg.norm(jnp.asarray(pts_w) - closest, axis=-1))
    assert d.max() < 1e-3, d.max()


def test_ftheta_reference_poly_modes_agree(rng):
    """PIXELDIST_TO_ANGLE (Newton on the bw poly) vs ANGLE_TO_PIXELDIST
    (direct fw eval) produce the same pixels where the pair are inverses."""
    K = np.array([[1.0, 0, 64.0], [0, 1.0, 48.0], [0, 0, 1]], np.float32)
    pts_c = rng.normal(size=(64, 3)).astype(np.float32) * 0.5
    pts_c[:, 2] += 3.0

    uv_fw = cam.camera_project(jnp.asarray(pts_c), jnp.asarray(K),
                               cam.FTHETA, ftheta=FTHETA)
    bw = FTHETA._replace(reference_poly=cam.PIXELDIST_TO_ANGLE)
    uv_bw = cam.camera_project(jnp.asarray(pts_c), jnp.asarray(K),
                               cam.FTHETA, ftheta=bw)
    # the published polys are ~inverse of each other only approximately;
    # Newton converges onto the bw poly's own inverse, so allow sub-pixel slop
    assert np.abs(np.asarray(uv_fw) - np.asarray(uv_bw)).max() < 1.0


def test_ftheta_rasterize_conic_and_eval3d(rng):
    """End-to-end rasterization under ftheta: UT conic path and world-space
    eval3d path both render something finite (reference test_ftheta.py
    runs with_ut=True, with_eval3d=True)."""
    means, quats, scales, opac, colors, viewmats, Ks = _random_scene(
        rng, n=80, c=1)
    Ks = Ks.copy()
    Ks[:, 0, 0] = 1.0
    Ks[:, 1, 1] = 1.0

    common = dict(width=64, height=48, render_mode="RGB",
                  camera_model="ftheta", ftheta_coeffs=FTHETA,
                  max_per_tile=512, max_tiles_per_gauss=9)
    for eval3d in (False, True):
        out, alpha, _ = rasterizer.rasterize(
            jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
            jnp.asarray(opac), jnp.asarray(colors), jnp.asarray(viewmats),
            jnp.asarray(Ks), with_eval3d=eval3d, **common)
        out, alpha = np.asarray(out), np.asarray(alpha)
        assert np.isfinite(out).all() and np.isfinite(alpha).all(), eval3d
        assert alpha.max() > 0.1, eval3d


def test_ortho_projection():
    """Orthographic model: x,y pass through K untouched by depth."""
    pts = jnp.asarray(np.array([[0.5, -0.25, 2.0], [0.5, -0.25, 7.0]],
                               np.float32))
    K = jnp.asarray(np.array([[80.0, 0, 64.0], [0, 80.0, 48.0], [0, 0, 1]],
                             np.float32))
    uv = np.asarray(cam.camera_project(pts, K, cam.ORTHO))
    np.testing.assert_allclose(uv[0], uv[1])
    np.testing.assert_allclose(uv[0], [0.5 * 80 + 64, -0.25 * 80 + 48],
                               rtol=1e-6)
