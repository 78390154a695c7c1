"""World-space (eval3d) rasterization + inverse camera models.

Parity targets: reference RasterizeToPixelsFromWorld3DGSFwd.cu (ray-space
Gaussian evaluation) and Cameras.cuh image_point_to_world_ray. Strategy:
project->ray round-trips for every camera model, and eval3d-vs-conic
agreement in the regime where EWA is exact (small isotropic splats, pinhole).
"""

import numpy as np
import jax
import jax.numpy as jnp

from hunyuanworld_mirror_tpu.ops import cameras as cam
from hunyuanworld_mirror_tpu.ops import rasterizer

from test_rasterizer import _random_scene


class TestRayInversion:
    def _roundtrip(self, rng, camera_model, radial=None, tangential=None):
        """world point -> pixel (camera_project) -> ray -> does the ray pass
        through the point?"""
        viewmat = np.eye(4, dtype=np.float32)
        viewmat[:3, 3] = [0.1, -0.2, 0.3]
        K = np.array([[80.0, 0, 64.0], [0, 80.0, 48.0], [0, 0, 1]], np.float32)

        pts_w = rng.normal(size=(64, 3)).astype(np.float32) * 0.5
        pts_w[:, 2] += 3.0
        pts_c = pts_w @ viewmat[:3, :3].T + viewmat[:3, 3]

        uv = cam.camera_project(
            jnp.asarray(pts_c), jnp.asarray(K), camera_model,
            None if radial is None else jnp.asarray(radial),
            None if tangential is None else jnp.asarray(tangential))
        origin, dirs = cam.image_point_to_world_ray(
            uv, jnp.asarray(viewmat), jnp.asarray(K), camera_model,
            None if radial is None else jnp.asarray(radial),
            None if tangential is None else jnp.asarray(tangential))

        # distance from each world point to its pixel ray
        v = jnp.asarray(pts_w) - origin[None]
        t = jnp.sum(v * dirs, axis=-1, keepdims=True)
        closest = origin[None] + t * dirs
        d = np.asarray(jnp.linalg.norm(jnp.asarray(pts_w) - closest, axis=-1))
        assert d.max() < 1e-3, d.max()

    def test_pinhole(self, rng):
        self._roundtrip(rng, "pinhole")

    def test_pinhole_distorted(self, rng):
        self._roundtrip(rng, "pinhole",
                        radial=np.array([0.08, -0.02, 0.01], np.float32),
                        tangential=np.array([0.004, -0.003], np.float32))

    def test_fisheye(self, rng):
        self._roundtrip(rng, "fisheye")

    def test_fisheye_distorted(self, rng):
        self._roundtrip(rng, "fisheye",
                        radial=np.array([0.05, -0.01], np.float32))


class TestEval3D:
    def test_matches_conic_path_small_splats(self, rng):
        """For far, small splats under pinhole the EWA conic is near-exact, so
        world-space evaluation must agree with the 2D path."""
        means, quats, scales, opac, colors, viewmats, Ks = _random_scene(
            rng, n=120, c=2)

        common = dict(width=64, height=48, render_mode="RGB",
                      max_per_tile=512, max_tiles_per_gauss=9)
        # AA compensation on the conic side: eval3d has no eps2d dilation, so
        # the fair comparison is the antialiased 2D path
        out2d, a2d, _ = rasterizer.rasterize(
            jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
            jnp.asarray(opac), jnp.asarray(colors), jnp.asarray(viewmats),
            jnp.asarray(Ks), calc_compensations=True, **common)
        out3d, a3d, _ = rasterizer.rasterize(
            jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
            jnp.asarray(opac), jnp.asarray(colors), jnp.asarray(viewmats),
            jnp.asarray(Ks), with_eval3d=True, **common)

        # pixels can disagree at splat rims (alpha threshold crossings);
        # demand close agreement on the bulk
        diff = np.abs(np.asarray(out2d) - np.asarray(out3d))
        # measured: median ~0.007, p95 ~0.033 — the residual is the genuine
        # EWA-linearization vs exact-ray-evaluation model difference
        assert np.median(diff) < 0.012
        assert (diff < 0.05).mean() > 0.93
        assert np.abs(np.asarray(a2d) - np.asarray(a3d)).mean() < 0.03

    def test_fisheye_eval3d_renders(self, rng):
        means, quats, scales, opac, colors, viewmats, Ks = _random_scene(
            rng, n=80, c=1)
        out, alpha, meta = rasterizer.rasterize(
            jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
            jnp.asarray(opac), jnp.asarray(colors), jnp.asarray(viewmats),
            jnp.asarray(Ks), width=64, height=48, render_mode="RGB",
            camera_model="fisheye", with_eval3d=True,
            max_per_tile=512, max_tiles_per_gauss=9)
        out = np.asarray(out)
        alpha = np.asarray(alpha)
        assert np.isfinite(out).all() and np.isfinite(alpha).all()
        assert 0.0 <= alpha.min() and alpha.max() <= 1.0 + 1e-5
        assert alpha.max() > 0.1  # something actually rendered

    def test_eval3d_grad_flows(self, rng):
        means, quats, scales, opac, colors, viewmats, Ks = _random_scene(
            rng, n=40, c=1)

        def loss(m, o):
            out, _, _ = rasterizer.rasterize(
                m, jnp.asarray(quats), jnp.asarray(scales), o,
                jnp.asarray(colors), jnp.asarray(viewmats), jnp.asarray(Ks),
                width=32, height=24, render_mode="RGB", with_eval3d=True,
                max_per_tile=256, max_tiles_per_gauss=9)
            return jnp.sum(out ** 2)

        g_m, g_o = jax.grad(loss, argnums=(0, 1))(
            jnp.asarray(means), jnp.asarray(opac))
        assert np.isfinite(np.asarray(g_m)).all()
        assert np.isfinite(np.asarray(g_o)).all()
        assert np.abs(np.asarray(g_o)).max() > 0
