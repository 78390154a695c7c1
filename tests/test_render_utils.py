"""Novel-view rendering utilities + frustum masks."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from hunyuanworld_mirror_tpu.io import render as render_lib
from hunyuanworld_mirror_tpu.utils import frustum, rotation


class TestTrajectory:
    def test_slerp_endpoints(self, rng):
        q0 = rng.normal(size=4); q0 /= np.linalg.norm(q0)
        q1 = rng.normal(size=4); q1 /= np.linalg.norm(q1)
        t = np.array([0.0, 1.0])
        out = render_lib.slerp(q0, q1, t)
        assert min(np.abs(out[0] @ q0), 1) > 0.9999
        assert min(np.abs(out[1] @ q1), 1) > 0.9999

    def test_interpolated_trajectory(self, rng):
        S = 3
        c2w = np.tile(np.eye(4, dtype=np.float32), (S, 1, 1))
        c2w[:, 0, 3] = np.arange(S)
        K = np.tile(np.array([[100.0, 0, 32], [0, 100, 24], [0, 0, 1]],
                             dtype=np.float32), (S, 1, 1))
        traj, traj_K = render_lib.interpolate_trajectory(c2w, K, steps_per_pair=10)
        assert traj.shape == ((S - 1) * 10 + 1, 4, 4)
        # rotations stay orthonormal through slerp
        R = traj[:, :3, :3]
        eye = np.einsum("tij,tkj->tik", R, R)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
        # translation endpoints match input cameras
        np.testing.assert_allclose(traj[0, :3, 3], c2w[0, :3, 3], atol=1e-6)
        np.testing.assert_allclose(traj[-1, :3, 3], c2w[-1, :3, 3], atol=1e-6)

    def test_wobble_single_view(self):
        c2w = np.eye(4, dtype=np.float32)
        K = np.eye(3, dtype=np.float32)
        traj, traj_K = render_lib.interpolate_trajectory(c2w[None], K[None])
        assert len(traj) == 60
        radii = np.linalg.norm(traj[:, :3, 3], axis=-1)
        np.testing.assert_allclose(radii, 0.05, atol=1e-6)

    def test_video_roundtrip(self, tmp_path, rng):
        frames = rng.uniform(size=(5, 32, 48, 3)).astype(np.float32)
        path = render_lib.save_video(str(tmp_path / "test.mp4"), frames, fps=10)
        assert os.path.getsize(path) > 0
        import cv2
        cap = cv2.VideoCapture(path)
        assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 5
        cap.release()

    def test_turbo_colormap(self):
        x = np.linspace(0, 1, 10)
        rgb = render_lib.turbo_colormap(x)
        assert rgb.shape == (10, 3)
        assert rgb.min() >= 0 and rgb.max() <= 1
        # turbo goes blue (low) -> red (high); x=0 itself is near-black
        assert rgb[1, 2] > rgb[1, 0] and rgb[-1, 0] > rgb[-1, 2]


class TestFrustum:
    def test_self_visibility(self, rng):
        """A view's own depth map must be fully covered by itself."""
        H, W = 24, 32
        depth = jnp.asarray(rng.uniform(1.0, 3.0, size=(H, W)), jnp.float32)
        c2w = jnp.eye(4)
        K = jnp.asarray([[50.0, 0, W / 2], [0, 50.0, H / 2], [0, 0, 1]])
        mask = frustum.calculate_unprojected_mask(
            depth, c2w, K, depth[None], c2w[None], K[None])
        assert float(jnp.mean(mask)) > 0.99

    def test_disjoint_views_not_covered(self, rng):
        H, W = 24, 32
        depth = jnp.asarray(rng.uniform(1.0, 3.0, size=(H, W)), jnp.float32)
        c2w = jnp.eye(4)
        # context camera looking the opposite way
        flip = jnp.asarray(np.diag([1.0, 1, -1, 1]))
        K = jnp.asarray([[50.0, 0, W / 2], [0, 50.0, H / 2], [0, 0, 1]])
        mask = frustum.calculate_unprojected_mask(
            depth, c2w, K, depth[None], flip[None], K[None])
        assert float(jnp.mean(mask)) < 0.01

    def test_bilinear_sample_exact_at_integers(self, rng):
        img = jnp.asarray(rng.uniform(size=(8, 10)), jnp.float32)
        uv = jnp.asarray([[3.0, 2.0], [0.0, 0.0], [9.0, 7.0]])
        out = frustum.bilinear_sample(img, uv)
        np.testing.assert_allclose(np.asarray(out),
                                   [img[2, 3], img[0, 0], img[7, 9]], atol=1e-6)
