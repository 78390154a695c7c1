"""End-to-end model tests on a tiny configuration (CPU-runnable)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hunyuanworld_mirror_tpu.models import worldmirror, aggregator, camera_head, dpt


def tiny_config(**kw):
    base = dict(
        img_size=56, patch_size=14, embed_dim=64, gs_dim=32,
        enable_cond=True, patch_embed="conv", trunk_depth=4, trunk_heads=4,
        intermediate_idxs=(0, 1, 2, 3),
    )
    base.update(kw)
    return worldmirror.WorldMirrorConfig(**base)


@pytest.fixture(scope="module")
def tiny_model():
    cfg = tiny_config()
    params = worldmirror.init(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _views(rng, b=1, s=2, hw=56):
    return {"img": jnp.asarray(rng.uniform(size=(b, s, hw, hw, 3)), jnp.float32)}


class TestAggregator:
    def test_shapes_and_capture(self, rng):
        cfg = tiny_config().vgt
        params = aggregator.init(jax.random.PRNGKey(1), cfg)
        imgs = jnp.asarray(rng.uniform(size=(2, 3, 56, 56, 3)), jnp.float32)
        outs, start = aggregator.forward(params, cfg, imgs)
        assert start == 1 + 4 + 1 + 1  # cam + registers + pose + ray
        P = (56 // 14) ** 2
        assert len(outs) == 4
        for o in outs:
            assert o.shape == (2, 3, start + P, 2 * cfg.embed_dim)

    def test_intermediates_differ(self, rng):
        cfg = tiny_config().vgt
        params = aggregator.init(jax.random.PRNGKey(1), cfg)
        imgs = jnp.asarray(rng.uniform(size=(1, 2, 56, 56, 3)), jnp.float32)
        outs, _ = aggregator.forward(params, cfg, imgs)
        assert float(jnp.abs(outs[0] - outs[-1]).max()) > 1e-6

    def test_cond_flags_change_output(self, rng):
        cfg = tiny_config().vgt
        params = aggregator.init(jax.random.PRNGKey(1), cfg)
        imgs = jnp.asarray(rng.uniform(size=(1, 2, 56, 56, 3)), jnp.float32)
        poses = jnp.asarray(rng.normal(size=(1, 2, 7)), jnp.float32)
        depths = jnp.asarray(rng.uniform(size=(1, 2, 56, 56)), jnp.float32)
        rays = jnp.asarray(rng.uniform(size=(1, 2, 4)), jnp.float32)
        out_off, _ = aggregator.forward(params, cfg, imgs,
                                        priors=(depths, rays, poses),
                                        cond_flags=(0, 0, 0))
        out_on, _ = aggregator.forward(params, cfg, imgs,
                                       priors=(depths, rays, poses),
                                       cond_flags=(1, 1, 1))
        assert float(jnp.abs(out_on[-1] - out_off[-1]).max()) > 1e-5


class TestFullModel:
    def test_forward_shapes(self, tiny_model, rng):
        cfg, params = tiny_model
        views = _views(rng, b=1, s=2)
        preds = worldmirror.forward(params, cfg, views)

        B, S, H, W = 1, 2, 56, 56
        assert preds["camera_params"].shape == (B, S, 9)
        assert preds["camera_poses"].shape == (B, S, 4, 4)
        assert preds["camera_intrs"].shape == (B, S, 3, 3)
        assert preds["depth"].shape == (B, S, H, W, 1)
        assert preds["depth_conf"].shape == (B, S, H, W)
        assert preds["pts3d"].shape == (B, S, H, W, 3)
        assert preds["normals"].shape == (B, S, H, W, 3)
        assert preds["gs_depth"].shape == (B, S, H, W, 1)
        assert preds["rendered_colors"].shape == (B, S, H, W, 3)
        assert preds["rendered_depths"].shape == (B, S, H, W, 1)
        # compaction truncates the splat set to a static cap <= S*H*W
        n_splats = preds["splats"]["means"].shape[1]
        assert preds["splats"]["means"].shape == (B, n_splats, 3)
        assert 0 < n_splats <= S * H * W

        for k, v in preds.items():
            if isinstance(v, dict):
                for kk, vv in v.items():
                    assert np.isfinite(np.asarray(vv)).all(), f"splats.{kk} not finite"
            else:
                assert np.isfinite(np.asarray(v)).all(), f"{k} not finite"

    def test_depth_positive_normals_unit(self, tiny_model, rng):
        cfg, params = tiny_model
        preds = worldmirror.forward(params, cfg, _views(rng))
        assert float(preds["depth"].min()) > 0  # exp activation
        n = np.linalg.norm(np.asarray(preds["normals"]), axis=-1)
        np.testing.assert_allclose(n, 1.0, atol=1e-4)  # norm activation
        assert float(preds["depth_conf"].min()) > 1.0  # expp1

    def test_camera_matrices_consistent(self, tiny_model, rng):
        cfg, params = tiny_model
        preds = worldmirror.forward(params, cfg, _views(rng), render=False)
        c2w = np.asarray(preds["camera_poses"])
        # valid SE(3): R orthonormal, last row [0,0,0,1]
        R = c2w[..., :3, :3]
        eye = np.einsum("bsij,bskj->bsik", R, R)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-4)
        np.testing.assert_allclose(c2w[..., 3, :],
                                   np.broadcast_to([0, 0, 0, 1], c2w[..., 3, :].shape),
                                   atol=1e-6)

    def test_prior_conditioning_path(self, tiny_model, rng):
        cfg, params = tiny_model
        views = _views(rng)
        views["camera_pose"] = jnp.broadcast_to(jnp.eye(4), (1, 2, 4, 4))
        views["depthmap"] = jnp.asarray(rng.uniform(0.5, 2.0, size=(1, 2, 56, 56)), jnp.float32)
        views["camera_intrinsics"] = jnp.broadcast_to(
            jnp.asarray([[60.0, 0, 28], [0, 60.0, 28], [0, 0, 1]]), (1, 2, 3, 3))
        p0 = worldmirror.forward(params, cfg, views, cond_flags=(0, 0, 0), render=False)
        p1 = worldmirror.forward(params, cfg, views, cond_flags=(1, 1, 1), render=False)
        assert float(jnp.abs(p1["depth"] - p0["depth"]).max()) > 1e-7

    def test_jit_compiles(self, tiny_model, rng):
        cfg, params = tiny_model
        views = _views(rng)
        fwd = jax.jit(lambda p, v: worldmirror.forward(p, cfg, v, render=False))
        preds = fwd(params, views)
        assert np.isfinite(np.asarray(preds["pts3d"])).all()


class TestGradients:
    def test_training_grads_finite(self, rng):
        cfg = tiny_config(enable_gs=False, enable_norm=False)
        params = worldmirror.init(jax.random.PRNGKey(0), cfg)
        views = _views(rng)

        def loss_fn(p):
            preds = worldmirror.forward(p, cfg, views, render=False)
            return (jnp.mean(preds["depth"]) + jnp.mean(preds["pts3d"] ** 2)
                    + jnp.mean(preds["camera_params"] ** 2))

        g = jax.grad(loss_fn)(params)
        leaves = jax.tree.leaves(g)
        assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
        assert any(float(jnp.abs(x).max()) > 0 for x in leaves)


class TestHeadChunking:
    def test_chunked_heads_match_unchunked(self, rng):
        """head_chunk only changes peak memory, never values (worldmirror.py
        _dpt_maybe_chunked; memory analogue of reference dense_head frame
        chunking)."""
        views = _views(rng, b=1, s=4)
        cfg0 = tiny_config(head_chunk=None)
        cfg2 = tiny_config(head_chunk=2)
        params = worldmirror.init(jax.random.PRNGKey(0), cfg0)
        p0 = worldmirror.forward(params, cfg0, views, render=False)
        p2 = worldmirror.forward(params, cfg2, views, render=False)
        flat0 = jax.tree_util.tree_flatten_with_path(p0)[0]
        flat2 = jax.tree.leaves(p2)
        for (path, a), b in zip(flat0, flat2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-5,
                                       err_msg=jax.tree_util.keystr(path))

    def test_indivisible_chunk_falls_back(self, rng):
        views = _views(rng, b=1, s=3)
        cfg = tiny_config(head_chunk=2)  # 3 % 2 != 0 -> unchunked path
        params = worldmirror.init(jax.random.PRNGKey(0), cfg)
        preds = worldmirror.forward(params, cfg, views, render=False)
        assert preds["depth"].shape[:2] == (1, 3)
