"""Splat post-optimization: loss decreases, densify/prune keeps shapes static."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hunyuanworld_mirror_tpu.training import splat_opt


def _scene(rng, n=80):
    means = rng.normal(size=(n, 3)).astype(np.float32) * 0.3
    means[:, 2] += 2.0
    quats = np.tile([1.0, 0, 0, 0], (n, 1)).astype(np.float32)  # wxyz identity
    scales = np.full((n, 3), 0.05, np.float32)
    opac = np.full((n,), 0.8, np.float32)
    sh = rng.normal(size=(n, 1, 3)).astype(np.float32) * 0.3
    splats = {"means": means, "quats": quats, "scales": scales,
              "opacities": opac, "sh": sh}
    c2w = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
    c2w[1, 0, 3] = 0.1
    K = np.tile(np.array([[40.0, 0, 16], [0, 40.0, 16], [0, 0, 1]],
                         dtype=np.float32), (2, 1, 1))
    return splats, c2w, K


class TestSplatOpt:
    def test_loss_decreases(self, rng):
        splats, c2w, K = _scene(rng)
        W = H = 32
        # target: render of a perturbed copy (so the optimum is reachable)
        target_splats = dict(splats)
        target_splats["sh"] = splats["sh"] + 0.5
        from hunyuanworld_mirror_tpu.training.splat_opt import (
            SplatOptConfig, _raw_from_splats, render_splats)
        from hunyuanworld_mirror_tpu.utils import camera as cam_utils
        cfg = SplatOptConfig(iters=30, refine_start=1000, max_per_tile=512,
                             tile_size=16)
        raw_t = _raw_from_splats({k: jnp.asarray(v) for k, v in target_splats.items()},
                                 splats["means"].shape[0])
        viewmats = cam_utils.se3_inverse(jnp.asarray(c2w))
        gt, _, _ = render_splats(raw_t, viewmats, jnp.asarray(K), W, H, cfg)
        gt_rgb = np.asarray(gt[..., :3])

        logs = []
        out = splat_opt.optimize_splats(splats, gt_rgb, c2w, K, cfg,
                                        log_fn=lambda s: logs.append(s))
        # re-render optimized splats and compare photometric error to the start
        raw_0 = _raw_from_splats({k: jnp.asarray(v) for k, v in splats.items()},
                                 splats["means"].shape[0])
        start, _, _ = render_splats(raw_0, viewmats, jnp.asarray(K), W, H, cfg)
        raw_f = _raw_from_splats({k: jnp.asarray(v) for k, v in out.items()},
                                 out["means"].shape[0])
        final, _, _ = render_splats(raw_f, viewmats, jnp.asarray(K), W, H, cfg)
        err0 = float(jnp.abs(start[..., :3] - gt_rgb).mean())
        err1 = float(jnp.abs(final[..., :3] - gt_rgb).mean())
        assert err1 < err0 * 0.8, (err0, err1)

    def test_refine_keeps_capacity(self, rng):
        splats, c2w, K = _scene(rng, n=40)
        from hunyuanworld_mirror_tpu.training.splat_opt import (
            SplatOptConfig, _raw_from_splats, refine)
        cfg = SplatOptConfig()
        cap = 80
        raw = _raw_from_splats({k: jnp.asarray(v) for k, v in splats.items()}, cap)
        grads = jnp.asarray(rng.uniform(0, 0.001, size=(cap,)), jnp.float32)
        grads = grads.at[:10].set(0.01)  # 10 hot splats
        out = refine(raw, grads, cfg, jax.random.PRNGKey(0))
        assert out["means"].shape == (cap, 3)
        n_alive = int(jnp.sum(out["alive"] > 0.5))
        assert n_alive >= 40  # grew into free slots
