"""Training stack tests: CenterSnap model, losses, tar pipeline, checkpointing."""

import io
import os
import tarfile

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hunyuanworld_mirror_tpu.models import centersnap
from hunyuanworld_mirror_tpu.training import checkpoint as ckpt_lib
from hunyuanworld_mirror_tpu.training import data as data_lib
from hunyuanworld_mirror_tpu.training import losses


def tiny_cs_config():
    return centersnap.CenterSnapConfig(
        img_size=64, patch_size=16, embed_dim=32, trunk_depth=2, trunk_heads=2,
        heatmap_features=16)


class TestCenterSnapModel:
    def test_forward_shapes(self, rng):
        cfg = tiny_cs_config()
        params = centersnap.init(jax.random.PRNGKey(0), cfg)
        rgb = jnp.asarray(rng.uniform(size=(2, 64, 64, 3)), jnp.float32)
        depth = jnp.asarray(rng.uniform(size=(2, 64, 64)), jnp.float32)
        out = centersnap.forward(params, cfg, rgb, depth)
        assert out["heatmap"].shape == (2, 64, 64, 1)
        assert out["pose_map"].shape == (2, 32, 32, 12)
        assert 0 <= float(out["heatmap"].min()) and float(out["heatmap"].max()) <= 1

    def test_loss_and_grads(self, rng):
        cfg = tiny_cs_config()
        params = centersnap.init(jax.random.PRNGKey(0), cfg)
        rgb = jnp.asarray(rng.uniform(size=(2, 64, 64, 3)), jnp.float32)
        batch = {
            "heatmap": jnp.asarray(rng.uniform(size=(2, 64, 64)), jnp.float32),
            "pose_map": jnp.asarray(rng.normal(size=(2, 32, 32, 12)), jnp.float32),
        }

        def loss_fn(p):
            preds = centersnap.forward(p, cfg, rgb)
            total, logs = losses.centersnap_loss(preds, batch)
            return total

        loss, g = jax.value_and_grad(loss_fn)(params)
        assert np.isfinite(float(loss))
        assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))


class TestLossParity:
    def test_masked_l1_matches_reference(self, rng):
        from conftest import torch_reference
        torch = torch_reference()
        import sys
        sys.path.insert(0, "/root/reference")
        from training.losses.loss import MaskedL1Loss

        pred = rng.normal(size=(2, 6, 16, 16)).astype(np.float32)
        target = rng.normal(size=(2, 6, 16, 16)).astype(np.float32)
        heat = rng.uniform(size=(2, 32, 32)).astype(np.float32)

        ref = MaskedL1Loss()(torch.from_numpy(pred), torch.from_numpy(target),
                             torch.from_numpy(heat)).item()
        ours = float(losses.masked_l1_loss(
            jnp.asarray(pred.transpose(0, 2, 3, 1)),
            jnp.asarray(target.transpose(0, 2, 3, 1)),
            jnp.asarray(heat)))
        np.testing.assert_allclose(ours, ref, rtol=1e-5)

    def test_psnr_ssim_sanity(self, rng):
        a = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)), jnp.float32)
        assert float(losses.psnr(a, a)) > 100
        assert float(losses.ssim(a, a)) > 0.999
        b = jnp.clip(a + 0.1, 0, 1)
        assert float(losses.ssim(a, b)) < 0.999


def _make_shard(path, n, rng, with_depth=True):
    with tarfile.open(path, "w") as tf:
        for i in range(n):
            key = f"sample_{i:05d}"
            from PIL import Image
            img = (rng.uniform(size=(32, 32, 3)) * 255).astype(np.uint8)
            buf = io.BytesIO()
            Image.fromarray(img).save(buf, format="PNG")
            data = buf.getvalue()
            info = tarfile.TarInfo(f"{key}.color.png")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))

            for name, arr in (("heatmap", rng.uniform(size=(32, 32))),
                              ("pose_map", rng.normal(size=(12, 16, 16)))):
                buf = io.BytesIO()
                np.savez(buf, arr=arr.astype(np.float32))
                data = buf.getvalue()
                info = tarfile.TarInfo(f"{key}.{name}.npz")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))


class TestDataPipeline:
    def test_tar_roundtrip(self, tmp_path, rng):
        _make_shard(tmp_path / "shard-000.tar", 7, rng)
        _make_shard(tmp_path / "shard-001.tar", 7, rng)
        loader = data_lib.ShardedLoader(str(tmp_path / "shard-*.tar"),
                                        batch_size=4, shuffle_buffer=8)
        batches = list(loader.epoch(0))
        assert len(batches) == 3  # 14 samples -> 3 full batches of 4
        b = batches[0]
        assert b["rgb"].shape == (4, 32, 32, 3)
        assert b["heatmap"].shape == (4, 32, 32)
        assert b["pose_map"].shape == (4, 12, 16, 16)

    def test_epoch_shuffling_differs(self, tmp_path, rng):
        _make_shard(tmp_path / "shard-000.tar", 16, rng)
        loader = data_lib.ShardedLoader(str(tmp_path / "shard-000.tar"),
                                        batch_size=16, shuffle_buffer=16,
                                        drop_keys=("meta",))
        b0 = next(iter(loader.epoch(0)))["__key__"]
        b1 = next(iter(loader.epoch(1)))["__key__"]
        assert list(b0) != list(b1)

    def test_brace_expansion(self):
        shards = data_lib.expand_shards("s3/shard-{000..003}.tar")
        assert shards == [f"s3/shard-{i:03d}.tar" for i in range(4)]

    def test_corrupt_sample_skipped(self, tmp_path, rng):
        _make_shard(tmp_path / "shard-000.tar", 4, rng)
        with tarfile.open(tmp_path / "shard-000.tar", "a") as tf:
            bad = b"not a png"
            info = tarfile.TarInfo("zzz_bad.color.png")
            info.size = len(bad)
            tf.addfile(info, io.BytesIO(bad))
        loader = data_lib.ShardedLoader(str(tmp_path / "shard-000.tar"),
                                        batch_size=4, shuffle_buffer=1)
        batches = list(loader.epoch(0))
        assert len(batches) == 1  # corrupt sample dropped


class TestCheckpoint:
    def test_params_roundtrip(self, tmp_path, rng):
        cfg = tiny_cs_config()
        params = centersnap.init(jax.random.PRNGKey(0), cfg)
        path = str(tmp_path / "ckpt.npz")
        ckpt_lib.save_params(path, params, step=123)
        loaded, step = ckpt_lib.load_train_state(path)
        assert step == 123
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_opt_state_resume(self, tmp_path, rng):
        import optax
        cfg = tiny_cs_config()
        params = centersnap.init(jax.random.PRNGKey(0), cfg)
        tx = optax.adamw(1e-3)
        opt_state = tx.init(params)
        g = jax.tree.map(jnp.ones_like, params)
        _, opt_state = tx.update(g, opt_state, params)

        path = str(tmp_path / "ckpt.npz")
        ckpt_lib.save_params(path, params, step=1, opt_state=opt_state)
        restored = ckpt_lib.restore_opt_state(path, tx.init(params))
        for a, b in zip(jax.tree.leaves(opt_state), jax.tree.leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
