"""LPIPS (JAX AlexNet net) and TensorBoard event-writer tests."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from hunyuanworld_mirror_tpu.utils import lpips, metrics
from hunyuanworld_mirror_tpu.training import tb_writer


class TestLPIPS:
    def test_structure_and_basic_properties(self, rng):
        params = lpips.init_random(jax.random.PRNGKey(0))
        a = jnp.asarray(rng.uniform(size=(2, 64, 64, 3)).astype(np.float32))
        b = jnp.asarray(rng.uniform(size=(2, 64, 64, 3)).astype(np.float32))

        d_ab = np.asarray(lpips.distance(params, a, b))
        d_aa = np.asarray(lpips.distance(params, a, a))
        assert d_ab.shape == (2,)
        np.testing.assert_allclose(d_aa, 0.0, atol=1e-6)
        assert np.all(d_ab > 0)
        # symmetric by construction (squared diffs)
        d_ba = np.asarray(lpips.distance(params, b, a))
        np.testing.assert_allclose(d_ab, d_ba, rtol=1e-5)
        # monotone under growing perturbation
        d_small = float(lpips.distance(params, a, jnp.clip(a + 0.01, 0, 1))[0])
        d_big = float(lpips.distance(params, a, jnp.clip(a + 0.3, 0, 1))[0])
        assert d_big > d_small

    def test_feature_shapes_match_alexnet(self):
        """Tap resolutions/channels must match torchvision AlexNet features
        (reference lpips package net.slice1..5) for the converter to be
        meaningful."""
        params = lpips.init_random(jax.random.PRNGKey(0))
        feats = lpips._features(params, jnp.zeros((1, 64, 64, 3)))
        assert [f.shape[-1] for f in feats] == [64, 192, 384, 256, 256]
        # conv1 stride 4: 64 -> 15 (valid 11x11 s4 p2); pools halve
        assert feats[0].shape[1] == 15
        assert feats[1].shape[1] == 7

    def test_converter_roundtrip(self, rng):
        """convert_torch_state consumes the lpips-package naming and produces
        weights that reproduce a direct forward."""
        sd = {}
        feat_idx = [0, 3, 6, 8, 10]
        cins = [3, 64, 192, 384, 256]
        for i, (cout, k, _, _) in enumerate(lpips._ALEX):
            sd[f"features.{feat_idx[i]}.weight"] = rng.normal(
                size=(cout, cins[i], k, k)).astype(np.float32) * 0.05
            sd[f"features.{feat_idx[i]}.bias"] = rng.normal(
                size=(cout,)).astype(np.float32) * 0.05
        for i, c in enumerate(lpips._CHANNELS):
            sd[f"lin{i}.model.1.weight"] = rng.uniform(
                size=(1, c, 1, 1)).astype(np.float32) * 0.1
        params = lpips.convert_torch_state(sd)
        a = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)).astype(np.float32))
        d = float(lpips.distance(params, a, 1.0 - a)[0])
        assert np.isfinite(d) and d > 0

    def test_nvs_metrics_gate(self, rng, tmp_path):
        a = rng.uniform(size=(1, 32, 32, 3)).astype(np.float32)
        b = rng.uniform(size=(1, 32, 32, 3)).astype(np.float32)
        out = metrics.nvs_metrics(a, b)
        assert "psnr" in out and "ssim" in out
        assert "lpips" not in out  # gate closed: no calibrated weights
        params = lpips.init_random(jax.random.PRNGKey(0))
        out = metrics.nvs_metrics(a, b, lpips_params=params)
        assert out["lpips"] > 0


class TestTBWriter:
    def test_roundtrip(self, tmp_path):
        w = tb_writer.TBWriter(str(tmp_path))
        w.scalar("loss/train", 0.5, step=1)
        w.scalars({"loss/train": 0.25, "lr": 1e-4}, step=2)
        w.scalars({"skipped": "not-a-number", "kept": 3.0}, step=3)
        w.close()

        events = tb_writer.read_scalars(w.path)
        assert events[0] == (1, {"loss/train": 0.5})
        assert events[1][0] == 2
        np.testing.assert_allclose(events[1][1]["loss/train"], 0.25)
        np.testing.assert_allclose(events[1][1]["lr"], 1e-4, rtol=1e-6)
        assert events[2][1] == {"kept": 3.0}

    def test_crc_detects_corruption(self, tmp_path):
        w = tb_writer.TBWriter(str(tmp_path))
        w.scalar("x", 1.0, step=0)
        w.close()
        blob = bytearray(open(w.path, "rb").read())
        blob[-6] ^= 0xFF  # flip a payload byte
        bad = tmp_path / "corrupt"
        bad.write_bytes(bytes(blob))
        try:
            tb_writer.read_scalars(str(bad))
            assert False, "corruption not detected"
        except AssertionError as e:
            assert "crc" in str(e)

    def test_crc32c_known_vectors(self):
        # RFC 3720 test vectors for CRC32C
        assert tb_writer._crc32c(b"123456789") == 0xE3069283
        assert tb_writer._crc32c(b"\x00" * 32) == 0x8A9136AA

    def test_as_log_fn(self, tmp_path):
        w = tb_writer.TBWriter(str(tmp_path))
        fn = w.as_log_fn()
        fn("plain string message")       # ignored
        fn({"loss": 1.5})                # auto-step 0
        fn({"loss": 1.0}, step=7)
        w.close()
        events = tb_writer.read_scalars(w.path)
        assert [e[0] for e in events] == [0, 7]


class TestImageEvents:
    def test_png_roundtrip(self, rng):
        a = (rng.uniform(size=(13, 21, 3)) * 255).astype(np.uint8)
        assert (tb_writer.png_decode(tb_writer.png_encode(a)) == a).all()
        g = (rng.uniform(size=(7, 9)) * 255).astype(np.uint8)
        assert (tb_writer.png_decode(tb_writer.png_encode(g))[:, :, 0] == g).all()

    def test_image_event_roundtrip(self, rng, tmp_path):
        a = (rng.uniform(size=(16, 24, 3)) * 255).astype(np.uint8)
        w = tb_writer.TBWriter(str(tmp_path))
        w.scalar("loss", 1.5, 2)
        w.image("vis/grid", a, 5)
        w.image("vis/float", rng.uniform(size=(8, 8)), 6)
        w.close()
        ims = tb_writer.read_images(w.path)
        assert [(s, t) for s, t, _ in ims] == [(5, "vis/grid"), (6, "vis/float")]
        assert (ims[0][2] == a).all()
        assert ims[1][2].shape == (8, 8, 1)
        # scalars unaffected by interleaved image events
        assert (2, {"loss": 1.5}) in tb_writer.read_scalars(w.path)


class TestTrainingVisuals:
    def test_grids_and_overlays(self, rng):
        from hunyuanworld_mirror_tpu.training import visualize as vz

        B, H, W = 2, 48, 64
        rgb = rng.uniform(size=(B, H, W, 3)).astype(np.float32)
        heat = np.zeros((B, H, W), np.float32)
        heat[:, 20, 30] = 1.0
        pm = np.zeros((B, H // 2, W // 2, 12), np.float32)
        pm[..., 0] = 1.0  # rot6d -> identity
        pm[..., 4] = 1.0
        pm[..., 8] = 2.0  # z translation in front of camera
        pm[..., 9:] = 0.4  # bbox size
        batch = {"rgb": rgb, "heatmap": heat}
        preds = {"heatmap": heat[..., None], "pose_map": pm}
        out = vz.training_visuals(batch, preds)
        grid = out["vis/heatmaps"]
        assert grid.shape == (B * H, 3 * W, 3) and grid.dtype == np.uint8
        ov = out["vis/bbox_overlay"]
        assert ov.shape == (H, B * W, 3) and ov.dtype == np.uint8
        # the overlay must actually draw: wireframe pixels differ from rgb
        base = np.clip(rgb[0] * 255, 0, 255).astype(np.uint8)
        assert (ov[:, :W] != base).any()
