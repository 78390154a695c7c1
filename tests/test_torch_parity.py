"""Numeric parity: our JAX modules vs the reference torch modules.

Strategy: instantiate the REFERENCE torch modules with random init, export
their state_dict through tools/convert_weights.py, run both sides on the same
inputs in fp32, and compare outputs. This validates both the architecture and
the checkpoint-conversion contract without needing the HF release weights.
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, "/root/repo")

from hunyuanworld_mirror_tpu.models import aggregator, camera_head, dpt, dinov2, gaussians
from tools import convert_weights as cw

from conftest import torch_reference


def _sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


@pytest.fixture(scope="module")
def torch_mods():
    torch = torch_reference()
    torch.manual_seed(0)
    from src.models.models.visual_transformer import VisualGeometryTransformer
    from src.models.heads.camera_head import CameraHead
    from src.models.heads.dense_head import DPTHead
    from src.models.layers.vision_transformer import vit_small
    return torch, VisualGeometryTransformer, CameraHead, DPTHead, vit_small


class TestDinoV2Parity:
    def test_vit_small_features(self, torch_mods, rng):
        torch, _, _, _, vit_small = torch_mods
        model = vit_small(img_size=112, patch_size=14, num_register_tokens=4,
                          init_values=1.0, block_chunks=0,
                          interpolate_antialias=True, interpolate_offset=0.0).eval()
        x = rng.uniform(size=(2, 3, 112, 112)).astype(np.float32)
        with torch.no_grad():
            ref = model.forward_features(torch.from_numpy(x))["x_norm_patchtokens"].numpy()

        cfg = dinov2.DinoViTConfig(img_size=112, patch_size=14, embed_dim=384,
                                   depth=12, num_heads=6)
        params = cw.convert_dinov2(_sd(model))
        ours = dinov2.forward_features(params, cfg,
                                       jnp.asarray(x.transpose(0, 2, 3, 1)),
                                       dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4)

    def test_vit_swiglu_features(self, torch_mods, rng):
        """giant2-style SwiGLUFFNFused blocks (reference swiglu_ffn.py:49-62,
        vision_transformer.py:378-392) — run a small-width stand-in."""
        torch, *_ = torch_mods
        from src.models.layers.vision_transformer import DinoVisionTransformer
        model = DinoVisionTransformer(
            img_size=112, patch_size=14, embed_dim=96, depth=2, num_heads=3,
            num_register_tokens=4, init_values=1.0, block_chunks=0,
            ffn_layer="swiglufused", interpolate_antialias=True,
            interpolate_offset=0.0).eval()
        x = rng.uniform(size=(1, 3, 112, 112)).astype(np.float32)
        with torch.no_grad():
            ref = model.forward_features(torch.from_numpy(x))["x_norm_patchtokens"].numpy()

        cfg = dinov2.DinoViTConfig(img_size=112, patch_size=14, embed_dim=96,
                                   depth=2, num_heads=3, ffn_layer="swiglufused")
        params = cw.convert_dinov2(_sd(model))
        ours = dinov2.forward_features(params, cfg,
                                       jnp.asarray(x.transpose(0, 2, 3, 1)),
                                       dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4)


class TestVGTParity:
    @pytest.mark.parametrize("cond", [(0, 0, 0), (1, 1, 1)])
    def test_conv_vgt(self, torch_mods, rng, cond):
        torch, VGT, _, _, _ = torch_mods
        ref_model = VGT(img_size=56, patch_size=14, embed_dim=64, depth=2,
                        num_heads=4, patch_embed="conv", enable_cond=True,
                        intermediate_idxs=[0, 1]).eval()
        x = rng.uniform(size=(1, 3, 3, 56, 56)).astype(np.float32)
        depths = rng.uniform(size=(1, 3, 56, 56)).astype(np.float32)
        rays = rng.uniform(size=(1, 3, 4)).astype(np.float32)
        poses = rng.normal(size=(1, 3, 7)).astype(np.float32)

        with torch.no_grad():
            ref_out, ref_start = ref_model(
                torch.from_numpy(x),
                priors=(torch.from_numpy(depths), torch.from_numpy(rays),
                        torch.from_numpy(poses)),
                cond_flags=list(cond))
        ref_out = [o.numpy() for o in ref_out]

        cfg = aggregator.VGTConfig(img_size=56, patch_size=14, embed_dim=64,
                                   depth=2, num_heads=4, patch_embed="conv",
                                   enable_cond=True, intermediate_idxs=(0, 1))
        params = cw.convert_vgt(_sd(ref_model))
        ours, start = aggregator.forward(
            params, cfg, jnp.asarray(x.transpose(0, 1, 3, 4, 2)),
            priors=(jnp.asarray(depths), jnp.asarray(rays), jnp.asarray(poses)),
            cond_flags=cond, dtype=jnp.float32)

        assert start == ref_start
        assert len(ours) == len(ref_out)
        for o, r in zip(ours, ref_out):
            # ref shape (B, S, N, 2C) == ours
            np.testing.assert_allclose(np.asarray(o), r, atol=5e-4)


class TestCameraHeadParity:
    def test_forward(self, torch_mods, rng):
        torch, _, CameraHead, _, _ = torch_mods
        ref = CameraHead(dim_in=128, trunk_depth=2, num_heads=4).eval()
        feats = rng.normal(size=(2, 3, 10, 128)).astype(np.float32)
        with torch.no_grad():
            ref_seq = ref([torch.from_numpy(feats)])
        ref_last = ref_seq[-1].numpy()

        cfg = camera_head.CameraHeadConfig(dim_in=128, trunk_depth=2, num_heads=4)
        params = cw.convert_camera_head(_sd(ref))
        ours = camera_head.forward(params, cfg, [jnp.asarray(feats)])
        np.testing.assert_allclose(np.asarray(ours[-1]), ref_last, atol=5e-5)


class TestDPTParity:
    @pytest.mark.parametrize("gsdpt", [False, True])
    def test_forward(self, torch_mods, rng, gsdpt):
        torch, _, _, DPTHead, _ = torch_mods
        dim_in, feats = 64, 32
        ref = DPTHead(dim_in=dim_in, output_dim=2, patch_size=14,
                      features=feats, out_channels=[16, 32, 64, 64],
                      activation="exp+expp1", is_gsdpt=gsdpt).eval()
        B, S, H, W = 1, 2, 56, 56
        tokens = [rng.normal(size=(B, S, 5 + 16, dim_in)).astype(np.float32) * 0.2
                  for _ in range(4)]
        imgs = rng.uniform(size=(B, S, 3, H, W)).astype(np.float32)

        with torch.no_grad():
            ref_out = ref([torch.from_numpy(t) for t in tokens],
                          torch.from_numpy(imgs), patch_start_idx=5)

        cfg = dpt.DPTConfig(dim_in=dim_in, patch_size=14, output_dim=2,
                            features=feats, out_channels=(16, 32, 64, 64),
                            activation="exp+expp1", is_gsdpt=gsdpt)
        params = cw.convert_dpt(_sd(ref), is_gsdpt=gsdpt)
        ours = dpt.forward(params, cfg, [jnp.asarray(t) for t in tokens],
                           jnp.asarray(imgs.transpose(0, 1, 3, 4, 2)), 5)

        # reference preds/conf are already channel-last (activate_head permutes
        # to NHWC, dense_head.py:312); only the gsdpt fused features stay NCHW
        if gsdpt:
            fused_r, preds_r, conf_r = [o.numpy() for o in ref_out]
            fused_o, preds_o, conf_o = ours
            np.testing.assert_allclose(np.asarray(fused_o),
                                       fused_r.transpose(0, 1, 3, 4, 2), atol=5e-4)
        else:
            preds_r, conf_r = [o.numpy() for o in ref_out]
            preds_o, conf_o = ours
        np.testing.assert_allclose(np.asarray(preds_o), preds_r,
                                   atol=5e-4, rtol=2e-3)
        np.testing.assert_allclose(np.asarray(conf_o), conf_r,
                                   atol=5e-4, rtol=2e-3)


class TestGsHeadParity:
    def test_conv_stack(self, torch_mods, rng):
        torch = torch_mods[0]
        sys.path.insert(0, "/root/reference")
        import importlib.util
        # GaussianSplatRenderer imports gsplat (CUDA); grab just its conv head
        # by rebuilding the module structure it defines
        import torch.nn as tnn
        feature_dim = 32
        raw_ch = 4 + 3 + 1 + 3 + 1
        ref_head = tnn.Sequential(
            tnn.Conv2d(feature_dim // 2, feature_dim, 3, padding=1, bias=False),
            tnn.ReLU(True),
            tnn.Conv2d(feature_dim, raw_ch, 1),
        ).eval()
        x = rng.normal(size=(2, feature_dim // 2, 8, 8)).astype(np.float32)
        with torch.no_grad():
            ref_out = ref_head(torch.from_numpy(x)).numpy()

        sd = {f"gs_head.{k}": v.detach().numpy() for k, v in ref_head.state_dict().items()}
        params = cw.convert_gs_renderer(sd)
        ours = gaussians._gs_head_apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(ours), ref_out.transpose(0, 2, 3, 1),
                                   atol=1e-5)
