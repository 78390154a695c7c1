"""DINOv3-style backbone (patch 16, RoPE, storage tokens) for the fork
workload — the wrapper contract of reference
models/models/visual_transformer.py:20-74 (frozen backbone returning
x_norm_patchtokens); the dinov3 submodule itself is empty in the snapshot."""

import numpy as np
import jax
import jax.numpy as jnp

from hunyuanworld_mirror_tpu.models import centersnap, dinov2
from tools import convert_weights as cw


def test_dinov3_factory_forward(rng):
    import dataclasses
    cfg = dataclasses.replace(dinov2.VIT_FACTORIES["dinov3_vits16"],
                              img_size=64, embed_dim=64, depth=2, num_heads=4)
    assert cfg.patch_size == 16 and cfg.use_rope and not cfg.use_pos_embed
    params = dinov2.init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.uniform(size=(2, 64, 64, 3)).astype(np.float32))
    out = dinov2.forward_features(params, cfg, x, dtype=jnp.float32)
    assert out.shape == (2, 16, 64)          # 4x4 patches at /16
    assert np.isfinite(np.asarray(out)).all()

    # RoPE must make the encoding translation-sensitive spatially: permuting
    # patch content changes which token carries it
    x2 = jnp.asarray(np.roll(np.asarray(x), 16, axis=2))
    out2 = dinov2.forward_features(params, cfg, x2, dtype=jnp.float32)
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_centersnap_names_dinov3(rng):
    """CenterSnap config can name the dinov3 factory as its backbone."""
    cfg = centersnap.CenterSnapConfig(
        img_size=64, patch_size=16, embed_dim=384, trunk_depth=1,
        trunk_heads=6, patch_embed="dinov3_vits16",
        use_depth_condition=False)
    params = centersnap.init(jax.random.PRNGKey(0), cfg)
    rgb = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)).astype(np.float32))
    out = centersnap.forward(params, cfg, rgb)
    assert out["heatmap"].shape[0] == 1
    assert np.isfinite(np.asarray(out["heatmap"])).all()
    assert np.isfinite(np.asarray(out["pose_map"])).all()


def test_convert_dinov3_name_map(rng):
    """Converter accepts the public DINOv3 naming (storage_tokens, no
    pos_embed) and produces a params tree the runtime runs."""
    import dataclasses
    cfg = dataclasses.replace(dinov2.VIT_FACTORIES["dinov3_vits16"],
                              img_size=32, embed_dim=32, depth=1, num_heads=4)
    D = cfg.embed_dim
    sd = {
        "cls_token": rng.normal(size=(1, 1, D)).astype(np.float32),
        "storage_tokens": rng.normal(size=(1, 4, D)).astype(np.float32),
        "patch_embed.proj.weight": rng.normal(
            size=(D, 3, 16, 16)).astype(np.float32) * 0.02,
        "patch_embed.proj.bias": np.zeros((D,), np.float32),
        "norm.weight": np.ones((D,), np.float32),
        "norm.bias": np.zeros((D,), np.float32),
    }
    for nm in ("norm1", "norm2"):
        sd[f"blocks.0.{nm}.weight"] = np.ones((D,), np.float32)
        sd[f"blocks.0.{nm}.bias"] = np.zeros((D,), np.float32)
    sd["blocks.0.attn.qkv.weight"] = rng.normal(
        size=(3 * D, D)).astype(np.float32) * 0.02
    sd["blocks.0.attn.qkv.bias"] = np.zeros((3 * D,), np.float32)
    sd["blocks.0.attn.proj.weight"] = rng.normal(
        size=(D, D)).astype(np.float32) * 0.02
    sd["blocks.0.attn.proj.bias"] = np.zeros((D,), np.float32)
    sd["blocks.0.mlp.fc1.weight"] = rng.normal(
        size=(4 * D, D)).astype(np.float32) * 0.02
    sd["blocks.0.mlp.fc1.bias"] = np.zeros((4 * D,), np.float32)
    sd["blocks.0.mlp.fc2.weight"] = rng.normal(
        size=(D, 4 * D)).astype(np.float32) * 0.02
    sd["blocks.0.mlp.fc2.bias"] = np.zeros((D,), np.float32)
    sd["blocks.0.ls1.gamma"] = np.ones((D,), np.float32)
    sd["blocks.0.ls2.gamma"] = np.ones((D,), np.float32)

    params = cw.convert_dinov3(sd)
    x = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)).astype(np.float32))
    out = dinov2.forward_features(params, cfg, x, dtype=jnp.float32)
    assert out.shape == (1, 4, D)
    assert np.isfinite(np.asarray(out)).all()
