"""DINOv2-style ViT encoder (frozen patch-feature extractor).

Behavioral parity: reference src/models/layers/vision_transformer.py:37-392 —
cls token + register tokens, bicubic pos-embed interpolation, pre-LN blocks
(no QK-norm, LayerScale init 1.0 as instantiated by the aggregator,
reference src/models/models/visual_transformer.py:111-170), final LayerNorm,
returns patch tokens only.

TPU stance: the block stack is scanned (`lax.scan` over stacked params); the
whole encoder is shape-static for a given (H, W) so XLA compiles one fused
program; runs in bf16.
"""

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from . import nn
from .block import block, block_init, patch_embed_conv, patch_embed_conv_init


@dataclass(frozen=True)
class DinoViTConfig:
    img_size: int = 518
    patch_size: int = 14
    in_chans: int = 3
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    num_register_tokens: int = 4
    init_values: float = 1.0
    norm_eps: float = 1e-6
    ffn_layer: str = "mlp"
    # DINOv3-style variants: axial RoPE inside attention instead of (or in
    # addition to) the learned pos embed (reference fork
    # models/models/visual_transformer.py:20-74 wraps a frozen DINOv3
    # vit_small/base at patch 16; the dinov3 submodule is EMPTY in the
    # snapshot, so this is a public-spec reimplementation of the contract:
    # frozen backbone -> x_norm_patchtokens)
    use_rope: bool = False
    rope_freq: float = 100.0
    use_pos_embed: bool = True


VIT_SMALL = DinoViTConfig(embed_dim=384, depth=12, num_heads=6)
VIT_BASE = DinoViTConfig(embed_dim=768, depth=12, num_heads=12)
VIT_LARGE = DinoViTConfig(embed_dim=1024, depth=24, num_heads=16)
# giant2 uses the fused SwiGLU FFN (reference vision_transformer.py:378-392)
VIT_GIANT2 = DinoViTConfig(embed_dim=1536, depth=40, num_heads=24,
                           ffn_layer="swiglufused")

# DINOv3-style ViTs: patch 16, RoPE, 4 storage (register) tokens, no learned
# pos embed — the wrapper contract the fork's CenterSnap backbone names
# (dinov3_vits16 / dinov3_vitb16, reference visual_transformer.py:301-304)
VIT_DINOV3_SMALL = DinoViTConfig(img_size=592, patch_size=16, embed_dim=384,
                                 depth=12, num_heads=6, use_rope=True,
                                 use_pos_embed=False)
VIT_DINOV3_BASE = DinoViTConfig(img_size=592, patch_size=16, embed_dim=768,
                                depth=12, num_heads=12, use_rope=True,
                                use_pos_embed=False)

VIT_FACTORIES = {
    "dinov2_vits14_reg": VIT_SMALL,
    "dinov2_vitb14_reg": VIT_BASE,
    "dinov2_vitl14_reg": VIT_LARGE,
    "dinov2_vitg2_reg": VIT_GIANT2,
    "dinov3_vits16": VIT_DINOV3_SMALL,
    "dinov3_vitb16": VIT_DINOV3_BASE,
}


def init(key, cfg: DinoViTConfig):
    n_patches = (cfg.img_size // cfg.patch_size) ** 2
    keys = jax.random.split(key, cfg.depth + 4)
    blocks = [
        block_init(keys[i], cfg.embed_dim, cfg.num_heads, cfg.mlp_ratio,
                   init_values=cfg.init_values, ffn_layer=cfg.ffn_layer)
        for i in range(cfg.depth)
    ]
    return {
        "patch_embed": patch_embed_conv_init(keys[-1], cfg.patch_size,
                                             cfg.in_chans, cfg.embed_dim),
        "cls_token": nn.trunc_normal(keys[-2], (1, 1, cfg.embed_dim), 1e-6),
        "register_tokens": nn.trunc_normal(keys[-3], (1, cfg.num_register_tokens, cfg.embed_dim), 1e-6),
        "pos_embed": nn.trunc_normal(keys[-4], (1, n_patches + 1, cfg.embed_dim), 0.02),
        "blocks": nn.stack_params(blocks),
        "norm": nn.layer_norm_init(cfg.embed_dim),
    }


def interpolate_pos_embed(pos_embed: jnp.ndarray, cfg: DinoViTConfig,
                          h: int, w: int) -> jnp.ndarray:
    """Bicubic-resample the (1, N+1, D) pos embed to an (h/p, w/p) grid.

    Mirrors reference vision_transformer.py:175-207 (antialias on, offset 0,
    i.e. plain size-targeted bicubic).
    """
    n = pos_embed.shape[1] - 1
    h0, w0 = h // cfg.patch_size, w // cfg.patch_size
    if n == h0 * w0 and h == w:
        return pos_embed
    cls_pe = pos_embed[:, :1]
    patch_pe = pos_embed[:, 1:]
    m = int(round(n ** 0.5))
    patch_pe = patch_pe.reshape(1, m, m, -1).astype(jnp.float32)
    patch_pe = jax.image.resize(patch_pe, (1, h0, w0, patch_pe.shape[-1]),
                                method="bicubic", antialias=True)
    patch_pe = patch_pe.reshape(1, h0 * w0, -1)
    return jnp.concatenate([cls_pe, patch_pe.astype(pos_embed.dtype)], axis=1)


def forward_features(params, cfg: DinoViTConfig, images: jnp.ndarray,
                     dtype=jnp.bfloat16) -> jnp.ndarray:
    """Encode images to normalized patch tokens.

    Args:
      images: (B, H, W, 3), already ImageNet-normalized.
    Returns:
      (B, h0*w0, D) x_norm_patchtokens.
    """
    B, H, W, _ = images.shape
    x = patch_embed_conv(params["patch_embed"], images.astype(dtype), cfg.patch_size)

    cls = jnp.broadcast_to(params["cls_token"].astype(dtype), (B, 1, cfg.embed_dim))
    x = jnp.concatenate([cls, x], axis=1)
    if cfg.use_pos_embed:
        x = x + interpolate_pos_embed(params["pos_embed"], cfg, H, W).astype(dtype)

    regs = jnp.broadcast_to(params["register_tokens"].astype(dtype),
                            (B, cfg.num_register_tokens, cfg.embed_dim))
    x = jnp.concatenate([x[:, :1], regs, x[:, 1:]], axis=1)

    rope = None
    if cfg.use_rope:
        from .rope import grid_positions, make_rope_tables
        pos = grid_positions(H // cfg.patch_size, W // cfg.patch_size,
                             1 + cfg.num_register_tokens)
        rope = make_rope_tables(pos, cfg.embed_dim // cfg.num_heads,
                                cfg.rope_freq)

    def body(carry, layer_params):
        return block(layer_params, carry, cfg.num_heads, rope=rope,
                     norm_eps=cfg.norm_eps), None

    x, _ = lax.scan(body, x, params["blocks"])
    x = nn.layer_norm(params["norm"], x, eps=cfg.norm_eps)
    return x[:, 1 + cfg.num_register_tokens:]
