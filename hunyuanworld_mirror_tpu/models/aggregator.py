"""Visual geometry transformer: alternating frame/global attention over views.

Behavioral parity: reference src/models/models/visual_transformer.py:20-416 —
DINOv2 patch encoder, per-frame special tokens (camera + registers, frame 0
distinct), optional prior prompting (pose token / depth patch-embed added to
patch tokens / ray token), 2D RoPE (special tokens pinned at (0,0), grid
shifted +1), `depth` layers of (frame-attention, global-attention) pairs, and
intermediate capture of concat(frame ‖ global) tokens at fixed layer indices.

TPU stance (SURVEY.md §7.1):
  * the dual block lists become stacked param pytrees driven by `lax.scan`,
    segmented at the capture indices so intermediates fall out of the carry
    (no 24-layer activation stash);
  * frame attention runs on (B*S, N, C) — embarrassingly parallel over views,
    the natural sharding axis; global attention on (B, S*N, C) is the only
    cross-view mixing point (see parallel/ for its collective form);
  * everything is bf16 except LayerNorm statistics.
"""

from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from . import nn, dinov2
from .block import (block, block_init, patch_embed_conv, patch_embed_conv_init,
                    patch_embed_mlp, patch_embed_mlp_init)
from .rope import grid_positions, make_rope_tables, tile_tables

_RESNET_MEAN = (0.485, 0.456, 0.406)
_RESNET_STD = (0.229, 0.224, 0.225)


@dataclass(frozen=True)
class VGTConfig:
    img_size: int = 518
    patch_size: int = 14
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    num_register_tokens: int = 4
    patch_embed: str = "dinov2_vitl14_reg"
    qk_norm: bool = True
    rope_freq: float = 100.0
    init_values: float = 0.01
    enable_cond: bool = False
    intermediate_idxs: Tuple[int, ...] = (4, 11, 17, 23)
    # Fork variant (reference models/models/visual_transformer.py:194-448):
    # frame-attention-only trunk, intermediates are frame outputs (dim C, not
    # the 2C frame-global concat).
    frame_only: bool = False

    @property
    def patch_start_idx(self) -> int:
        # [cam | registers | (pose | ray |)] patches
        if self.enable_cond:
            return 1 + self.num_register_tokens + 1 + 1
        return 1 + self.num_register_tokens

    @property
    def vit_config(self) -> dinov2.DinoViTConfig:
        import dataclasses
        base = dinov2.VIT_FACTORIES[self.patch_embed]
        # keep the factory's architecture knobs (ffn_layer, rope flags, ...)
        return dataclasses.replace(
            base, img_size=self.img_size, patch_size=self.patch_size,
            num_register_tokens=self.num_register_tokens)


def init(key, cfg: VGTConfig):
    keys = jax.random.split(key, 8)

    if "conv" in cfg.patch_embed:
        if "mlp" in cfg.patch_embed:
            pe = patch_embed_mlp_init(keys[0], cfg.patch_size, 3, cfg.embed_dim)
        else:
            pe = patch_embed_conv_init(keys[0], cfg.patch_size, 3, cfg.embed_dim)
    else:
        pe = dinov2.init(keys[0], cfg.vit_config)

    def make_blocks(k):
        ks = jax.random.split(k, cfg.depth)
        return nn.stack_params([
            block_init(ks[i], cfg.embed_dim, cfg.num_heads, cfg.mlp_ratio,
                       init_values=cfg.init_values, qk_norm=cfg.qk_norm)
            for i in range(cfg.depth)
        ])

    params = {
        "patch_embed": pe,
        # (1, 2, X, C): slot 0 is frame 0's token, slot 1 every other frame.
        "cam_token": nn.trunc_normal(keys[3], (1, 2, 1, cfg.embed_dim), 1e-6),
        "reg_token": nn.trunc_normal(keys[4], (1, 2, cfg.num_register_tokens, cfg.embed_dim), 1e-6),
        "frame_blocks": make_blocks(keys[1]),
    }
    if not cfg.frame_only:
        params["global_blocks"] = make_blocks(keys[2])

    if cfg.enable_cond:
        params["pose_embed"] = nn.silu_mlp_init(keys[5], 7, cfg.embed_dim, cfg.embed_dim)
        params["depth_embed"] = patch_embed_mlp_init(keys[6], cfg.patch_size, 1, cfg.embed_dim)
        params["ray_embed"] = nn.silu_mlp_init(keys[7], 4, cfg.embed_dim, cfg.embed_dim)

    return params


def _expand_special_tokens(token: jnp.ndarray, b: int, s: int, dtype) -> jnp.ndarray:
    """(1, 2, X, C) -> (B*S, X, C): slot 0 for frame 0, slot 1 for frames 1..S-1."""
    first = jnp.broadcast_to(token[:, 0:1], (b, 1) + token.shape[2:])
    rest = jnp.broadcast_to(token[:, 1:2], (b, s - 1) + token.shape[2:]) if s > 1 else None
    combined = first if rest is None else jnp.concatenate([first, rest], axis=1)
    return combined.reshape(b * s, *token.shape[2:]).astype(dtype)


def forward(params, cfg: VGTConfig, images: jnp.ndarray,
            priors: Optional[Tuple] = None,
            cond_flags: Sequence[int] = (0, 0, 0),
            dtype=jnp.bfloat16, ring_mesh=None) -> Tuple[List[jnp.ndarray], int]:
    """Run the alternating-attention trunk.

    Args:
      images: (B, S, H, W, 3) in [0, 1] (NHWC).
      priors: optional (depth_maps (B,S,H,W), ray_dirs (B,S,4), poses (B,S,7)).
      cond_flags: static (use_pose, use_depth, use_rays) switches.
      ring_mesh: optional device Mesh — global-attention layers then run as
        ring attention over the mesh's "view" axis (parallel/ring.py) instead
        of one dense GSPMD SDPA; frame attention stays local either way.
    Returns:
      (list of 4 intermediates, each (B, S, N, 2*C) with N = patch_start + P,
       patch_start_idx).
    """
    B, S, H, W, _ = images.shape
    C = cfg.embed_dim
    p = cfg.patch_size
    h0, w0 = H // p, W // p
    P = h0 * w0

    depth_maps, ray_dirs, poses = priors if priors is not None else (None, None, None)

    mean = jnp.asarray(_RESNET_MEAN, dtype).reshape(1, 1, 1, 3)
    std = jnp.asarray(_RESNET_STD, dtype).reshape(1, 1, 1, 3)
    imgs = (images.reshape(B * S, H, W, 3).astype(dtype) - mean) / std

    if "conv" in cfg.patch_embed:
        if "mlp" in cfg.patch_embed:
            patch_tokens = patch_embed_mlp(params["patch_embed"], imgs, p)
        else:
            patch_tokens = patch_embed_conv(params["patch_embed"], imgs, p)
    else:
        patch_tokens = dinov2.forward_features(params["patch_embed"], cfg.vit_config,
                                               imgs, dtype=dtype)

    cam_tokens = _expand_special_tokens(params["cam_token"], B, S, dtype)
    reg_tokens = _expand_special_tokens(params["reg_token"], B, S, dtype)

    if cfg.enable_cond:
        # Pose prior -> single token (zeros when disabled).
        if cond_flags[0] and poses is not None:
            pose_tok = nn.silu_mlp(params["pose_embed"],
                                   poses.reshape(B * S, 7).astype(dtype))[:, None, :]
        else:
            pose_tok = jnp.zeros((B * S, 1, C), dtype)
        # Depth prior -> patch-aligned tokens ADDED to image patch tokens.
        if cond_flags[1] and depth_maps is not None:
            d = depth_maps.reshape(B * S, H, W, 1).astype(dtype)
            patch_tokens = patch_tokens + patch_embed_mlp(params["depth_embed"], d, p)
        # Ray (intrinsics) prior -> single token.
        if cond_flags[2] and ray_dirs is not None:
            ray_tok = nn.silu_mlp(params["ray_embed"],
                                  ray_dirs.reshape(B * S, 4).astype(dtype))[:, None, :]
        else:
            ray_tok = jnp.zeros((B * S, 1, C), dtype)
        tokens = jnp.concatenate([cam_tokens, reg_tokens, pose_tok, ray_tok,
                                  patch_tokens], axis=1)
    else:
        tokens = jnp.concatenate([cam_tokens, reg_tokens, patch_tokens], axis=1)

    N = tokens.shape[1]
    start = cfg.patch_start_idx

    rope_frame = None
    rope_global = None
    if cfg.rope_freq > 0:
        positions = grid_positions(h0, w0, start)
        rope_frame = make_rope_tables(positions, C // cfg.num_heads, cfg.rope_freq)
        rope_global = tile_tables(rope_frame, S)

    def layer(carry, layer_params):
        x = carry  # (B, S, N, C)
        xf = x.reshape(B * S, N, C)
        xf = block(layer_params["frame"], xf, cfg.num_heads, rope=rope_frame)
        if cfg.frame_only:
            out = xf.reshape(B, S, N, C)
            return out, out
        xg = block(layer_params["global"], xf.reshape(B, S * N, C),
                   cfg.num_heads, rope=rope_global, ring_mesh=ring_mesh)
        return xg.reshape(B, S, N, C), xf.reshape(B, S, N, C)

    # Scan in segments ending at each capture index; the final (frame, global)
    # pair of each segment is the captured intermediate.
    if cfg.frame_only:
        paired = {"frame": params["frame_blocks"]}
    else:
        paired = {"frame": params["frame_blocks"], "global": params["global_blocks"]}
    x = tokens.reshape(B, S, N, C)
    captured = {}
    seg_start = 0
    for idx in sorted(set(cfg.intermediate_idxs)):
        seg = jax.tree.map(lambda a: a[seg_start:idx + 1], paired)

        def seg_scan(carry, lp):
            out, xf = layer(carry, lp)
            return out, None

        # run all but the segment's last layer in scan, last layer eagerly to
        # grab the frame-attention output for the capture
        n_layers = idx + 1 - seg_start
        if n_layers > 1:
            body = jax.tree.map(lambda a: a[:-1], seg)
            x, _ = lax.scan(seg_scan, x, body)
        last = jax.tree.map(lambda a: a[-1], seg)
        x, xf = layer(x, last)
        if cfg.frame_only:
            captured[idx] = x  # (B, S, N, C)
        else:
            captured[idx] = jnp.concatenate([xf, x], axis=-1)  # (B, S, N, 2C)
        seg_start = idx + 1
    outputs = [captured[i] for i in cfg.intermediate_idxs]

    # Any trailing layers after the last capture index still run (parity with
    # a full-depth loop), though the default config captures the final layer.
    if seg_start < cfg.depth:
        tail = jax.tree.map(lambda a: a[seg_start:], paired)

        def tail_scan(carry, lp):
            out, _ = layer(carry, lp)
            return out, None

        x, _ = lax.scan(tail_scan, x, tail)

    return outputs, start
