"""Iterative camera regression head.

Behavioral parity: reference src/models/heads/camera_head.py:10-166 — takes
the per-view camera token (dim 2*embed), runs `steps` refinement iterations of
DiT-style adaptive modulation (shift/scale/gate conditioned on the current
estimate) -> 4 transformer blocks (tokens attend across views) -> MLP delta,
with activations (trans: linear, quat: linear, fov: relu) applied per step.
The refinement loop is a static Python unroll (4 steps) — each step's blocks
are the same params, XLA shares them.
"""

from dataclasses import dataclass
from typing import List

import jax
import jax.numpy as jnp

from . import nn
from .block import block, block_init


@dataclass(frozen=True)
class CameraHeadConfig:
    dim_in: int = 2048
    trunk_depth: int = 4
    num_heads: int = 16
    mlp_ratio: float = 4.0
    init_values: float = 0.01
    out_dim: int = 9


def init(key, cfg: CameraHeadConfig):
    keys = jax.random.split(key, cfg.trunk_depth + 4)
    trunk = [
        block_init(keys[i], cfg.dim_in, cfg.num_heads, cfg.mlp_ratio,
                   init_values=cfg.init_values)
        for i in range(cfg.trunk_depth)
    ]
    return {
        "trunk": trunk,  # list (not stacked): 4 sequential blocks, run unrolled
        "token_norm": nn.layer_norm_init(cfg.dim_in),
        "out_norm": nn.layer_norm_init(cfg.dim_in),
        "init_token": jnp.zeros((1, 1, cfg.out_dim), jnp.float32),
        "param_embed": nn.linear_init(keys[-1], cfg.out_dim, cfg.dim_in),
        "adapt_norm_gen": nn.linear_init(keys[-2], cfg.dim_in, 3 * cfg.dim_in),
        "param_predictor": nn.mlp_init(keys[-3], cfg.dim_in, cfg.dim_in // 2, cfg.out_dim),
    }


def _activate(params: jnp.ndarray) -> jnp.ndarray:
    """trans: linear, quat: linear, fov: relu (reference :22-26,106-147)."""
    trans = params[..., :3]
    quat = params[..., 3:7]
    fov = jax.nn.relu(params[..., 7:])
    return jnp.concatenate([trans, quat, fov], axis=-1)


def forward(p, cfg: CameraHeadConfig, feat_seq: List[jnp.ndarray],
            steps: int = 4) -> List[jnp.ndarray]:
    """Predict per-view camera 9-vectors.

    Args:
      feat_seq: aggregator intermediates; last one's token 0 is the camera
        token, shape (B, S, N, 2*embed).
    Returns:
      list of (B, S, 9) activated camera vectors, one per refinement step.
    """
    cam_tokens = feat_seq[-1][:, :, 0].astype(jnp.float32)  # (B, S, D)
    cam_tokens = nn.layer_norm(p["token_norm"], cam_tokens, eps=1e-5)
    B, S, D = cam_tokens.shape

    pred_seq = []
    curr_pred = None
    for _ in range(steps):
        if curr_pred is None:
            net_input = nn.linear(p["param_embed"],
                                  jnp.broadcast_to(p["init_token"], (B, S, cfg.out_dim)))
        else:
            net_input = nn.linear(p["param_embed"], jax.lax.stop_gradient(curr_pred))

        mod = nn.linear(p["adapt_norm_gen"], jax.nn.silu(net_input))
        shift, scale, gate = jnp.split(mod, 3, axis=-1)
        # adaptive LayerNorm (no affine, eps 1e-6) + modulation + gate
        normed = nn.layer_norm({}, cam_tokens, eps=1e-6)
        feat = gate * (normed * (1 + scale) + shift) + cam_tokens

        for blk in p["trunk"]:
            feat = block(blk, feat, cfg.num_heads)

        delta = nn.mlp(p["param_predictor"], nn.layer_norm(p["out_norm"], feat, eps=1e-5))
        curr_pred = delta if curr_pred is None else curr_pred + delta
        pred_seq.append(_activate(curr_pred))

    return pred_seq
