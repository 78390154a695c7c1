"""DPT dense prediction head (points / depth / normals / Gaussian features).

Behavioral parity: reference src/models/heads/dense_head.py:11-356 —
LayerNorm on tokens, 1x1 projections to [256,512,1024,1024], multi-scale
resize (x4 deconv, x2 deconv, identity, stride-2 conv), 3x3 scratch convs,
4 top-down FeatureFusionBlocks with ResidualConvUnits (align_corners=True
bilinear ups), 2-conv output head, sinusoidal UV pos-embeds (ratio 0.1), and
the "attr+conf" activation zoo. The GS variant additionally returns the fused
feature map with a 7x7 RGB `input_merger` injection.

TPU stance: NHWC everywhere; all resizes are the matmul-form align-corners
bilinear from ops/interpolate.py; the head runs fp32 (the reference disables
autocast for heads, worldmirror.py:146).
"""

from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from . import nn
from ..ops.interpolate import resize_bilinear
from ..utils.grid import create_uv_grid, position_grid_to_embed


@dataclass(frozen=True)
class DPTConfig:
    dim_in: int = 2048
    patch_size: int = 14
    output_dim: int = 4
    activation: str = "inv_log+expp1"
    features: int = 256
    out_channels: Tuple[int, ...] = (256, 512, 1024, 1024)
    pos_embed: bool = True
    down_ratio: int = 1
    is_gsdpt: bool = False
    # False -> no confidence channel: all output_dim channels are the
    # attribute and a single activation applies (fork heads, reference
    # models/heads/dense_head.py "linear"/"sigmoid" usage).
    with_conf: bool = True
    # conv/fusion compute dtype. The reference runs its heads fp32 (autocast
    # disabled, worldmirror.py:146) and that stays the default; "bfloat16"
    # halves the decoder's HBM traffic on TPU (activations at up to 518^2 are
    # bandwidth-bound) while the final activation math below stays fp32.
    compute_dtype: str = "float32"


def _residual_conv_unit_init(key, features: int):
    k1, k2 = jax.random.split(key)
    return {"conv1": nn.conv_init(k1, features, features, 3),
            "conv2": nn.conv_init(k2, features, features, 3)}


def _residual_conv_unit(p, x):
    # NB: the reference's ReLU(inplace=True) mutates its input, so the skip
    # path adds relu(x), NOT x (dense_head.py:445-455 — `out = activation(x)`
    # aliases x). Verified numerically in test_torch_parity.
    a = jax.nn.relu(x)
    out = nn.conv(p["conv1"], a, padding=1)
    out = nn.conv(p["conv2"], jax.nn.relu(out), padding=1)
    return out + a


def _fusion_block_init(key, features: int, has_residual: bool = True):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {"out_conv": nn.conv_init(k1, features, features, 1),
         "res2": _residual_conv_unit_init(k2, features)}
    if has_residual:
        p["res1"] = _residual_conv_unit_init(k3, features)
    return p


def _fusion_block(p, x, residual=None, size=None):
    if residual is not None:
        x = x + _residual_conv_unit(p["res1"], residual)
    x = _residual_conv_unit(p["res2"], x)
    if size is None:
        size = (x.shape[-3] * 2, x.shape[-2] * 2)
    # out_conv is 1x1 (pixel-wise linear in channels) and bilinear resize is
    # linear in pixels, so they commute exactly; conv BEFORE the ~2x upsample
    # runs on 4x fewer pixels (reference dense_head.py:472-476 convs after —
    # same math, this order is the cheap one)
    x = nn.conv(p["out_conv"], x)
    return resize_bilinear(x, size, align_corners=True)


def init(key, cfg: DPTConfig):
    n_levels = len(cfg.out_channels)
    keys = jax.random.split(key, 16)
    f = cfg.features

    params = {
        "norm": nn.layer_norm_init(cfg.dim_in),
        "projects": [nn.conv_init(keys[i], cfg.dim_in, oc, 1)
                     for i, oc in enumerate(cfg.out_channels)],
        "resize0": nn.conv_transpose_init(keys[4], cfg.out_channels[0], cfg.out_channels[0], 4),
        "resize1": nn.conv_transpose_init(keys[5], cfg.out_channels[1], cfg.out_channels[1], 2),
        "resize3": nn.conv_init(keys[6], cfg.out_channels[3], cfg.out_channels[3], 3),
        "layer_rn": [nn.conv_init(keys[7 + i], cfg.out_channels[i], f, 3, bias=False)
                     for i in range(n_levels)],
        "refine1": _fusion_block_init(keys[11], f),
        "refine2": _fusion_block_init(keys[12], f),
        "refine3": _fusion_block_init(keys[13], f),
        "refine4": _fusion_block_init(keys[14], f, has_residual=False),
    }
    k_out = jax.random.split(keys[15], 4)
    params["output_conv1"] = nn.conv_init(k_out[0], f, f // 2, 3)
    params["output_conv2"] = {
        "conv1": nn.conv_init(k_out[1], f // 2, 32, 3),
        "conv2": nn.conv_init(k_out[2], 32, cfg.output_dim, 1),
    }
    if cfg.is_gsdpt:
        params["input_merger"] = nn.conv_init(k_out[3], 3, f // 2, 7)
    return params


def _inv_log(x):
    return jnp.sign(x) * jnp.expm1(jnp.abs(x))


_ATTR_ACT = {
    "norm_exp": lambda x: (x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8))
                          * jnp.expm1(jnp.linalg.norm(x, axis=-1, keepdims=True)),
    "norm": lambda x: x / jnp.linalg.norm(x, axis=-1, keepdims=True),
    "exp": jnp.exp,
    "relu": jax.nn.relu,
    "inv_log": _inv_log,
    "xy_inv_log": lambda x: jnp.concatenate(
        [x[..., :2] * _inv_log(x[..., 2:]), _inv_log(x[..., 2:])], axis=-1),
    "sigmoid": jax.nn.sigmoid,
    "linear": lambda x: x,
}

_CONF_ACT = {
    "expp1": lambda c: 1 + jnp.exp(c),
    "expp0": jnp.exp,
    "sigmoid": jax.nn.sigmoid,
}


def activate_head(out: jnp.ndarray, activation: str = "inv_log+expp1"):
    """(B, H, W, C) NHWC head output -> (attr (B,H,W,C-1), conf (B,H,W))."""
    act_attr, act_conf = (activation.split("+") if "+" in activation
                          else (activation, "expp1"))
    attr, conf = out[..., :-1], out[..., -1]
    return _ATTR_ACT[act_attr](attr), _CONF_ACT[act_conf](conf)


def _apply_pos_embed(x: jnp.ndarray, w_img: int, h_img: int, ratio: float = 0.1):
    """x: (B, H, W, C); adds sinusoidal embedding of the UV grid."""
    ph, pw, C = x.shape[-3], x.shape[-2], x.shape[-1]
    uv = create_uv_grid(pw, ph, aspect_ratio=w_img / h_img, dtype=x.dtype)
    emb = position_grid_to_embed(uv, C) * ratio
    return x + emb[None].astype(x.dtype)


def forward(p, cfg: DPTConfig, token_list: List[jnp.ndarray],
            images: jnp.ndarray, patch_start_idx: int):
    """Dense prediction from aggregator intermediates.

    Args:
      token_list: 4 tensors (B, S, N, dim_in).
      images: (B, S, H, W, 3) NHWC in [0, 1].
    Returns:
      is_gsdpt: (fused_feats (B,S,H,W,f/2), preds (B,S,H,W,out-1), conf (B,S,H,W))
      else:     (preds, conf)
    """
    out = forward_raw(p, cfg, token_list, images, patch_start_idx)
    head = out[0] if cfg.is_gsdpt else out
    B, S = images.shape[:2]
    if cfg.with_conf:
        preds, conf = activate_head(head, cfg.activation)
        conf = conf.reshape(B, S, *conf.shape[1:])
    else:
        act = cfg.activation.split("+")[0]
        preds, conf = _ATTR_ACT[act](head), None
    preds = preds.reshape(B, S, *preds.shape[1:])
    if cfg.is_gsdpt:
        fused = out[1].reshape(B, S, *out[1].shape[1:])
        return fused, preds, conf
    return preds, conf


def forward_raw(p, cfg: DPTConfig, token_list: List[jnp.ndarray],
                images: jnp.ndarray, patch_start_idx: int):
    """The decode trunk of `forward` WITHOUT the activation zoo: returns the
    fp32 pre-activation head map (B*S, H', W', output_dim) (plus the merged
    fused map for gsdpt). Split out so heads with IDENTICAL decoder configs
    but different activations (pts/norm) can share one vmapped decode."""
    B, S, H, W, _ = images.shape
    ph, pw = H // cfg.patch_size, W // cfg.patch_size

    feats = []
    resizers = [
        lambda t: nn.conv_transpose(p["resize0"], t, 4),
        lambda t: nn.conv_transpose(p["resize1"], t, 2),
        lambda t: t,
        lambda t: nn.conv(p["resize3"], t, stride=2, padding=1),
    ]
    cdtype = jnp.dtype(cfg.compute_dtype)
    for lvl in range(4):
        tokens = token_list[lvl][:, :, patch_start_idx:].astype(cdtype)
        tokens = tokens.reshape(B * S, ph * pw, tokens.shape[-1])
        tokens = nn.layer_norm(p["norm"], tokens, eps=1e-5)
        feat = tokens.reshape(B * S, ph, pw, tokens.shape[-1])
        feat = nn.conv(p["projects"][lvl], feat)
        if cfg.pos_embed:
            feat = _apply_pos_embed(feat, W, H)
        feats.append(resizers[lvl](feat))

    l1 = nn.conv(p["layer_rn"][0], feats[0], padding=1)
    l2 = nn.conv(p["layer_rn"][1], feats[1], padding=1)
    l3 = nn.conv(p["layer_rn"][2], feats[2], padding=1)
    l4 = nn.conv(p["layer_rn"][3], feats[3], padding=1)

    out = _fusion_block(p["refine4"], l4, size=l3.shape[-3:-1])
    out = _fusion_block(p["refine3"], out, l3, size=l2.shape[-3:-1])
    out = _fusion_block(p["refine2"], out, l2, size=l1.shape[-3:-1])
    out = _fusion_block(p["refine1"], out, l1)
    out = nn.conv(p["output_conv1"], out, padding=1)

    target = (int(ph * cfg.patch_size / cfg.down_ratio),
              int(pw * cfg.patch_size / cfg.down_ratio))
    fused = resize_bilinear(out, target, align_corners=True)
    if cfg.pos_embed:
        fused = _apply_pos_embed(fused, W, H)

    head = nn.conv(p["output_conv2"]["conv1"], fused, padding=1)
    head = nn.conv(p["output_conv2"]["conv2"], jax.nn.relu(head))
    head = head.astype(jnp.float32)  # activation math always fp32

    if cfg.is_gsdpt:
        img_feat = jax.nn.relu(
            nn.conv(p["input_merger"], images.reshape(B * S, H, W, 3).astype(cdtype),
                    padding=3))
        return head, fused + img_feat
    return head
