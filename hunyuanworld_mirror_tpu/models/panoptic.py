"""CenterSnap "panoptic" ResNet-FPN baseline (TPU-native re-design).

Behavioral parity with the reference fork's detectron2-derived stack
(reference models/models/centersnap/panoptic_backbone.py + basic_stem.py and
train_centersnap_panoptic.py:67-103 `CenterSnapPanopticRaw`):

  * RGBD stem (basic_stem.py:8-30): a 7x7/s2 + maxpool/s2 BasicStem on RGB
    (3->32) and on depth (1->1, the "small disp"), a dilation-5 pre-activation
    residual block lifting disp to 32ch, concat -> 64ch at stride 4.
  * ResNet-50-shape trunk (panoptic_backbone.py:1319-1405): bottleneck stages
    res2..res5 with num_filters_scale=4 -> stage channels 64/128/256/512,
    bottleneck widths 32/64/128/256, stride_in_1x1, GroupNorm.
  * FPN (panoptic_backbone.py:708-845): 1x1 laterals + 3x3 output convs (GN,
    no bias), nearest 2x top-down, sum fusion -> p2..p5 @ 64ch.
  * SemSegFPNHead (heatmap, 1ch; :197-269): per-level conv(+GN+relu)/2x-up
    chains down to common stride 4, summed, 1x1 predictor, bilinear x4 to
    full res.
  * PoseFPNHead (12ch = rot6d+t+size; :272-345): same over p3..p5 at common
    stride 2, no final upsample (output at H/2, matching the transformer
    variant's pose_down_ratio=2).

TPU re-design notes: NHWC + HWIO layouts throughout, GroupNorm everywhere
(the reference's own comment says "GN, originally FrozenBN"; the two BN uses
left in its stem become GN here so the model stays a pure function with no
batch statistics), bilinear upsamples via the dense-matmul resize in
ops/interpolate.py (MXU instead of VPU gathers).
"""

from dataclasses import dataclass
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from . import nn
from ..ops.interpolate import resize_bilinear


@dataclass(frozen=True)
class PanopticConfig:
    num_filters_scale: int = 4
    blocks_per_stage: Tuple[int, ...] = (3, 4, 6, 3)  # ResNet-50 shape
    stem_out: int = 64
    gn_groups: int = 16
    heatmap_classes: int = 1
    pose_classes: int = 12
    sem_common_stride: int = 4
    pose_common_stride: int = 2

    @property
    def fpn_channels(self) -> int:
        return 256 // self.num_filters_scale

    @property
    def head_dims(self) -> int:
        return 128 // self.num_filters_scale

    @property
    def stage_channels(self) -> Tuple[int, ...]:
        c = 256 // self.num_filters_scale
        return tuple(c * (2 ** i) for i in range(4))

    @property
    def bottleneck_channels(self) -> Tuple[int, ...]:
        w = max(64 // self.num_filters_scale, 32)
        return tuple(w * (2 ** i) for i in range(4))


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------

def _convgn_init(key, cin, cout, kernel):
    return {"conv": nn.conv_init(key, cin, cout, kernel, bias=False),
            "gn": nn.group_norm_init(cout)}


def _convgn(p, x, stride=1, groups=16, relu=True, dilation=1):
    from jax import lax
    w = p["conv"]["w"].astype(x.dtype)
    pad = (w.shape[0] // 2) * dilation
    y = lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)],
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = nn.group_norm(p["gn"], y, groups)
    return jax.nn.relu(y) if relu else y


def _basic_stem_init(key, cin, cout):
    """conv7x7/s2 (no bias) + GN + relu + maxpool3x3/s2 (BasicStem,
    panoptic_backbone.py:1204-1236)."""
    return _convgn_init(key, cin, cout, 7)


def _basic_stem(p, x, groups):
    from jax import lax
    y = _convgn(p, x, stride=2, groups=groups)
    return lax.reduce_window(y, -jnp.inf, lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
                             [(0, 0), (1, 1), (1, 1), (0, 0)])


def _preact_block_init(key, cin, cout):
    """Pre-activation residual block, dilation 5 (residual_blocks.py:51-141)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    p = {"pre_gn": nn.group_norm_init(cin),
         "conv1": _convgn_init(k1, cin, cout, 3),
         "conv2": nn.conv_init(k2, cout, cout, 3, bias=False)}
    if cin != cout:
        p["shortcut"] = nn.conv_init(k3, cin, cout, 1, bias=False)
    return p


def _preact_block(p, x, groups, dilation=5):
    from jax import lax
    short = x
    if "shortcut" in p:
        short = nn.conv(p["shortcut"], x)
    h = jax.nn.relu(nn.group_norm(p["pre_gn"], x, groups))
    h = _convgn(p["conv1"], h, groups=groups, dilation=dilation)
    w = p["conv2"]["w"].astype(x.dtype)
    pad = dilation
    h = lax.conv_general_dilated(
        h, w, (1, 1), [(pad, pad), (pad, pad)], rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return h + short


def _bottleneck_init(key, cin, cout, cmid):
    ks = jax.random.split(key, 4)
    p = {"conv1": _convgn_init(ks[0], cin, cmid, 1),
         "conv2": _convgn_init(ks[1], cmid, cmid, 3),
         "conv3": _convgn_init(ks[2], cmid, cout, 1)}
    if cin != cout:
        p["shortcut"] = _convgn_init(ks[3], cin, cout, 1)
    return p


def _bottleneck(p, x, stride, groups):
    """1x1(s)->GN->relu, 3x3->GN->relu, 1x1->GN (+shortcut) -> relu;
    stride_in_1x1=True (panoptic_backbone.py:983-1086)."""
    h = _convgn(p["conv1"], x, stride=stride, groups=groups)
    h = _convgn(p["conv2"], h, groups=groups)
    h = _convgn(p["conv3"], h, relu=False, groups=groups)
    short = x
    if "shortcut" in p:
        short = _convgn(p["shortcut"], x, stride=stride, relu=False, groups=groups)
    return jax.nn.relu(h + short)


# ---------------------------------------------------------------------------
# init / forward
# ---------------------------------------------------------------------------

def init(key, cfg: PanopticConfig):
    keys = iter(jax.random.split(key, 64))

    params: Dict = {
        "rgb_stem": _basic_stem_init(next(keys), 3, cfg.stem_out // 2),
        "depth_stem": _basic_stem_init(next(keys), 1, 1),
        "disp_feat": _preact_block_init(next(keys), 1, cfg.stem_out // 2),
    }

    # trunk
    cin = cfg.stem_out
    stages: List = []
    for si, nblocks in enumerate(cfg.blocks_per_stage):
        cout, cmid = cfg.stage_channels[si], cfg.bottleneck_channels[si]
        blocks = []
        for bi in range(nblocks):
            blocks.append(_bottleneck_init(next(keys), cin, cout, cmid))
            cin = cout
        stages.append(blocks)
    params["stages"] = stages

    # FPN
    fc = cfg.fpn_channels
    params["lateral"] = [_convgn_init(next(keys), c, fc, 1)
                         for c in cfg.stage_channels]
    params["fpn_out"] = [_convgn_init(next(keys), fc, fc, 3)
                         for _ in cfg.stage_channels]

    def head_init(in_levels: Sequence[int], common_stride: int, classes: int):
        hd = cfg.head_dims
        scale_heads = []
        for lvl in in_levels:  # lvl = log2(stride)
            n = max(1, lvl - common_stride.bit_length() + 1)
            chain = [_convgn_init(next(keys), fc if k == 0 else hd, hd, 3)
                     for k in range(n)]
            scale_heads.append(chain)
        return {"scale_heads": scale_heads,
                "predictor": nn.conv_init(next(keys), hd, classes, 1)}

    params["heatmap_head"] = head_init((2, 3, 4, 5), cfg.sem_common_stride,
                                       cfg.heatmap_classes)
    params["pose_head"] = head_init((3, 4, 5), cfg.pose_common_stride,
                                    cfg.pose_classes)
    return params


def _fpn_forward(params, cfg: PanopticConfig, feats: List[jnp.ndarray]):
    """res2..res5 -> p2..p5 (sum-fused top-down, nearest 2x upsample)."""
    g = cfg.gn_groups
    prev = _convgn(params["lateral"][-1], feats[-1], relu=False, groups=g)
    outs = [_convgn(params["fpn_out"][-1], prev, relu=False, groups=g)]
    for i in range(len(feats) - 2, -1, -1):
        up = jnp.repeat(jnp.repeat(prev, 2, axis=1), 2, axis=2)  # nearest 2x
        lat = _convgn(params["lateral"][i], feats[i], relu=False, groups=g)
        prev = lat + up
        outs.insert(0, _convgn(params["fpn_out"][i], prev, relu=False, groups=g))
    return outs  # [p2, p3, p4, p5]


def _scale_head_forward(head, cfg: PanopticConfig, pyramid: Dict[int, jnp.ndarray],
                        in_levels: Sequence[int], common_stride: int):
    """Per-level conv/up chains summed at the common stride, 1x1 predictor
    (SemSegFPNHead.layers, panoptic_backbone.py:258-269; note the reference
    relu-s the FPN feature before each chain)."""
    g = cfg.gn_groups
    acc = None
    for chain, lvl in zip(head["scale_heads"], in_levels):
        x = jax.nn.relu(pyramid[lvl])
        stride = 1 << lvl
        for conv in chain:
            x = _convgn(conv, x, groups=g)
            if stride != common_stride:
                x = resize_bilinear(x, (x.shape[1] * 2, x.shape[2] * 2),
                                    align_corners=False)
                stride //= 2
        acc = x if acc is None else acc + x
    return nn.conv(head["predictor"], acc)


def forward(params, cfg: PanopticConfig, rgb: jnp.ndarray,
            depth: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """rgb (B, H, W, 3) ImageNet-normalized; depth (B, H, W) or (B, H, W, 1).

    Returns heatmap (B, H, W, 1) in [0,1], pose_map (B, H/2, W/2, 12), and
    small_disp (B, H/4, W/4, 1). The reference panoptic trainer feeds *raw*
    SemSegFPNHead logits to an MSE-vs-[0,1]-target loss
    (train_centersnap_panoptic.py:95-103); we apply sigmoid like the
    transformer variant's heatmap head does, so both model families share
    one loss contract (training/losses.py centersnap_loss).
    """
    g = cfg.gn_groups
    if depth.ndim == 3:
        depth = depth[..., None]

    rgb_f = _basic_stem(params["rgb_stem"], rgb, g)
    small_disp = _basic_stem(params["depth_stem"], depth, g)
    disp_f = _preact_block(params["disp_feat"], small_disp, g)
    x = jnp.concatenate([disp_f, rgb_f], axis=-1)  # 64ch @ stride 4

    feats = []
    for si, blocks in enumerate(params["stages"]):
        for bi, bp in enumerate(blocks):
            stride = 2 if (si > 0 and bi == 0) else 1
            x = _bottleneck(bp, x, stride, g)
        feats.append(x)

    p2, p3, p4, p5 = _fpn_forward(params, cfg, feats)
    pyramid = {2: p2, 3: p3, 4: p4, 5: p5}

    heat = _scale_head_forward(params["heatmap_head"], cfg, pyramid,
                               (2, 3, 4, 5), cfg.sem_common_stride)
    heat = resize_bilinear(
        heat, (heat.shape[1] * cfg.sem_common_stride,
               heat.shape[2] * cfg.sem_common_stride), align_corners=False)
    pose = _scale_head_forward(params["pose_head"], cfg, pyramid,
                               (3, 4, 5), cfg.pose_common_stride)
    return {"heatmap": jax.nn.sigmoid(heat), "pose_map": pose,
            "small_disp": small_disp}
