"""CenterSnap-style 6D object-pose model (the fork's training workload).

Behavioral parity: reference models/models/centersnap_foundation_pose.py:37-136
— a single-frame variant: frame-only aggregator (depth 4) with optional depth
('pow3r') conditioning, feeding two dense heads:
  * heatmap: 1 channel, sigmoid, full resolution
  * pose map: 12 channels (rot6d + translation + bbox size), linear,
    down_ratio 2.

The fork's DINOv3 backbone is an empty submodule in the reference snapshot
(SURVEY.md §0), so the encoder here defaults to the conv patch embed; any
`dinov2_*` factory also works.
"""

from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from . import aggregator, dpt
from .aggregator import VGTConfig
from .dpt import DPTConfig


@dataclass(frozen=True)
class CenterSnapConfig:
    img_size: int = 512
    patch_size: int = 16
    embed_dim: int = 384
    trunk_depth: int = 4
    trunk_heads: int = 6
    patch_embed: str = "conv"
    use_depth_condition: bool = True
    heatmap_features: int = 128
    pose_down_ratio: int = 2

    @property
    def vgt(self) -> VGTConfig:
        return VGTConfig(
            img_size=self.img_size, patch_size=self.patch_size,
            embed_dim=self.embed_dim, depth=self.trunk_depth,
            num_heads=self.trunk_heads, patch_embed=self.patch_embed,
            enable_cond=self.use_depth_condition, frame_only=True,
            intermediate_idxs=tuple(
                min(i, self.trunk_depth - 1)
                for i in (0, self.trunk_depth // 3,
                          2 * self.trunk_depth // 3, self.trunk_depth - 1)),
        )

    @property
    def heatmap_head(self) -> DPTConfig:
        return DPTConfig(dim_in=self.embed_dim, patch_size=self.patch_size,
                         output_dim=1, activation="sigmoid",
                         features=self.heatmap_features,
                         out_channels=(128, 256, 256, 256), with_conf=False)

    @property
    def pose_head(self) -> DPTConfig:
        return DPTConfig(dim_in=self.embed_dim, patch_size=self.patch_size,
                         output_dim=12, activation="linear",
                         features=self.heatmap_features,
                         out_channels=(128, 256, 256, 256),
                         down_ratio=self.pose_down_ratio, with_conf=False)


def init(key, cfg: CenterSnapConfig):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "encoder": aggregator.init(k1, cfg.vgt),
        "heatmap_head": dpt.init(k2, cfg.heatmap_head),
        "pose_head": dpt.init(k3, cfg.pose_head),
    }


def forward(params, cfg: CenterSnapConfig, rgb: jnp.ndarray,
            depth: Optional[jnp.ndarray] = None) -> Dict[str, jnp.ndarray]:
    """rgb (B, H, W, 3) in [0,1]; depth (B, H, W) normalized.

    Returns heatmap (B, H, W, 1) and pose_map (B, H/dr, W/dr, 12).
    """
    B, H, W, _ = rgb.shape
    imgs = rgb[:, None]  # (B, 1, H, W, 3)

    if cfg.use_depth_condition and depth is not None:
        priors = (depth[:, None], None, None)
        cond = (0, 1, 0)
    else:
        priors, cond = None, (0, 0, 0)

    token_list, start = aggregator.forward(params["encoder"], cfg.vgt, imgs,
                                           priors=priors, cond_flags=cond)
    heat, _ = dpt.forward(params["heatmap_head"], cfg.heatmap_head,
                          token_list, imgs, start)
    pose, _ = dpt.forward(params["pose_head"], cfg.pose_head,
                          token_list, imgs, start)
    return {"heatmap": heat[:, 0], "pose_map": pose[:, 0]}
