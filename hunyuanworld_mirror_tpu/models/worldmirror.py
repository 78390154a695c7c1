"""WorldMirror top-level assembly: trunk + prediction heads.

Behavioral parity: reference src/models/models/worldmirror.py:16-251 —
aggregator (optionally prior-prompted) feeding five heads:
  camera (9-vec -> w2c/K, c2w via SE3 inverse), depth (exp+expp1),
  points (inv_log+expp1), normals (norm+expp1), Gaussian features
  (exp+expp1 gs-depth + fused feature map -> splats; see gaussians.py).

The forward is a single pure function: params pytree + typed config in,
prediction dict out. bf16 trunk, fp32 heads (reference worldmirror.py:146).
"""

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp

from . import aggregator, camera_head, dpt
from .aggregator import VGTConfig
from .camera_head import CameraHeadConfig
from .dpt import DPTConfig
from ..utils import camera as cam_utils
from ..utils import priors as prior_utils


@dataclass(frozen=True)
class WorldMirrorConfig:
    img_size: int = 518
    patch_size: int = 14
    embed_dim: int = 1024
    gs_dim: int = 256
    enable_cond: bool = True
    enable_cam: bool = True
    enable_pts: bool = True
    enable_depth: bool = True
    enable_norm: bool = True
    enable_gs: bool = True
    patch_embed: str = "dinov2_vitl14_reg"
    sh_degree: int = 0
    voxel_size: float = 0.002
    trunk_depth: int = 24
    trunk_heads: int = 16
    intermediate_idxs: tuple = (4, 11, 17, 23)
    rasterizer_impl: str = "jax"
    # coverage-scheduled binning (pallas path, INFERENCE-only approximation;
    # see gaussians.GSRendererConfig.slot_fracs). None = exact binning.
    gs_slot_fracs: Optional[object] = None
    # splat-mean source (reference rasterization.py:389-498); see
    # gaussians.GSRendererConfig.position_from
    gs_position_from: str = "gsdepth+predcamera"
    # post-prune static compaction (gaussians.GSRendererConfig.enable_compact);
    # False keeps every voxel-merged splat (exact reference semantics)
    gs_compact: bool = True
    # DPT decoder compute dtype; "float32" matches the reference's
    # autocast-off heads, "bfloat16" halves decoder HBM traffic (final
    # activations stay fp32 either way — see dpt.DPTConfig.compute_dtype)
    head_dtype: str = "float32"
    # Frame-chunked head execution: when set, the per-frame DPT heads run as
    # a lax.map over S/head_chunk frame groups instead of one batched call —
    # peak head activation memory drops from O(S) to O(head_chunk), which is
    # what makes S=32 single-chip inference fit (the gs-head feature map
    # alone is ~9 GB fp32 at S=32/518px when unchunked). The reference chunks
    # its DPT the same way for memory (src/models/heads/dense_head.py frame
    # chunking); None = no chunking (peak throughput at small S).
    head_chunk: Optional[int] = None
    # DPT decoder width overrides (None = reference defaults: features 256,
    # out_channels (256,512,1024,1024)). Small-scale parity/golden fixtures
    # shrink these on BOTH sides to keep fixtures commit-sized.
    dpt_features: Optional[int] = None
    dpt_out_channels: Optional[tuple] = None
    # run the pts + normals heads (identical decoder configs, different
    # final activations) as ONE vmapped decode over stacked weights —
    # inference throughput knob, numerics identical per head
    fuse_parallel_heads: bool = False
    # accepted-and-ignored: the reference's worldmirror.py:58-59 passes these
    # to a VGT constructor that doesn't declare them (SURVEY.md §2.1 quirk);
    # kept so checkpoints/configs serialized with them still load
    enable_interpolation: bool = False
    max_resolution: Optional[int] = None

    @property
    def vgt(self) -> VGTConfig:
        return VGTConfig(
            img_size=self.img_size, patch_size=self.patch_size,
            embed_dim=self.embed_dim, patch_embed=self.patch_embed,
            enable_cond=self.enable_cond,
            depth=self.trunk_depth, num_heads=self.trunk_heads,
            intermediate_idxs=self.intermediate_idxs,
        )

    @property
    def cam_head(self) -> CameraHeadConfig:
        return CameraHeadConfig(dim_in=2 * self.embed_dim)

    def _dpt(self, output_dim, activation, **kw) -> DPTConfig:
        if self.dpt_features is not None:
            kw.setdefault("features", self.dpt_features)
        if self.dpt_out_channels is not None:
            kw.setdefault("out_channels", tuple(self.dpt_out_channels))
        return DPTConfig(dim_in=2 * self.embed_dim, patch_size=self.patch_size,
                         output_dim=output_dim, activation=activation,
                         compute_dtype=self.head_dtype, **kw)

    @property
    def pts_head(self) -> DPTConfig:
        return self._dpt(4, "inv_log+expp1")

    @property
    def depth_head(self) -> DPTConfig:
        return self._dpt(2, "exp+expp1")

    @property
    def norm_head(self) -> DPTConfig:
        return self._dpt(4, "norm+expp1")

    @property
    def gs_head(self) -> DPTConfig:
        return self._dpt(2, "exp+expp1", features=self.gs_dim, is_gsdpt=True)

    @property
    def gs_renderer(self):
        from .gaussians import GSRendererConfig
        return GSRendererConfig(feature_dim=self.gs_dim, sh_degree=self.sh_degree,
                                voxel_size=self.voxel_size,
                                rasterizer_impl=self.rasterizer_impl,
                                position_from=self.gs_position_from,
                                enable_compact=self.gs_compact,
                                slot_fracs=self.gs_slot_fracs)


def init(key, cfg: WorldMirrorConfig):
    keys = jax.random.split(key, 8)
    params = {"vgt": aggregator.init(keys[0], cfg.vgt)}
    if cfg.enable_cam:
        params["cam_head"] = camera_head.init(keys[1], cfg.cam_head)
    if cfg.enable_pts:
        params["pts_head"] = dpt.init(keys[2], cfg.pts_head)
    if cfg.enable_depth:
        params["depth_head"] = dpt.init(keys[3], cfg.depth_head)
    if cfg.enable_norm:
        params["norm_head"] = dpt.init(keys[4], cfg.norm_head)
    if cfg.enable_gs:
        from . import gaussians
        params["gs_head"] = dpt.init(keys[5], cfg.gs_head)
        params["gs_renderer"] = gaussians.init(keys[6], cfg.gs_renderer)
    return params


def extract_priors(views: Dict[str, jnp.ndarray], image_hw):
    """Normalize prior inputs (reference worldmirror.py:218-251).

    Returns (depths, rays, poses) — any may be None.
    """
    h, w = image_hw
    depths = rays = poses = None

    if "camera_pose" in views:
        ext = views["camera_pose"][:, :, :3]  # (B, S, 3, 4)
        ext = prior_utils.normalize_poses(ext)
        poses = cam_utils.extrinsics_to_vector(ext)[..., :7]

    if "depthmap" in views:
        depths = prior_utils.normalize_depth(views["depthmap"])

    if "camera_intrinsics" in views:
        K = views["camera_intrinsics"][:, :, :3, :3]
        fx, fy = K[:, :, 0, 0] / w, K[:, :, 1, 1] / h
        cx, cy = K[:, :, 0, 2] / w, K[:, :, 1, 2] / h
        rays = jnp.stack([fx, fy, cx, cy], axis=-1)

    return depths, rays, poses


def _dpt_maybe_chunked(p, dcfg, cfg, token_list, imgs, start):
    """dpt.forward, optionally lax.map'd over frame groups (cfg.head_chunk)."""
    B, S = imgs.shape[:2]
    ck = cfg.head_chunk
    if not ck or S <= ck or S % ck != 0:
        return dpt.forward(p, dcfg, token_list, imgs, start)
    n = S // ck

    def split(x):  # (B, S, ...) -> (n, B, ck, ...)
        return x.reshape(B, n, ck, *x.shape[2:]).swapaxes(0, 1)

    toks = tuple(split(t) for t in token_list)
    ims = split(imgs)

    def one(args):
        ts, im = args
        return dpt.forward(p, dcfg, list(ts), im, start)

    outs = jax.lax.map(one, (toks, ims))
    return jax.tree.map(
        lambda x: x.swapaxes(0, 1).reshape(B, S, *x.shape[3:]), outs)


def forward(params, cfg: WorldMirrorConfig, views: Dict[str, jnp.ndarray],
            cond_flags: Sequence[int] = (0, 0, 0),
            render: bool = True, ring_mesh=None,
            trunk_dtype=jnp.bfloat16,
            camera_params=None) -> Dict[str, jnp.ndarray]:
    """Full model forward.

    Args:
      views: dict with 'img' (B, S, H, W, 3) in [0, 1] (NHWC); optional
        'camera_pose' (B,S,4,4), 'depthmap' (B,S,H,W), 'camera_intrinsics'
        (B,S,3,3) priors.
      cond_flags: static (pose, depth, rays) switches.
      render: if True (and GS enabled), also rasterize the splats back into
        the input views (rendered_colors/depths/alphas).
      ring_mesh: optional device Mesh; when its "view" axis is >1, global
        cross-view attention runs as ring attention over that axis (the
        long-sequence / multi-host path, BASELINE configs 4-5).
      camera_params: optional (B, S, 9) camera vectors that REPLACE the
        camera head's prediction for everything downstream (splat
        unprojection + rendering) — the known/calibrated-cameras eval
        path (reference eval renders against GT poses); the head's own
        prediction is still returned as 'camera_params_pred'.
    Returns:
      prediction dict (shapes per SURVEY.md §3.2).
    """
    imgs = views["img"]
    B, S, H, W, _ = imgs.shape

    use_cond = cfg.enable_cond and sum(cond_flags) > 0
    priors = extract_priors(views, (H, W)) if use_cond else None
    token_list, patch_start_idx = aggregator.forward(
        params["vgt"], cfg.vgt, imgs, priors=priors,
        cond_flags=cond_flags if use_cond else (0, 0, 0),
        dtype=trunk_dtype, ring_mesh=ring_mesh)

    preds: Dict[str, jnp.ndarray] = {}

    if cfg.enable_cam:
        cam_seq = camera_head.forward(params["cam_head"], cfg.cam_head, token_list)
        cam_params = cam_seq[-1]  # (B, S, 9)
        if camera_params is not None:
            preds["camera_params_pred"] = cam_params
            cam_params = jnp.asarray(camera_params)
        preds["camera_params"] = cam_params

        ext, intr = cam_utils.vector_to_camera_matrices(cam_params, image_hw=(H, W))
        w2c = cam_utils.to_homogeneous(ext)
        preds["camera_poses"] = cam_utils.se3_inverse(w2c)  # c2w (OpenCV)
        preds["camera_intrs"] = intr

    if cfg.enable_depth:
        depth, depth_conf = _dpt_maybe_chunked(
            params["depth_head"], cfg.depth_head, cfg, token_list, imgs,
            patch_start_idx)
        preds["depth"] = depth          # (B, S, H, W, 1)
        preds["depth_conf"] = depth_conf

    import dataclasses as _dc
    # fusing decodes BOTH heads with cfg.pts_head and unpacks conf, so the
    # two decoder configs must agree on EVERYTHING except the final
    # activation (advisor r4 — output_dim equality alone was not enough)
    fuse_pn = (cfg.fuse_parallel_heads and cfg.enable_pts and cfg.enable_norm
               and not cfg.head_chunk and cfg.pts_head.with_conf
               and _dc.replace(cfg.pts_head, activation="")
               == _dc.replace(cfg.norm_head, activation=""))
    if fuse_pn:
        # pts + normals share an identical decoder config (only the final
        # activation differs), so ONE vmapped decode over stacked weights
        # replaces two sequential head passes (batch 2x through every conv)
        stacked = jax.tree.map(lambda a, b: jnp.stack([a, b]),
                               params["pts_head"], params["norm_head"])
        raw = jax.vmap(lambda p: dpt.forward_raw(
            p, cfg.pts_head, token_list, imgs, patch_start_idx))(stacked)
        for i, (key, dcfg) in enumerate((("pts3d", cfg.pts_head),
                                         ("normals", cfg.norm_head))):
            a, c = dpt.activate_head(raw[i], dcfg.activation)
            preds[key] = a.reshape(B, S, *a.shape[1:])
            preds[f"{key}_conf"] = c.reshape(B, S, *c.shape[1:])
    else:
        if cfg.enable_pts:
            pts, pts_conf = _dpt_maybe_chunked(
                params["pts_head"], cfg.pts_head, cfg, token_list, imgs,
                patch_start_idx)
            preds["pts3d"] = pts            # (B, S, H, W, 3)
            preds["pts3d_conf"] = pts_conf

        if cfg.enable_norm:
            normals, norm_conf = _dpt_maybe_chunked(
                params["norm_head"], cfg.norm_head, cfg, token_list, imgs,
                patch_start_idx)
            preds["normals"] = normals
            preds["normals_conf"] = norm_conf

    if cfg.enable_gs:
        from . import gaussians
        ck = cfg.head_chunk
        if ck and S > ck and S % ck == 0:
            # Fuse the gs-param conv INTO the chunk loop: the (B, S, H, W,
            # 128) fused feature map is 8.8 GB fp32 at S=64/518px — it OOMed
            # the 16 GB v5e even at head_chunk=1 when materialized whole.
            # Reducing each chunk's fused map to the 14-channel raw splat
            # params immediately keeps peak memory O(head_chunk).
            n = S // ck

            def split(x):
                return x.reshape(B, n, ck, *x.shape[2:]).swapaxes(0, 1)

            toks = tuple(split(t) for t in token_list)
            ims = split(imgs)

            def one(args):
                ts, im = args
                fused, gd, gdc = dpt.forward(
                    params["gs_head"], cfg.gs_head, list(ts), im,
                    patch_start_idx)
                raw = gaussians._gs_head_apply(
                    params["gs_renderer"],
                    fused.reshape(B * ck, H, W, fused.shape[-1]))
                return raw.reshape(B, ck, H, W, -1), gd, gdc

            raw, gs_depth, gs_depth_conf = jax.lax.map(one, (toks, ims))

            def unsplit(x):
                return x.swapaxes(0, 1).reshape(B, S, *x.shape[3:])

            raw = unsplit(raw)
            gs_depth, gs_depth_conf = unsplit(gs_depth), unsplit(gs_depth_conf)
            gs_kw = dict(gs_params=raw.reshape(B * S, H, W, raw.shape[-1]))
        else:
            gs_feat, gs_depth, gs_depth_conf = _dpt_maybe_chunked(
                params["gs_head"], cfg.gs_head, cfg, token_list, imgs,
                patch_start_idx)
            gs_kw = dict(gs_feats=gs_feat)
        preds["gs_depth"] = gs_depth
        preds["gs_depth_conf"] = gs_depth_conf
        preds = gaussians.render(
            params["gs_renderer"], cfg.gs_renderer,
            images=imgs, predictions=preds,
            do_render=render, views=views, dist_mesh=ring_mesh, **gs_kw)

    return preds
