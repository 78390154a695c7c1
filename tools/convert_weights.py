"""Convert reference WorldMirror torch checkpoints to this framework's params.

The reference model is HF-hub loadable ("tencent/HunyuanWorld-Mirror",
PyTorchModelHubMixin safetensors — reference src/models/models/worldmirror.py:13-16);
its state-dict names define the weight contract (SURVEY.md §5.4). This module
maps that contract onto our param pytrees:

  layout changes:
    Linear  (out, in)            -> w (in, out)
    Conv2d  (O, I, kh, kw)       -> w (kh, kw, I, O)   [NHWC/HWIO]
    ConvT2d (I, O, kh, kw)       -> w (kh, kw, O, I)   [HWOI]
    block stacks: frame_blocks.{i}.* / global_blocks.{i}.* / blocks.{i}.*
      are stacked along a leading layer axis (lax.scan layout)

Usage:
  python tools/convert_weights.py model.safetensors out.npz
  (also accepts a torch .bin/.pt state dict)
"""

import os
import re
import sys
from typing import Dict

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _linear(sd, prefix, bias=True):
    p = {"w": sd[f"{prefix}.weight"].T.copy()}
    if bias and f"{prefix}.bias" in sd:
        p["b"] = sd[f"{prefix}.bias"]
    return p


def _ln(sd, prefix):
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _conv(sd, prefix, bias=True):
    p = {"w": sd[f"{prefix}.weight"].transpose(2, 3, 1, 0).copy()}
    if bias and f"{prefix}.bias" in sd:
        p["b"] = sd[f"{prefix}.bias"]
    return p


def _conv_t(sd, prefix):
    # torch ConvTranspose2d applies the kernel spatially FLIPPED relative to
    # lax.conv_transpose's fractionally-strided-conv view; flip here so the
    # runtime stays flip-free (verified numerically in test_torch_parity).
    w = sd[f"{prefix}.weight"].transpose(2, 3, 1, 0)[::-1, ::-1]
    return {"w": w.copy(), "b": sd[f"{prefix}.bias"]}


def _mlp(sd, prefix):
    if f"{prefix}.w12.weight" in sd:
        # SwiGLUFFN(Fused) (reference swiglu_ffn.py:9-62, ViT-giant2 blocks)
        return {"w12": _linear(sd, f"{prefix}.w12"),
                "w3": _linear(sd, f"{prefix}.w3")}
    return {"fc1": _linear(sd, f"{prefix}.fc1"), "fc2": _linear(sd, f"{prefix}.fc2")}


def _block(sd, prefix, qk_norm=False, layer_scale=True):
    p = {
        "norm1": _ln(sd, f"{prefix}.norm1"),
        "norm2": _ln(sd, f"{prefix}.norm2"),
        "attn": {
            "qkv": _linear(sd, f"{prefix}.attn.qkv"),
            "proj": _linear(sd, f"{prefix}.attn.proj"),
        },
        "mlp": _mlp(sd, f"{prefix}.mlp"),
    }
    if qk_norm and f"{prefix}.attn.q_norm.weight" in sd:
        p["attn"]["q_norm"] = _ln(sd, f"{prefix}.attn.q_norm")
        p["attn"]["k_norm"] = _ln(sd, f"{prefix}.attn.k_norm")
    if layer_scale and f"{prefix}.ls1.gamma" in sd:
        p["ls1"] = {"gamma": sd[f"{prefix}.ls1.gamma"]}
        p["ls2"] = {"gamma": sd[f"{prefix}.ls2.gamma"]}
    return p


def _stack_blocks(blocks):
    import jax
    return jax.tree.map(lambda *xs: np.stack(xs), *blocks)


def _n_layers(sd, pattern):
    idxs = {int(m.group(1)) for k in sd
            if (m := re.match(pattern, k)) is not None}
    return max(idxs) + 1 if idxs else 0


def convert_dinov2(sd: Dict[str, np.ndarray], prefix="") -> Dict:
    """DINOv2 ViT (reference src/models/layers/vision_transformer.py:37)."""
    n = _n_layers(sd, re.escape(prefix) + r"blocks\.(\d+)\.norm1\.weight")
    blocks = [_block(sd, f"{prefix}blocks.{i}") for i in range(n)]
    # mask_token is DINOv2's masked-image-modeling embedding
    # (vision_transformer.py:105) — never used on the inference path; read it
    # so the weight-name contract records it as consciously dropped
    sd.get(f"{prefix}mask_token")
    return {
        "patch_embed": {"proj": _conv(sd, f"{prefix}patch_embed.proj")},
        "cls_token": sd[f"{prefix}cls_token"],
        "register_tokens": sd[f"{prefix}register_tokens"],
        "pos_embed": sd[f"{prefix}pos_embed"],
        "blocks": _stack_blocks(blocks),
        "norm": _ln(sd, f"{prefix}norm"),
    }


def convert_dinov3(sd: Dict[str, np.ndarray], prefix="") -> Dict:
    """DINOv3-style ViT (fork backbone contract,
    reference models/models/visual_transformer.py:20-74; the dinov3 submodule
    is empty in the snapshot, so the name map follows the public DINOv3
    release: `storage_tokens` for registers, RoPE instead of a learned
    pos_embed). Missing keys fall back to zeros of the right shape where the
    runtime ignores them (pos_embed when use_rope)."""
    n = _n_layers(sd, re.escape(prefix) + r"blocks\.(\d+)\.norm1\.weight")
    blocks = [_block(sd, f"{prefix}blocks.{i}") for i in range(n)]
    regs = sd.get(f"{prefix}storage_tokens",
                  sd.get(f"{prefix}register_tokens"))
    dim = sd[f"{prefix}cls_token"].shape[-1]
    out = {
        "patch_embed": {"proj": _conv(sd, f"{prefix}patch_embed.proj")},
        "cls_token": sd[f"{prefix}cls_token"],
        "register_tokens": regs,
        "blocks": _stack_blocks(blocks),
        "norm": _ln(sd, f"{prefix}norm"),
    }
    out["pos_embed"] = sd.get(f"{prefix}pos_embed",
                              np.zeros((1, 1, dim), np.float32))
    return out


def convert_silu_mlp(sd, prefix):
    """nn.Sequential(Linear, SiLU, Linear) -> {fc1, fc2}."""
    return {"fc1": _linear(sd, f"{prefix}.0"), "fc2": _linear(sd, f"{prefix}.2")}


def convert_patch_embed_mlp(sd, prefix):
    """PatchEmbed_Mlp: proj = Sequential(PixelUnshuffle, Permute, Mlp, Permute)."""
    return {"mlp": _mlp(sd, f"{prefix}.proj.2")}


def convert_vgt(sd: Dict[str, np.ndarray], prefix="") -> Dict:
    """VisualGeometryTransformer (reference visual_transformer.py:20)."""
    n = _n_layers(sd, re.escape(prefix) + r"frame_blocks\.(\d+)\.norm1\.weight")
    params = {
        "cam_token": sd[f"{prefix}cam_token"],
        "reg_token": sd[f"{prefix}reg_token"],
        "frame_blocks": _stack_blocks(
            [_block(sd, f"{prefix}frame_blocks.{i}", qk_norm=True) for i in range(n)]),
    }
    ng = _n_layers(sd, re.escape(prefix) + r"global_blocks\.(\d+)\.norm1\.weight")
    if ng:
        params["global_blocks"] = _stack_blocks(
            [_block(sd, f"{prefix}global_blocks.{i}", qk_norm=True) for i in range(ng)])

    if f"{prefix}patch_embed.cls_token" in sd:
        params["patch_embed"] = convert_dinov2(sd, f"{prefix}patch_embed.")
    elif f"{prefix}patch_embed.proj.weight" in sd:
        params["patch_embed"] = {"proj": _conv(sd, f"{prefix}patch_embed.proj")}
    elif f"{prefix}patch_embed.proj.2.fc1.weight" in sd:
        params["patch_embed"] = convert_patch_embed_mlp(sd, f"{prefix}patch_embed")

    if f"{prefix}pose_embed.0.weight" in sd:
        params["pose_embed"] = convert_silu_mlp(sd, f"{prefix}pose_embed")
        params["depth_embed"] = convert_patch_embed_mlp(sd, f"{prefix}depth_embed")
        params["ray_embed"] = convert_silu_mlp(sd, f"{prefix}ray_embed")
    return params


def convert_camera_head(sd, prefix="") -> Dict:
    n = _n_layers(sd, re.escape(prefix) + r"refine_net\.(\d+)\.norm1\.weight")
    return {
        "trunk": [_block(sd, f"{prefix}refine_net.{i}") for i in range(n)],
        "token_norm": _ln(sd, f"{prefix}token_norm"),
        "out_norm": _ln(sd, f"{prefix}out_norm"),
        "init_token": sd[f"{prefix}init_token"],
        "param_embed": _linear(sd, f"{prefix}param_embed"),
        "adapt_norm_gen": _linear(sd, f"{prefix}adapt_norm_gen.1"),
        "param_predictor": _mlp(sd, f"{prefix}param_predictor"),
    }


def convert_dpt(sd, prefix="", is_gsdpt=False) -> Dict:
    p = {
        "norm": _ln(sd, f"{prefix}norm"),
        "projects": [_conv(sd, f"{prefix}projects.{i}") for i in range(4)],
        "resize0": _conv_t(sd, f"{prefix}resize_layers.0"),
        "resize1": _conv_t(sd, f"{prefix}resize_layers.1"),
        "resize3": _conv(sd, f"{prefix}resize_layers.3"),
        "layer_rn": [_conv(sd, f"{prefix}scratch.layer{i + 1}_rn", bias=False)
                     for i in range(4)],
        "output_conv1": _conv(sd, f"{prefix}scratch.output_conv1"),
        "output_conv2": {
            "conv1": _conv(sd, f"{prefix}scratch.output_conv2.0"),
            "conv2": _conv(sd, f"{prefix}scratch.output_conv2.2"),
        },
    }
    for i in (1, 2, 3, 4):
        rp = f"{prefix}scratch.refinenet{i}"
        fb = {"out_conv": _conv(sd, f"{rp}.out_conv"),
              "res2": {"conv1": _conv(sd, f"{rp}.resConfUnit2.conv1"),
                       "conv2": _conv(sd, f"{rp}.resConfUnit2.conv2")}}
        if f"{rp}.resConfUnit1.conv1.weight" in sd:
            fb["res1"] = {"conv1": _conv(sd, f"{rp}.resConfUnit1.conv1"),
                          "conv2": _conv(sd, f"{rp}.resConfUnit1.conv2")}
        p[f"refine{i}"] = fb
    if is_gsdpt or f"{prefix}input_merger.0.weight" in sd:
        p["input_merger"] = _conv(sd, f"{prefix}input_merger.0")
    return p


def convert_gs_renderer(sd, prefix="") -> Dict:
    return {"conv1": _conv(sd, f"{prefix}gs_head.0", bias=False),
            "conv2": _conv(sd, f"{prefix}gs_head.2")}


def convert_worldmirror(sd: Dict[str, np.ndarray]) -> Dict:
    """Full reference WorldMirror state dict -> our param pytree."""
    params = {"vgt": convert_vgt(sd, "visual_geometry_transformer.")}
    if "cam_head.token_norm.weight" in sd:
        params["cam_head"] = convert_camera_head(sd, "cam_head.")
    for torch_name, ours in (("pts_head", "pts_head"), ("depth_head", "depth_head"),
                             ("norm_head", "norm_head"), ("gs_head", "gs_head")):
        if f"{torch_name}.norm.weight" in sd:
            params[ours] = convert_dpt(sd, f"{torch_name}.",
                                       is_gsdpt=(torch_name == "gs_head"))
    if "gs_renderer.gs_head.0.weight" in sd:
        params["gs_renderer"] = convert_gs_renderer(sd, "gs_renderer.")
    return params


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file
        return load_file(path)
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    return {k: v.float().numpy() for k, v in sd.items()}


def main():
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(1)
    src, dst = sys.argv[1], sys.argv[2]
    sd = load_state_dict(src)
    print(f"loaded {len(sd)} tensors from {src}")
    params = convert_worldmirror(sd)
    from hunyuanworld_mirror_tpu.training import checkpoint as ckpt_lib
    ckpt_lib.save_params(dst, params)
    n = sum(int(np.asarray(x).size) for x in _leaves(params))
    print(f"wrote {dst}: {n / 1e6:.1f}M params")


def _leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _leaves(v)
    elif isinstance(tree, (list, tuple)):
        for v in tree:
            yield from _leaves(v)
    else:
        yield tree


if __name__ == "__main__":
    main()
