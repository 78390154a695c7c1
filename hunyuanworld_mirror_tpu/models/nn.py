"""Functional NN primitives: explicit param pytrees, scan-friendly.

Design stance (SURVEY.md §7.1): no module objects — every layer is an
`*_init(key, ...) -> params` plus a pure `apply(params, x)` function. Layer
stacks are `jax.tree.map(stack)`-ed and driven by `lax.scan`, params live in
fp32, matmul compute runs in the caller's dtype (bf16 trunk), LayerNorm
statistics always in fp32.

Conventions:
  * images / feature maps are NHWC (TPU-native layout)
  * conv weights are HWIO, conv-transpose weights HWOI
  * GELU is exact (erf) to match torch nn.GELU
"""

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax


def _split(key, n):
    return jax.random.split(key, n)


# ---------------------------------------------------------------------------
# Initializers
# ---------------------------------------------------------------------------

def trunc_normal(key, shape, std=0.02, dtype=jnp.float32):
    return jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype) * std


def kaiming_uniform(key, shape, fan_in, dtype=jnp.float32):
    bound = (6.0 / fan_in) ** 0.5 / (2.0 ** 0.5)  # torch default: a=sqrt(5)
    # torch kaiming_uniform with a=sqrt(5): gain = sqrt(2/(1+5)) = sqrt(1/3)
    bound = (1.0 / (3.0 * fan_in)) ** 0.5 * (3.0 ** 0.5)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def xavier_uniform(key, shape, fan_in, fan_out, gain=1.0, dtype=jnp.float32):
    bound = gain * (6.0 / (fan_in + fan_out)) ** 0.5
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _bias_uniform(key, shape, fan_in, dtype=jnp.float32):
    bound = 1.0 / (fan_in ** 0.5) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


# ---------------------------------------------------------------------------
# Linear
# ---------------------------------------------------------------------------

def linear_init(key, in_dim: int, out_dim: int, bias: bool = True, std: float = 0.02):
    kw, kb = _split(key, 2)
    p = {"w": trunc_normal(kw, (in_dim, out_dim), std)}
    if bias:
        p["b"] = jnp.zeros((out_dim,), jnp.float32)
    return p


def linear(p, x):
    y = x @ p["w"].astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


# ---------------------------------------------------------------------------
# LayerNorm (fp32 statistics) / LayerScale
# ---------------------------------------------------------------------------

def layer_norm_init(dim: int, affine: bool = True):
    if not affine:
        return {}
    return {"scale": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)}


def layer_norm(p, x, eps: float = 1e-6):
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * lax.rsqrt(var + eps)
    if p:
        y = y * p["scale"] + p["bias"]
    return y.astype(dtype)


def layer_scale_init(dim: int, init_value: float = 1e-2):
    return {"gamma": jnp.full((dim,), init_value, jnp.float32)}


def layer_scale(p, x):
    return x * p["gamma"].astype(x.dtype)


# ---------------------------------------------------------------------------
# MLP (ViT-style fc1 -> GELU -> fc2)
# ---------------------------------------------------------------------------

def mlp_init(key, in_dim: int, hidden_dim: Optional[int] = None,
             out_dim: Optional[int] = None, bias: bool = True):
    hidden_dim = hidden_dim or in_dim
    out_dim = out_dim or in_dim
    k1, k2 = _split(key, 2)
    return {
        "fc1": linear_init(k1, in_dim, hidden_dim, bias),
        "fc2": linear_init(k2, hidden_dim, out_dim, bias),
    }


def mlp(p, x):
    x = linear(p["fc1"], x)
    x = jax.nn.gelu(x, approximate=False)
    return linear(p["fc2"], x)


def silu_mlp_init(key, in_dim: int, hidden_dim: int, out_dim: int):
    """Linear -> SiLU -> Linear (used by the pose/ray prior token embedders,
    reference: src/models/models/visual_transformer.py:179-183,198-202)."""
    k1, k2 = _split(key, 2)
    return {
        "fc1": linear_init(k1, in_dim, hidden_dim),
        "fc2": linear_init(k2, hidden_dim, out_dim),
    }


def silu_mlp(p, x):
    x = linear(p["fc1"], x)
    x = jax.nn.silu(x)
    return linear(p["fc2"], x)


def swiglu_hidden_fused(hidden_dim: int) -> int:
    """'Fused' hidden rounding: 2/3 of the MLP width, aligned up to 8
    (reference src/models/layers/swiglu_ffn.py:49-62 SwiGLUFFNFused)."""
    return (int(hidden_dim * 2 / 3) + 7) // 8 * 8


def swiglu_ffn_init(key, in_dim: int, hidden_dim: Optional[int] = None,
                    out_dim: Optional[int] = None, bias: bool = True):
    """SwiGLU FFN (reference src/models/layers/swiglu_ffn.py:9-29): one fused
    projection to 2*hidden, gate with silu(x1)*x2, project back. Used by the
    DINOv2 ViT-giant2 encoder (vision_transformer.py:119-121,378-392)."""
    hidden_dim = hidden_dim or in_dim
    out_dim = out_dim or in_dim
    k1, k2 = _split(key, 2)
    return {
        "w12": linear_init(k1, in_dim, 2 * hidden_dim, bias),
        "w3": linear_init(k2, hidden_dim, out_dim, bias),
    }


def swiglu_ffn(p, x):
    x12 = linear(p["w12"], x)
    x1, x2 = jnp.split(x12, 2, axis=-1)
    return linear(p["w3"], jax.nn.silu(x1) * x2)


def group_norm_init(dim: int):
    return {"scale": jnp.ones((dim,), jnp.float32),
            "bias": jnp.zeros((dim,), jnp.float32)}


def group_norm(p, x, num_groups: int = 16, eps: float = 1e-5):
    """GroupNorm over NHWC (stats in fp32). Groups clamp to the channel count
    so 1-channel maps degrade to InstanceNorm (reference centersnap backbone
    group_norm uses 16 groups, panoptic_backbone.py:148-156)."""
    C = x.shape[-1]
    g = min(num_groups, C)
    while C % g:
        g -= 1
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    shape = x.shape[:-1] + (g, C // g)
    xg = x32.reshape(shape)
    axes = tuple(range(1, x.ndim - 1)) + (x.ndim,)  # spatial dims + intra-group
    mean = jnp.mean(xg, axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(xg - mean), axis=axes, keepdims=True)
    y = ((xg - mean) * lax.rsqrt(var + eps)).reshape(x.shape)
    y = y * p["scale"] + p["bias"]
    return y.astype(dtype)


# ---------------------------------------------------------------------------
# Convolutions (NHWC, HWIO)
# ---------------------------------------------------------------------------

def conv_init(key, in_ch: int, out_ch: int, kernel: int, bias: bool = True):
    kh = kw = kernel
    fan_in = in_ch * kh * kw
    k1, k2 = _split(key, 2)
    p = {"w": kaiming_uniform(k1, (kh, kw, in_ch, out_ch), fan_in)}
    if bias:
        p["b"] = _bias_uniform(k2, (out_ch,), fan_in)
    return p


def conv(p, x, stride: int = 1, padding="SAME"):
    kh, kw, in_ch, out_ch = p["w"].shape
    if ((kh, kw) == (stride, stride) and padding in ("VALID", 0)
            and x.shape[1] % kh == 0 and x.shape[2] % kw == 0):
        # patchify case (kernel == stride, e.g. the ViT 14x14/s14 embed):
        # windows don't overlap, so the conv is space-to-depth + ONE
        # (B*h*w, k*k*Cin) @ (k*k*Cin, Cout) MXU matmul — XLA's implicit-GEMM
        # conv pads the C_in=3 contraction badly. Bit-identical reshuffle.
        B, H, W, _ = x.shape
        h, w = H // kh, W // kw
        xp = x.reshape(B, h, kh, w, kw, in_ch)
        xp = xp.transpose(0, 1, 3, 2, 4, 5).reshape(B, h, w, kh * kw * in_ch)
        y = xp @ p["w"].reshape(kh * kw * in_ch, out_ch).astype(x.dtype)
    else:
        if isinstance(padding, int):
            padding = [(padding, padding), (padding, padding)]
        y = lax.conv_general_dilated(
            x, p["w"].astype(x.dtype),
            window_strides=(stride, stride),
            padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def conv_transpose_init(key, in_ch: int, out_ch: int, kernel: int, bias: bool = True):
    kh = kw = kernel
    fan_in = in_ch * kh * kw  # torch ConvTranspose2d fan-in convention
    k1, k2 = _split(key, 2)
    p = {"w": kaiming_uniform(k1, (kh, kw, out_ch, in_ch), fan_in)}
    if bias:
        p["b"] = _bias_uniform(k2, (out_ch,), fan_in)
    return p


def conv_transpose(p, x, stride: int):
    kh, kw, out_ch, in_ch = p["w"].shape
    if (kh, kw) == (stride, stride):
        # stride == kernel -> output blocks don't overlap, so the deconv is
        # EXACTLY a per-pixel linear to a (kh*kw*out_ch) vector + pixel
        # shuffle: one clean (B*H*W, Cin) @ (Cin, kh*kw*Cout) MXU matmul
        # instead of XLA's general conv_transpose lowering (input dilation /
        # kernel flip machinery). This is the DPT resize0/resize1 case
        # (dense_head.py 4x4/s4 and 2x2/s2 deconvs).
        B, H, W, _ = x.shape
        # lax.conv_transpose (transpose_kernel=False) applies the SPATIALLY
        # FLIPPED kernel — match it exactly (verified bit-identical)
        wmat = p["w"][::-1, ::-1].transpose(3, 0, 1, 2).reshape(
            in_ch, kh * kw * out_ch)
        y = x @ wmat.astype(x.dtype)                  # (B, H, W, kh*kw*Cout)
        y = y.reshape(B, H, W, kh, kw, out_ch)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(B, H * kh, W * kw, out_ch)
    else:
        y = lax.conv_transpose(
            x, p["w"].astype(x.dtype),
            strides=(stride, stride),
            padding="VALID",
            dimension_numbers=("NHWC", "HWOI", "NHWC"),
        )
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


# ---------------------------------------------------------------------------
# Param-pytree helpers for scanned layer stacks
# ---------------------------------------------------------------------------

def stack_params(param_list: Sequence):
    """Stack a list of identical pytrees along a new leading axis (for scan)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *param_list)


def unstack_params(stacked, idx: int):
    return jax.tree.map(lambda x: x[idx], stacked)


def param_count(params) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(params))
