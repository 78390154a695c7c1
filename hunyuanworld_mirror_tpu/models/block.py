"""Transformer building blocks: MHA (optional QK-norm + 2D RoPE) and pre-LN block.

Behavioral parity targets:
  reference src/models/layers/attention.py:19-69 (SDPA, per-head-dim QK LayerNorm)
  reference src/models/layers/block.py:21-93 (pre-LN, LayerScale residuals)

TPU stance: attention runs through jax.nn.dot_product_attention (XLA picks the
fused flash path on TPU); params are plain pytrees so 24-layer stacks scan.
"""

from typing import Optional

import jax
import jax.numpy as jnp

from . import nn
from .rope import RopeTables, apply_rope2d


def attention_init(key, dim: int, num_heads: int, qkv_bias: bool = True,
                   proj_bias: bool = True, qk_norm: bool = False):
    k1, k2 = jax.random.split(key)
    p = {
        "qkv": nn.linear_init(k1, dim, dim * 3, qkv_bias),
        "proj": nn.linear_init(k2, dim, dim, proj_bias),
    }
    if qk_norm:
        head_dim = dim // num_heads
        p["q_norm"] = nn.layer_norm_init(head_dim)
        p["k_norm"] = nn.layer_norm_init(head_dim)
    return p


def attention(p, x: jnp.ndarray, num_heads: int,
              rope: Optional[RopeTables] = None,
              norm_eps: float = 1e-5, ring_mesh=None) -> jnp.ndarray:
    """Multi-head self-attention over (B, N, C).

    When `ring_mesh` is a Mesh with a >1 "view" axis, the softmax-attention
    core runs as ring attention over that axis (parallel/ring.py) — the
    sequence-parallel path for global cross-view layers.
    """
    B, N, C = x.shape
    head_dim = C // num_heads

    qkv = nn.linear(p["qkv"], x).reshape(B, N, 3, num_heads, head_dim)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, N, H, D)

    if "q_norm" in p:
        q = nn.layer_norm(p["q_norm"], q, eps=norm_eps)
        k = nn.layer_norm(p["k_norm"], k, eps=norm_eps)

    if rope is not None:
        q = apply_rope2d(q, rope)
        k = apply_rope2d(k, rope)

    scale = head_dim ** -0.5
    if ring_mesh is not None:
        from ..parallel.ring import ring_self_attention
        out = ring_self_attention(q, k, v, ring_mesh, scale)
    elif _use_flash(x.dtype, N, head_dim):
        out = _flash_core(q, k, v, scale)
    elif _use_onepass(N, head_dim):
        # short sequences (encoder + frame layers, N ~ 1.4k): the one-pass
        # exact-softmax VMEM kernel beats BOTH einsum (which pays the HBM
        # round trip of the (B, H, N, N) logits) and flash (online-softmax
        # overhead + block padding) — measured 0.54 vs 1.17 (einsum) vs
        # 0.65 ms (flash) per layer at N=1374/B=4 on v5e. Backward replays
        # the einsum formulation (ops/attn_onepass.py), so training
        # gradients keep einsum semantics; the O(N^2)-logits bwd memory is
        # fine at frame length (flash keeps the long global sequences).
        from ..ops.attn_onepass import onepass_attention
        out = onepass_attention(q, k, v, scale)
    else:
        # Explicit einsum attention: on this TPU backend XLA's fused
        # jax.nn.dot_product_attention path is ~16x SLOWER than two plain
        # batched matmuls (measured 126.6ms vs 7.8ms at N=5504), and requesting
        # f32 logits from the bf16 matmul costs another 12x (135ms vs 11ms —
        # the f32 output path bypasses the fast MXU route). So: logits in the
        # input dtype (the MXU accumulates in f32 internally).
        logits = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k)
        import os
        if (logits.dtype == jnp.bfloat16
                and os.environ.get("WM_SOFTMAX", "f32") == "bf16"):
            # bf16 softmax with an f32-accumulated sum. Default OFF: the
            # round-4 TPU A/B measured it 20 ms SLOWER on the S=4/518px
            # encoder (72.3 vs 52.8 ms) — XLA fuses the f32 upcast into the
            # softmax (the trace's reduce_sum was NOT a materialized-f32
            # cost) while the bf16 exp path lowers worse, and it moves
            # outputs ~3%. Kept as a measured-and-rejected option.
            m = jnp.max(logits, axis=-1, keepdims=True)
            e = jnp.exp(logits - m)
            s = jnp.sum(e, axis=-1, keepdims=True, dtype=jnp.float32)
            weights = e / s.astype(e.dtype)
        else:
            weights = jax.nn.softmax(
                logits.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", weights, v)
    out = out.reshape(B, N, C)
    return nn.linear(p["proj"], out)


_FLASH_BLOCK = 512


def _flash_block(n: int) -> int:
    """Flash kernel block size. WM_FLASH_BLOCK overrides; default 512.

    N pads to a block multiple, so smaller blocks waste fewer tokens on
    short sequences (frame layers at N=1374: +12% at 512, +2.5% at 128) at
    the cost of more grid steps; sweep with tools/attn_ab.py --sweep-block.
    """
    import os
    blk = int(os.environ.get("WM_FLASH_BLOCK", str(_FLASH_BLOCK)))
    blk = max(128, (blk // 128) * 128)  # Pallas BlockSizes need /128 tiles
    return min(blk, -(-n // 128) * 128)


def _use_flash(dtype, n: int, head_dim: int) -> bool:
    """Route the softmax core to the Pallas TPU flash kernel when it applies.

    Flash is the DEFAULT for long (global cross-view) sequences on TPU.
    Round 1 measured flash losing the composed model (6.27 vs 6.75 f/s)
    despite winning the isolated global stack — the cause turned out to be
    the n >= 512 threshold also routing the 24 FRAME-attention layers
    (N=1374, padded +12% to 1536) through the kernel, where plain einsum
    wins. With flash gated to n >= WM_FLASH_MIN_N (default 4096: global
    layers at S>=3, never frame layers) the full model measures 528.5 ms vs
    549.4 einsum at S=4/518px on v5e — 7.57 vs 7.28 f/s. WM_ATTN_IMPL=einsum
    opts out; max|err| vs an f32 einsum oracle is 6.5e-4 at bf16, custom VJP
    supported. Flash's O(N) memory is also what makes S>=16 single-chip
    inference possible at all (dense S=32 logits would be 62 GB).
    """
    import os
    impl = os.environ.get("WM_ATTN_IMPL", "flash")
    if impl != "flash" or jax.default_backend() != "tpu":
        return False
    # At frame-attention length (N=1374) the 512-pad (+12% tokens) and
    # kernel overheads lose to the plain einsum; the global cross-view
    # stack (N=S*1374 >= 4122 at S>=3) wins.
    min_n = int(os.environ.get("WM_FLASH_MIN_N", "4096"))
    # Gate only on min_n: _flash_core pads N up to a block multiple, so
    # n < block is handled — gating on max(block, min_n) silently disabled
    # flash whenever WM_FLASH_BLOCK exceeded N (advisor finding r2).
    return head_dim % 64 == 0 and n >= min_n


def _use_onepass(n: int, head_dim: int) -> bool:
    """Route short sequences to the one-pass VMEM attention kernel
    (ops/attn_onepass.py) on TPU. Covers exactly the lengths the einsum
    path served (n < WM_FLASH_MIN_N); WM_ATTN_IMPL=einsum opts out."""
    import os
    if (os.environ.get("WM_ATTN_IMPL", "flash") == "einsum"
            or jax.default_backend() != "tpu"):
        return False
    if os.environ.get("WM_ONEPASS", "1") != "1":
        return False
    return head_dim % 64 == 0 and n <= int(
        os.environ.get("WM_ONEPASS_MAX_N", "4095"))


def _flash_core(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                scale: float) -> jnp.ndarray:
    """(B, N, H, D) softmax-attention via the Pallas TPU flash kernel.

    N pads up to a 512 multiple; padded tokens carry segment id 2 (real
    tokens 1) so they are masked from real queries AND attend only to each
    other — a fully-masked softmax row would be NaN, this keeps every row
    well-defined for the custom VJP.
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        flash_attention, BlockSizes, SegmentIds)
    B, N, H, D = q.shape
    blk = _flash_block(N)
    npad = -(-N // blk) * blk
    pad = npad - N
    qt = jnp.transpose(q, (0, 2, 1, 3))
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))
    if pad:
        cfg = ((0, 0), (0, 0), (0, pad), (0, 0))
        qt, kt, vt = jnp.pad(qt, cfg), jnp.pad(kt, cfg), jnp.pad(vt, cfg)
    seg = jnp.where(jnp.arange(npad) < N, 1, 2).astype(jnp.int32)
    seg = jnp.broadcast_to(seg[None], (B, npad))
    bs = BlockSizes(block_q=blk, block_k_major=blk, block_k=blk, block_b=1,
                    block_q_major_dkv=blk, block_k_major_dkv=blk,
                    block_k_dkv=blk, block_q_dkv=blk,
                    block_k_major_dq=blk, block_k_dq=blk, block_q_dq=blk)
    out = flash_attention(qt, kt, vt, segment_ids=SegmentIds(q=seg, kv=seg),
                          causal=False, sm_scale=scale, block_sizes=bs)
    return jnp.transpose(out[:, :, :N], (0, 2, 1, 3))


def block_init(key, dim: int, num_heads: int, mlp_ratio: float = 4.0,
               qkv_bias: bool = True, proj_bias: bool = True,
               ffn_bias: bool = True, init_values: Optional[float] = None,
               qk_norm: bool = False, ffn_layer: str = "mlp"):
    k1, k2 = jax.random.split(key)
    if ffn_layer == "mlp":
        ffn = nn.mlp_init(k2, dim, int(dim * mlp_ratio), dim, ffn_bias)
    elif ffn_layer in ("swiglu", "swiglufused"):
        # reference vision_transformer.py:119-121: both names use the fused
        # (2/3-rounded) hidden width
        hidden = nn.swiglu_hidden_fused(int(dim * mlp_ratio))
        ffn = nn.swiglu_ffn_init(k2, dim, hidden, dim, ffn_bias)
    else:
        raise ValueError(f"unknown ffn_layer {ffn_layer!r}")
    p = {
        "norm1": nn.layer_norm_init(dim),
        "attn": attention_init(k1, dim, num_heads, qkv_bias, proj_bias, qk_norm),
        "norm2": nn.layer_norm_init(dim),
        "mlp": ffn,
    }
    if init_values:
        p["ls1"] = nn.layer_scale_init(dim, init_values)
        p["ls2"] = nn.layer_scale_init(dim, init_values)
    return p


def block(p, x: jnp.ndarray, num_heads: int,
          rope: Optional[RopeTables] = None,
          norm_eps: float = 1e-5, ring_mesh=None) -> jnp.ndarray:
    """Pre-LN transformer block with optional LayerScale."""
    h = attention(p["attn"], nn.layer_norm(p["norm1"], x, eps=norm_eps),
                  num_heads, rope=rope, norm_eps=norm_eps, ring_mesh=ring_mesh)
    if "ls1" in p:
        h = nn.layer_scale(p["ls1"], h)
    x = x + h

    y = nn.layer_norm(p["norm2"], x, eps=norm_eps)
    h = nn.swiglu_ffn(p["mlp"], y) if "w12" in p["mlp"] else nn.mlp(p["mlp"], y)
    if "ls2" in p:
        h = nn.layer_scale(p["ls2"], h)
    return x + h


def patch_embed_conv_init(key, patch_size: int, in_chans: int, embed_dim: int):
    """Conv patchify (B,H,W,C) -> (B, h*w, D); reference patch_embed.py:23-76."""
    return {"proj": nn.conv_init(key, in_chans, embed_dim, patch_size)}


def patch_embed_conv(p, x: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    y = nn.conv(p["proj"], x, stride=patch_size, padding="VALID")
    B, h, w, D = y.shape
    return y.reshape(B, h * w, D)


def patch_embed_mlp_init(key, patch_size: int, in_chans: int, embed_dim: int):
    """PixelUnshuffle -> Mlp patchify, used for the depth-prior encoder
    (reference patch_embed.py:79-108, in_chans=1, hidden 4*embed_dim)."""
    return {"mlp": nn.mlp_init(key, in_chans * patch_size ** 2, 4 * embed_dim, embed_dim)}


def patch_embed_mlp(p, x: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """x: (B, H, W, C) -> (B, h*w, D) via space-to-depth + MLP.

    Channel order matches torch F.pixel_unshuffle: out[c*r*r + i*r + j].
    """
    B, H, W, C = x.shape
    r = patch_size
    h, w = H // r, W // r
    x = x.reshape(B, h, r, w, r, C)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # (B, h, w, C, r, r)
    x = x.reshape(B, h * w, C * r * r)
    return nn.mlp(p["mlp"], x)
