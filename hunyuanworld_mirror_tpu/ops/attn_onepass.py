"""One-pass exact-softmax attention kernel for short/medium sequences.

The trunk's frame layers (N ~ 1.4k) and the S<=4 global layers (N ~ 5.5k)
are too short for flash attention to win: the online-softmax machinery and
block padding cost more than they save (measured kernel-level, v5e:
einsum 1.27 ms vs flash 1.53 ms at N=1374/B=4; flash 2.20 ms at N=5496 —
28% of peak). The XLA einsum path is worse still at global length because
it materializes the (B, H, N, N) logits tensor in HBM (1.9 GB f32 at
N=5496) — attention there is pure HBM traffic (1.1 TF/s measured).

This kernel does the obvious TPU thing for sequences whose WHOLE K/V fit
VMEM (~16 MB/core): grid over (batch*heads, query blocks); each program
loads its q block plus the full K and V, computes the (bq, N) logit block
on the MXU with f32 accumulation, takes an EXACT row softmax in VMEM (the
full row is present — no online rescaling), and contracts with V. HBM
traffic is Q+K+V+O only; K/V blocks are grid-invariant along the query
axis, so Pallas keeps them resident instead of refetching.

VMEM budget at the largest supported shape (N=8192, bq=512):
q 64 KB + k/v 2x 1 MB + logits f32 16 MB... exceeds; MAX_N is therefore
bounded by bq * N * 4B + 2 * N * D * 2B <= ~12 MB -> N <= 5632 at bq=512,
N <= 8192 at bq=256 (see _pick_bq). Beyond that, callers fall back to
flash (models/block.py routing).

Reference semantics: src/models/layers/attention.py:19-69 (plain SDPA).
Numerics: logits are bf16 MXU products accumulated in f32 — slightly MORE
accurate than the einsum path (which rounds logits to bf16 before its f32
softmax); max|d| vs the f32 einsum oracle is ~1e-3 at bf16 inputs, same
band as the flash kernel.

Backward: custom VJP replaying the mathematically identical einsum
formulation through jax.vjp (the rasterizer's dense-bin precedent); the
trunk's training path keeps exact autodiff semantics without a bespoke
backward kernel.
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")


def _pick_bq(npad: int) -> int:
    """Largest query block whose f32 logit slab fits a ~6 MB VMEM budget
    (leaves room for K/V double residency + out)."""
    for bq in (512, 256, 128):
        if bq * npad * 4 <= 6 * 1024 * 1024:
            return bq
    return 128


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, n_real: int):
    q = q_ref[0]          # (bq, D) bf16
    k = k_ref[0]          # (Npad, D) bf16
    v = v_ref[0]
    logits = lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # (bq, Npad) f32
    logits = logits * scale
    if n_real != logits.shape[1]:
        col = lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < n_real, logits, NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    s = jnp.sum(e, axis=-1, keepdims=True)
    w = (e / s).astype(v.dtype)
    o_ref[0] = lax.dot_general(
        w, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _forward(q, k, v, scale: float):
    """q, k, v: (B, N, H, D) -> (B, N, H, D). bf16 or f32."""
    B, N, H, D = q.shape
    npad = -(-N // 128) * 128
    bq = _pick_bq(npad)
    nq = -(-npad // bq)
    npad_q = nq * bq

    def to_bhnd(x, pad_to):
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(B * H, N, D)
        if pad_to != N:
            x = jnp.pad(x, ((0, 0), (0, pad_to - N), (0, 0)))
        return x

    qt = to_bhnd(q, npad_q)
    kt = to_bhnd(k, npad)
    vt = to_bhnd(v, npad)

    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, n_real=N),
        grid=(B * H, nq),
        in_specs=[
            pl.BlockSpec((1, bq, D), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, npad, D), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, npad, D), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, D), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, npad_q, D), q.dtype),
    )(qt, kt, vt)

    out = out[:, :N].reshape(B, H, N, D)
    return jnp.transpose(out, (0, 2, 1, 3))


def _einsum_ref(q, k, v, scale: float):
    """The mathematically identical XLA formulation (models/block.py einsum
    path); used for the backward replay and as the test oracle."""
    logits = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k)
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhnm,bmhd->bnhd", w, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def onepass_attention(q, k, v, scale: float):
    """Exact-softmax attention; (B, N, H, D) in and out. See module doc."""
    return _forward(q, k, v, scale)


def _fwd(q, k, v, scale):
    return _forward(q, k, v, scale), (q, k, v)


def _bwd(scale, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q, k, v: _einsum_ref(q, k, v, scale), q, k, v)
    return vjp(g)


onepass_attention.defvjp(_fwd, _bwd)


def max_supported_n(bq_min: int = 128) -> int:
    """Largest N the kernel accepts within the VMEM budget (at bq=128)."""
    return (6 * 1024 * 1024) // (bq_min * 4)
