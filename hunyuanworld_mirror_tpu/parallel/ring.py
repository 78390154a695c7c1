"""Ring attention over the view-sharded token axis.

The reference computes global cross-view attention as ONE dense SDPA over all
S*P tokens (src/models/models/visual_transformer.py:380 reshape to
(B, S*N, C); src/models/layers/attention.py:59) — O((S*P)^2) memory on a
single device, mitigated only by bf16. There is no sequence parallelism to
port (SURVEY.md §2.10/§5.7), so this module is the greenfield TPU design the
BASELINE north star asks for: views (frames) are sharded over the mesh "view"
axis; each device holds its local Q block and the K/V shards rotate around the
ICI ring via `lax.ppermute`, with numerically-stable online-softmax
accumulation (flash-attention style: running row max / denominator in f32).

Per ring step the device computes a (N_local x N_local) logit block on the MXU
while the next K/V shard is in flight — compute hides the ppermute latency
because each block matmul is O(N_local^2 * D) FLOPs vs O(N_local * D) bytes
moved.

Composition with the rest of the mesh: batch stays on "data", heads stay on
"model" (Megatron TP), so the shard_map specs below express DP x SP x TP in
one program. Degenerate axes (size 1) cost nothing.
"""

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8 exposes shard_map at the top level
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map


def _ring_attention_local(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          axis_name: str, scale: float) -> jnp.ndarray:
    """Local body, runs inside shard_map. q/k/v: (B, N_local, H, D).

    Bidirectional full attention (no causal mask — every view attends to every
    view, matching the reference's unmasked SDPA). Accumulation is f32; the
    block matmuls run in the input dtype so the MXU fast path is used
    (see models/block.py attention notes).
    """
    V = lax.axis_size(axis_name)
    B, Nl, H, D = q.shape
    qs = q * scale

    m = jnp.full((B, Nl, H, 1), -jnp.inf, jnp.float32)   # running row max
    l = jnp.zeros((B, Nl, H, 1), jnp.float32)            # running denominator
    acc = jnp.zeros((B, Nl, H, D), jnp.float32)          # running numerator

    perm = [(i, (i + 1) % V) for i in range(V)]

    k_cur, v_cur = k, v
    for step in range(V):
        # logits for this K block: (B, H, Nl, Nl) in input dtype (MXU
        # accumulates f32 internally), softmax math upcast to f32.
        logits = jnp.einsum("bnhd,bmhd->bhnm", qs, k_cur).astype(jnp.float32)
        blk_max = logits.max(axis=-1, keepdims=True).transpose(0, 2, 1, 3)
        m_new = jnp.maximum(m, blk_max)  # (B, Nl, H, 1)
        corr = jnp.exp(m - m_new)
        p = jnp.exp(logits - m_new.transpose(0, 2, 1, 3))  # (B, H, Nl, Nl) f32
        l = l * corr + p.sum(axis=-1, keepdims=True).transpose(0, 2, 1, 3)
        pv = jnp.einsum("bhnm,bmhd->bnhd", p.astype(v_cur.dtype), v_cur)
        acc = acc * corr + pv.astype(jnp.float32)
        m = m_new
        if step + 1 < V:
            k_cur = lax.ppermute(k_cur, axis_name, perm)
            v_cur = lax.ppermute(v_cur, axis_name, perm)

    out = acc / l
    return out.astype(q.dtype)


def ring_self_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                        mesh: Mesh, scale: float,
                        seq_axis: str = "view", batch_axis: str = "data",
                        head_axis: str = "model") -> jnp.ndarray:
    """Full (unmasked) self-attention with the sequence axis sharded.

    Args:
      q, k, v: (B, N, H, D) GLOBAL arrays (call under jit/pjit; shard_map
        slices them). N must be divisible by the "view" axis size — for the
        VGT that holds whenever S (views) is a multiple of the axis.
      mesh: the (data, view, model) device mesh (parallel/mesh.py).
      scale: attention scale (1/sqrt(head_dim)).
    Returns:
      (B, N, H, D) attention output, same dtype as q.
    """
    if mesh is None or mesh.shape.get(seq_axis, 1) == 1:
        # No ring needed: plain dense attention (still DP/TP sharded by GSPMD).
        logits = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k)
        w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
        return jnp.einsum("bhnm,bmhd->bnhd", w, v)

    spec = P(batch_axis, seq_axis, head_axis, None)
    inner = shard_map(
        partial(_ring_attention_local, axis_name=seq_axis, scale=scale),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False)
    return inner(q, k, v)
