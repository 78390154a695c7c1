"""Ring attention: sharded-softmax parity with dense attention.

The reference has NO sequence parallelism (SURVEY.md §2.10) — its global
attention is one dense SDPA. These tests pin the greenfield ring design to
that dense semantics on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hunyuanworld_mirror_tpu.parallel import mesh as mesh_lib
from hunyuanworld_mirror_tpu.parallel.ring import ring_self_attention


def dense_attention(q, k, v, scale):
    logits = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k).astype(jnp.float32)
    w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhnm,bmhd->bnhd", w, v)


@pytest.mark.parametrize("dims", [(1, 8, 1), (2, 4, 1), (1, 4, 2)])
def test_ring_matches_dense(rng, dims):
    mesh = mesh_lib.make_mesh(*dims)
    B, N, H, D = 2, 8 * 6, 4, 16  # N divisible by every view-axis size used
    q = jnp.asarray(rng.standard_normal((B, N, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, N, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, N, H, D)), jnp.float32)
    scale = D ** -0.5

    ref = dense_attention(q, k, v, scale)
    out = jax.jit(lambda a, b, c: ring_self_attention(a, b, c, mesh, scale))(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_ring_degenerate_axis_is_dense(rng):
    mesh = mesh_lib.make_mesh(8, 1, 1)
    B, N, H, D = 2, 16, 2, 8
    q = jnp.asarray(rng.standard_normal((B, N, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, N, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, N, H, D)), jnp.float32)
    out = ring_self_attention(q, k, v, mesh, D ** -0.5)
    ref = dense_attention(q, k, v, D ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_ring_gradients_match_dense(rng):
    mesh = mesh_lib.make_mesh(1, 4, 1)
    B, N, H, D = 1, 16, 2, 8
    q = jnp.asarray(rng.standard_normal((B, N, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, N, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, N, H, D)), jnp.float32)
    scale = D ** -0.5

    def loss_ring(q, k, v):
        return jnp.sum(ring_self_attention(q, k, v, mesh, scale) ** 2)

    def loss_dense(q, k, v):
        return jnp.sum(dense_attention(q, k, v, scale) ** 2)

    g_ring = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
    g_dense = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ring, g_dense):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


def test_aggregator_ring_matches_dense():
    """Full trunk: ring-sharded global attention == dense global attention."""
    from hunyuanworld_mirror_tpu.models import aggregator

    cfg = aggregator.VGTConfig(
        img_size=28, patch_size=14, embed_dim=64, depth=2, num_heads=4,
        patch_embed="conv", intermediate_idxs=(0, 1))
    params = aggregator.init(jax.random.PRNGKey(0), cfg)
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (1, 8, 28, 28, 3))

    mesh = mesh_lib.make_mesh(1, 8, 1)
    outs_dense, _ = jax.jit(
        lambda p, im: aggregator.forward(p, cfg, im, dtype=jnp.float32))(params, imgs)
    outs_ring, _ = jax.jit(
        lambda p, im: aggregator.forward(p, cfg, im, dtype=jnp.float32,
                                         ring_mesh=mesh))(params, imgs)
    for a, b in zip(outs_ring, outs_dense):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4)
