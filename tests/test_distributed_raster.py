"""Distributed rasterization: gaussian/camera-sharded == single-device.

Protocol parity target: gsplat rendering.py:360-610 distributed=True path
(cameras all-gathered, projected splats all-to-all'd, local tile raster)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hunyuanworld_mirror_tpu.ops import rasterizer
from hunyuanworld_mirror_tpu.ops.distributed import rasterize_distributed
from hunyuanworld_mirror_tpu.parallel import mesh as mesh_lib


def _scene(rng, N=256, C=8):
    means = jnp.asarray(rng.uniform(-1, 1, (N, 3)) + np.array([0, 0, 3.0]),
                        jnp.float32)
    quats = jnp.asarray(rng.normal(size=(N, 4)), jnp.float32)
    quats = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True)
    scales = jnp.asarray(np.exp(rng.uniform(-4, -2.3, (N, 3))), jnp.float32)
    opac = jnp.asarray(rng.uniform(0.3, 0.95, (N,)), jnp.float32)
    colors = jnp.asarray(rng.uniform(0, 1, (N, 3)), jnp.float32)
    viewmats = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (C, 4, 4))
    # distinct per-camera translations
    tx = jnp.linspace(-0.2, 0.2, C)
    viewmats = viewmats.at[:, 0, 3].set(tx)
    Ks = jnp.broadcast_to(
        jnp.array([[60.0, 0, 32], [0, 60.0, 32], [0, 0, 1]], jnp.float32),
        (C, 3, 3))
    return means, quats, scales, opac, colors, viewmats, Ks


@pytest.mark.parametrize("render_mode", ["RGB", "RGB+ED"])
def test_distributed_matches_single(rng, render_mode):
    args = _scene(rng)
    W = H = 64
    ref, ref_alpha, _ = rasterizer.rasterize(
        *args, width=W, height=H, render_mode=render_mode, impl="jax")

    mesh = mesh_lib.make_mesh(1, 8, 1)
    out, alpha = jax.jit(
        lambda *a: rasterize_distributed(
            *a, width=W, height=H, mesh=mesh, axis="view",
            render_mode=render_mode, impl="jax"))(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(alpha), np.asarray(ref_alpha),
                               atol=2e-5, rtol=1e-4)


def test_distributed_gradients_flow(rng):
    """Backward through the all_to_all: splat params get pixel grads from
    cameras owned by other devices."""
    args = _scene(rng, N=64, C=8)
    W = H = 32
    mesh = mesh_lib.make_mesh(1, 8, 1)

    def loss(means, opac):
        out, _ = rasterize_distributed(
            means, args[1], args[2], opac, args[4], args[5], args[6],
            width=W, height=H, mesh=mesh, axis="view",
            render_mode="RGB", impl="jax")
        return jnp.sum(out ** 2)

    g_means, g_opac = jax.jit(jax.grad(loss, argnums=(0, 1)))(args[0], args[3])
    assert np.isfinite(np.asarray(g_means)).all()
    assert np.isfinite(np.asarray(g_opac)).all()
    assert float(jnp.abs(g_opac).max()) > 0

    # parity with single-device gradient
    def loss_ref(means, opac):
        out, _, _ = rasterizer.rasterize(
            means, args[1], args[2], opac, args[4], args[5], args[6],
            width=W, height=H, render_mode="RGB", impl="jax")
        return jnp.sum(out ** 2)

    r_means, r_opac = jax.grad(loss_ref, argnums=(0, 1))(args[0], args[3])
    np.testing.assert_allclose(np.asarray(g_means), np.asarray(r_means),
                               atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(g_opac), np.asarray(r_opac),
                               atol=1e-4, rtol=1e-3)


def test_distributed_sh_colors(rng):
    """SH colors (view-dependent) evaluated pre-exchange match single-device."""
    means, quats, scales, opac, _, viewmats, Ks = _scene(rng, N=64, C=8)
    sh = jnp.asarray(rng.normal(0, 0.3, (64, 4, 3)), jnp.float32)  # deg 1
    W = H = 32
    ref, _, _ = rasterizer.rasterize(
        means, quats, scales, opac, sh, viewmats, Ks,
        width=W, height=H, render_mode="RGB", impl="jax")
    mesh = mesh_lib.make_mesh(1, 8, 1)
    out, _ = jax.jit(
        lambda *a: rasterize_distributed(
            *a, width=W, height=H, mesh=mesh, axis="view",
            render_mode="RGB", impl="jax", sh_degree=1))(
        means, quats, scales, opac, sh, viewmats, Ks)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)
