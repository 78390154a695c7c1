"""MCMC strategy + selective Adam parity tests.

Oracles: the relocation double loop transcribed from the reference CUDA
kernel (RelocationCUDA.cu:33-44) run in numpy, and a plain no-bias-correction
Adam for the visible rows of selective Adam."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hunyuanworld_mirror_tpu.training import mcmc


def _relocation_oracle(op, scales, ratios, n_max=51):
    """Direct transcription of the CUDA double loop (numpy)."""
    from math import comb
    N = op.shape[0]
    new_op = 1.0 - np.power(1.0 - op, 1.0 / ratios)
    new_scales = np.zeros_like(scales)
    for idx in range(N):
        denom = 0.0
        for i in range(1, ratios[idx] + 1):
            for k in range(i):
                denom += comb(i - 1, k) * ((-1.0) ** k / np.sqrt(k + 1)) \
                         * new_op[idx] ** (k + 1)
        new_scales[idx] = (op[idx] / denom) * scales[idx]
    return new_op, new_scales


def test_relocation_matches_cuda_formula(rng):
    N = 32
    op = rng.uniform(0.01, 0.99, N).astype(np.float32)
    scales = rng.uniform(0.001, 0.1, (N, 3)).astype(np.float32)
    ratios = rng.integers(1, 20, N).astype(np.int32)
    ref_op, ref_scales = _relocation_oracle(op, scales, ratios)
    out_op, out_scales = mcmc.compute_relocation(
        jnp.asarray(op), jnp.asarray(scales), jnp.asarray(ratios))
    np.testing.assert_allclose(np.asarray(out_op), ref_op, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out_scales), ref_scales, rtol=1e-4)


def _toy_raw(rng, N=64, n_alive=40):
    alive = np.zeros(N, np.float32)
    alive[:n_alive] = 1.0
    op = rng.uniform(0.001, 0.9, N).astype(np.float32)
    return {
        "means": jnp.asarray(rng.normal(size=(N, 3)), jnp.float32),
        "log_scales": jnp.asarray(rng.uniform(-5, -2, (N, 3)), jnp.float32),
        "quats": jnp.asarray(np.tile([1.0, 0, 0, 0], (N, 1)), jnp.float32),
        "opacity_logits": jnp.asarray(np.log(op / (1 - op)), jnp.float32),
        "sh": jnp.asarray(rng.normal(size=(N, 1, 3)), jnp.float32),
        "alive": jnp.asarray(alive),
    }


def test_mcmc_refine_teleports_and_grows(rng):
    raw = _toy_raw(rng)
    n0 = int(np.sum(np.asarray(raw["alive"]) > 0.5))
    out = jax.jit(mcmc.mcmc_refine)(raw, jax.random.PRNGKey(0))
    n1 = int(np.sum(np.asarray(out["alive"]) > 0.5))
    assert n1 >= n0  # grows toward capacity
    # no live splat below min opacity remains (teleported onto healthy ones)
    op = jax.nn.sigmoid(out["opacity_logits"])
    live_op = np.asarray(op)[np.asarray(out["alive"]) > 0.5]
    assert live_op.min() >= 0.005 - 1e-6
    for k in ("means", "log_scales", "quats", "sh"):
        assert np.isfinite(np.asarray(out[k])).all()


def test_inject_noise_respects_gates(rng):
    raw = _toy_raw(rng)
    # crank opacity up -> gate ~0 -> no movement
    raw_high = dict(raw)
    raw_high["opacity_logits"] = jnp.full_like(raw["opacity_logits"], 6.0)
    out = mcmc.inject_position_noise(raw_high, jax.random.PRNGKey(1), 1.0)
    np.testing.assert_allclose(np.asarray(out["means"]),
                               np.asarray(raw["means"]), atol=1e-6)
    # near-dead splats DO move, dead slots don't
    raw_low = dict(raw)
    raw_low["opacity_logits"] = jnp.full_like(raw["opacity_logits"], -8.0)
    out2 = mcmc.inject_position_noise(raw_low, jax.random.PRNGKey(1), 1.0)
    delta = np.abs(np.asarray(out2["means"]) - np.asarray(raw["means"]))
    alive = np.asarray(raw["alive"]) > 0.5
    assert delta[alive].max() > 0
    np.testing.assert_allclose(delta[~alive], 0.0, atol=0)


def test_selective_adam_vs_dense(rng):
    """Visible rows follow no-bias-correction Adam; invisible rows frozen."""
    N, D = 16, 3
    params = {"x": jnp.asarray(rng.normal(size=(N, D)), jnp.float32)}
    tx = mcmc.selective_adam(1e-2)
    state = tx.init(params)

    g = rng.normal(size=(N, D)).astype(np.float32)
    g[::2] = 0.0  # even rows invisible
    grads = {"x": jnp.asarray(g)}

    updates, state2 = tx.update(grads, state, params)
    new = optax_apply = np.asarray(params["x"] + updates["x"])

    # invisible rows unchanged
    np.testing.assert_array_equal(new[::2], np.asarray(params["x"])[::2])
    # visible rows: -lr * m / (sqrt(v) + eps), m=(1-b1)g, v=(1-b2)g^2
    m = 0.1 * g[1::2]
    v = 0.001 * g[1::2] ** 2
    expect = np.asarray(params["x"])[1::2] - 1e-2 * m / (np.sqrt(v) + 1e-8)
    np.testing.assert_allclose(new[1::2], expect, rtol=1e-5)
    # moments of invisible rows stayed zero
    np.testing.assert_array_equal(np.asarray(state2.mu["x"])[::2], 0.0)


def test_mcmc_splat_opt_end_to_end(rng):
    """Tiny MCMC-strategy optimization run improves the photometric loss."""
    from hunyuanworld_mirror_tpu.training import splat_opt

    N, S, H, W = 32, 2, 32, 32
    splats = {
        "means": rng.uniform(-0.5, 0.5, (N, 3)).astype(np.float32) + [0, 0, 2.5],
        "quats": np.tile([1.0, 0, 0, 0], (N, 1)).astype(np.float32),
        "scales": np.exp(rng.uniform(-3.5, -2.5, (N, 3))).astype(np.float32),
        "opacities": rng.uniform(0.3, 0.9, N).astype(np.float32),
        "sh": rng.normal(0, 0.3, (N, 1, 3)).astype(np.float32),
    }
    images = rng.uniform(0, 1, (S, H, W, 3)).astype(np.float32)
    c2w = np.broadcast_to(np.eye(4, dtype=np.float32), (S, 4, 4)).copy()
    c2w[1, 0, 3] = 0.1
    Ks = np.broadcast_to(
        np.array([[30.0, 0, 16], [0, 30.0, 16], [0, 0, 1]], np.float32),
        (S, 3, 3)).copy()

    cfg = splat_opt.SplatOptConfig(
        iters=40, strategy="mcmc", refine_every=15, refine_start=10,
        refine_stop=35, use_selective_adam=True, max_per_tile=512,
        noise_lr=5e3)
    losses = []
    out = splat_opt.optimize_splats(
        splats, images, c2w, Ks, cfg=cfg,
        log_fn=lambda s: losses.append(s))
    assert out["means"].shape[0] >= N  # grew
    assert np.isfinite(out["means"]).all()
