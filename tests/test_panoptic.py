"""ResNet-FPN CenterSnap panoptic baseline: shape, gradient, and train-step
smoke tests (reference models/models/centersnap/panoptic_backbone.py +
train_centersnap_panoptic.py — the reference has no tests for this model;
these follow its one-batch smoke-script pattern, test_transformer_arch.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from hunyuanworld_mirror_tpu.models import panoptic
from hunyuanworld_mirror_tpu.training import losses


CFG = panoptic.PanopticConfig()


def test_forward_shapes():
    params = panoptic.init(jax.random.PRNGKey(0), CFG)
    rgb = jnp.zeros((2, 64, 96, 3))
    depth = jnp.zeros((2, 64, 96))
    out = jax.jit(lambda p, r, d: panoptic.forward(p, CFG, r, d))(
        params, rgb, depth)
    assert out["heatmap"].shape == (2, 64, 96, 1)
    assert out["pose_map"].shape == (2, 32, 48, 12)
    assert out["small_disp"].shape == (2, 16, 24, 1)
    h = np.asarray(out["heatmap"])
    assert np.isfinite(h).all() and h.min() >= 0 and h.max() <= 1


def test_train_step_decreases_loss():
    import optax

    params = panoptic.init(jax.random.PRNGKey(1), CFG)
    rng = np.random.default_rng(0)
    batch = {
        "rgb": jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float32),
        "depth": jnp.asarray(rng.uniform(0, 1, (1, 64, 64)), jnp.float32),
        "heatmap": jnp.asarray(rng.uniform(0, 1, (1, 64, 64)), jnp.float32),
        "pose_map": jnp.asarray(rng.normal(size=(1, 32, 32, 12)), jnp.float32),
    }

    def loss_fn(p):
        preds = panoptic.forward(p, CFG, batch["rgb"], batch["depth"])
        total, _ = losses.centersnap_loss(preds, batch)
        return total

    opt = optax.adamw(1e-3)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        l, g = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(g, s, p)
        return optax.apply_updates(p, updates), s, l

    p, s, l0 = step(params, state)
    for _ in range(4):
        p, s, l = step(p, s)
    assert np.isfinite(float(l0))
    assert float(l) < float(l0)
