"""MCMC splat strategy + selective Adam, TPU-native.

Behavioral parity targets:
  * relocation math — reference submodules/gsplat/gsplat/cuda/csrc/
    RelocationCUDA.cu:12-45 (Eq. 9 of "3DGS as MCMC", arXiv:2404.09591) and
    strategy/ops.py:245-341 (relocate/sample_add);
  * strategy schedule — reference gsplat/strategy/mcmc.py:13-190
    (teleport low-opacity splats onto opacity-sampled live ones, grow count
    by 5% per refine toward cap, inject covariance-shaped position noise
    every step);
  * selective Adam — reference gsplat/optimizers/selective_adam.py:6-90 +
    cuda AdamCUDA.cu (visibility-masked Adam, no bias correction).

TPU re-design decisions:
  * fixed-capacity arrays with an `alive` mask instead of torch tensor
    resizing — relocation AND growth are one static-shape scatter pass;
  * the CUDA double loop over binomials collapses via the hockey-stick
    identity  sum_{i=1..n} C(i-1,k) = C(n,k+1)  to ONE (N, n_max)
    contraction:  denom = sum_{j=1..n} C(n,j) (-1)^{j+1} o'^j / sqrt(j);
  * selective Adam is an optax transform that infers per-splat visibility
    from nonzero gradient rows (equivalent to the reference's radii>0 mask:
    invisible splats receive exactly-zero pixel gradients).
"""

from functools import partial
from math import comb
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

N_MAX = 51  # reference mcmc.py:59


def _binom_table(n_max: int = N_MAX) -> np.ndarray:
    return np.array([[comb(n, k) if k <= n else 0.0 for k in range(n_max + 1)]
                     for n in range(n_max + 1)], np.float32)


def compute_relocation(opacities: jnp.ndarray, scales: jnp.ndarray,
                       ratios: jnp.ndarray, n_max: int = N_MAX):
    """New (opacity, scales) for splats split into `ratios` copies.

    opacities (N,), scales (N, 3), ratios (N,) int >= 1.
    new_op = 1 - (1-op)^(1/n);  scales *= op / denom(n, new_op).
    """
    n = jnp.clip(ratios, 1, n_max).astype(jnp.int32)
    new_op = 1.0 - jnp.power(1.0 - opacities, 1.0 / n)

    js = jnp.arange(1, n_max + 1, dtype=jnp.float32)          # (n_max,)
    binoms = jnp.asarray(_binom_table(n_max))                  # (n_max+1, n_max+1)
    c_nj = binoms[n][:, 1:]                                    # (N, n_max): C(n, j)
    sign = jnp.power(-1.0, js + 1.0)
    terms = c_nj * sign * jnp.power(new_op[:, None], js) / jnp.sqrt(js)
    denom = jnp.sum(jnp.where(js[None, :] <= n[:, None], terms, 0.0), axis=1)
    coeff = opacities / jnp.maximum(denom, 1e-12)
    return new_op, scales * coeff[:, None]


def mcmc_refine(raw: Dict, key, min_opacity: float = 0.005,
                grow_factor: float = 1.05) -> Dict:
    """One MCMC refine: teleport dying splats + grow toward capacity.

    Operates on the fixed-capacity raw dict of splat_opt.py (means,
    log_scales, quats, opacity_logits, sh, alive). Destination slots =
    (alive & opacity<=min_opacity) teleports plus enough free slots to grow
    the population by `grow_factor`; sources are sampled from healthy splats
    with probability proportional to opacity (reference ops.py:267-271).
    """
    N = raw["means"].shape[0]
    opac = jax.nn.sigmoid(raw["opacity_logits"])
    alive = raw["alive"] > 0.5
    healthy = alive & (opac > min_opacity)
    dying = alive & ~healthy

    n_alive = jnp.sum(alive)
    n_grow = jnp.minimum(
        jnp.floor(n_alive.astype(jnp.float32) * (grow_factor - 1.0)).astype(jnp.int32),
        jnp.sum(~alive))
    # destinations: all dying slots, plus the first n_grow free slots
    free_rank = jnp.argsort(jnp.where(alive, 1.0, 0.0))   # free slots first
    grow_dest = jnp.zeros((N,), bool).at[free_rank].set(jnp.arange(N) < n_grow)
    dest = dying | grow_dest

    # opacity-proportional categorical sampling with replacement
    probs = jnp.where(healthy, opac, 0.0)
    logits = jnp.log(jnp.maximum(probs, 1e-30))
    sampled = jax.random.categorical(key, logits, shape=(N,))  # (N,) source ids

    # ratio = (#times source was sampled BY A REAL DEST) + 1
    counts = jnp.zeros((N,), jnp.int32).at[sampled].add(dest.astype(jnp.int32))
    ratios = counts + 1

    new_op, new_scales = compute_relocation(
        opac, jnp.exp(raw["log_scales"]), ratios)
    new_op = jnp.clip(new_op, min_opacity, 1.0 - 1e-7)

    # sources that fed >=1 destination get their own opacity/scale rescaled
    fed = counts > 0
    out = dict(raw)
    out["opacity_logits"] = jnp.where(
        fed, jnp.log(new_op / (1.0 - new_op)), raw["opacity_logits"])
    out["log_scales"] = jnp.where(
        fed[:, None], jnp.log(jnp.maximum(new_scales, 1e-12)), raw["log_scales"])

    # destinations copy their (already-rescaled) source rows
    src = sampled
    def place(x):
        m = dest.reshape((N,) + (1,) * (x.ndim - 1))
        return jnp.where(m, x[src], x)
    out["means"] = place(out["means"])
    out["quats"] = place(out["quats"])
    out["log_scales"] = place(out["log_scales"])
    out["opacity_logits"] = place(out["opacity_logits"])
    out["sh"] = place(out["sh"])
    out["alive"] = jnp.where(dest, 1.0, raw["alive"])
    return out


def inject_position_noise(raw: Dict, key, scaler: float) -> Dict:
    """Covariance-shaped exploration noise (reference ops.py:344-369):
    means += Sigma @ (randn * gate(1-opacity)) * scaler, gate = steep sigmoid
    around opacity ~ 0.005 so only near-dead splats wander."""
    from ..ops.projection import quat_scale_to_covar

    opac = jax.nn.sigmoid(raw["opacity_logits"])
    covars = quat_scale_to_covar(raw["quats"], jnp.exp(raw["log_scales"]))
    gate = jax.nn.sigmoid(100.0 * ((1.0 - opac) - 0.995))
    noise = (jax.random.normal(key, raw["means"].shape)
             * gate[:, None] * scaler * raw["alive"][:, None])
    noise = jnp.einsum("nij,nj->ni", covars, noise)
    out = dict(raw)
    out["means"] = raw["means"] + noise
    return out


class SelectiveAdamState(NamedTuple):
    mu: optax.Updates
    nu: optax.Updates


def selective_adam(learning_rate: float, b1: float = 0.9, b2: float = 0.999,
                   eps: float = 1e-8) -> optax.GradientTransformation:
    """Visibility-masked Adam (reference selective_adam.py / AdamCUDA.cu).

    A splat row is "visible" iff its gradient row is not identically zero
    (rasterization gives exactly-zero grads to splats outside every tile).
    Invisible rows keep their moments AND their parameter values — matching
    the CUDA kernel, which skips them entirely (no bias correction either).
    """

    def init_fn(params):
        z = jax.tree.map(jnp.zeros_like, params)
        return SelectiveAdamState(mu=z, nu=jax.tree.map(jnp.zeros_like, params))

    def update_fn(updates, state, params=None):
        def row_visible(g):
            axes = tuple(range(1, g.ndim))
            vis = jnp.any(g != 0.0, axis=axes) if g.ndim > 1 else (g != 0.0)
            return vis.reshape((-1,) + (1,) * (g.ndim - 1))

        vis = jax.tree.map(row_visible, updates)
        mu = jax.tree.map(lambda g, m, v: jnp.where(v, b1 * m + (1 - b1) * g, m),
                          updates, state.mu, vis)
        nu = jax.tree.map(lambda g, n, v: jnp.where(v, b2 * n + (1 - b2) * g * g, n),
                          updates, state.nu, vis)
        steps = jax.tree.map(
            lambda m, n, v: jnp.where(v, -learning_rate * m / (jnp.sqrt(n) + eps),
                                      0.0), mu, nu, vis)
        return steps, SelectiveAdamState(mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)
