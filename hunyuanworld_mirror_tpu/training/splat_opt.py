"""Post-inference 3DGS optimization (gsplat example-trainer equivalent).

Behavioral parity: reference submodules/gsplat/examples/simple_trainer_worldmirror.py
:647-1005 — initialize splats from WorldMirror's gaussians + COLMAP cameras,
optimize against the input views with (1-l)*L1 + l*(1-SSIM), per-param LRs
(means 1.6e-4 * scene scale, scales 5e-3, quats 1e-3, opacities 5e-2, sh 2.5e-3),
plus a DefaultStrategy-style densify/prune schedule.

TPU re-design: splats live in a FIXED-capacity array with an alive mask.
Densification clones high-gradient splats into free slots (split = clone +
scale shrink), pruning deadens low-opacity slots — all static-shape scatter
ops inside jit. The rasterizer is this framework's Pallas/JAX tile pipeline.
"""

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops import rasterizer
from ..utils import camera as cam_utils
from . import losses


@dataclass
class SplatOptConfig:
    iters: int = 1000
    ssim_lambda: float = 0.2
    capacity_factor: float = 2.0      # free slots for densification
    refine_every: int = 100
    refine_start: int = 100
    refine_stop: int = 700
    grow_grad2d: float = 0.0002       # gsplat DefaultStrategy threshold
    grow_scale3d: float = 0.01        # split-vs-duplicate scale boundary
    prune_opacity: float = 0.005
    reset_opacity_every: int = 3000
    lr_means: float = 1.6e-4
    lr_scales: float = 5e-3
    lr_quats: float = 1e-3
    lr_opacities: float = 5e-2
    lr_sh: float = 2.5e-3
    tile_size: int = 16
    max_per_tile: int = 4096
    rasterizer_impl: str = "jax"
    # strategy: "default" (grad-threshold grow/prune, gsplat DefaultStrategy)
    # or "mcmc" (teleport + 5%-growth + position noise, gsplat MCMCStrategy /
    # arXiv:2404.09591) — see training/mcmc.py.
    strategy: str = "default"
    noise_lr: float = 5e5          # MCMC noise scale (reference mcmc.py:50)
    min_opacity: float = 0.005
    # visibility-masked Adam (gsplat SelectiveAdam / AdamCUDA.cu)
    use_selective_adam: bool = False
    # "3dgs" (EWA splats, reference default) or "2dgs" (surfels, reference
    # RasterizeToPixels2DGS*.cu via ops/gs2d.py — renders RGB+ED+normals,
    # only the RGB channels drive the photometric loss)
    mode: str = "3dgs"
    # densification signal (gsplat strategy/default.py:12 semantics):
    #   "absgrad" — per-splat screen-space SUM of |dL/d means2d| from the
    #               Pallas backward's AbsGS tap (gsplat absgrad=True), scaled
    #               to half-image units like gsplat's threshold expects;
    #   "mean3d"  — norm of the world-space mean gradient (works on every
    #               impl/backend);
    #   "auto"    — absgrad when the Pallas path computes it (impl="pallas"
    #               on TPU), else mean3d.
    densify_signal: str = "auto"

    def resolved_signal(self) -> str:
        if self.densify_signal != "auto":
            return self.densify_signal
        return ("absgrad" if (self.rasterizer_impl == "pallas"
                              and self.mode == "3dgs"
                              and jax.default_backend() == "tpu")
                else "mean3d")


def _raw_from_splats(splats: Dict[str, jnp.ndarray], capacity: int) -> Dict:
    """Activated splats -> raw (pre-activation) optimization params, padded to
    `capacity` with dead slots."""
    n = splats["means"].shape[0]
    pad = capacity - n

    def padded(x, fill=0.0):
        return jnp.concatenate(
            [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)]) if pad else x

    op = jnp.clip(splats["opacities"], 1e-5, 1 - 1e-5)
    return {
        "means": padded(splats["means"]),
        "log_scales": padded(jnp.log(jnp.maximum(splats["scales"], 1e-10)), -10.0),
        "quats": padded(splats["quats"]).at[n:, 0].set(1.0) if pad else padded(splats["quats"]),
        "opacity_logits": padded(jnp.log(op / (1 - op)), -15.0),
        "sh": padded(splats["sh"]),
        "alive": padded(jnp.ones((n,), jnp.float32)),
    }


def _activate(raw: Dict) -> Tuple[jnp.ndarray, ...]:
    alive = raw["alive"] > 0.5
    means = raw["means"]
    scales = jnp.exp(raw["log_scales"])
    quats = raw["quats"]
    opac = jax.nn.sigmoid(raw["opacity_logits"]) * raw["alive"]
    return means, quats, scales, opac, raw["sh"]


def make_optimizer(cfg: SplatOptConfig, scene_scale: float = 1.0):
    if cfg.use_selective_adam:
        from .mcmc import selective_adam as make_adam
    else:
        make_adam = optax.adam
    return optax.multi_transform(
        {
            "means": make_adam(cfg.lr_means * scene_scale),
            "log_scales": make_adam(cfg.lr_scales),
            "quats": make_adam(cfg.lr_quats),
            "opacity_logits": make_adam(cfg.lr_opacities),
            "sh": make_adam(cfg.lr_sh),
            "alive": optax.set_to_zero(),
        },
        {k: k for k in ("means", "log_scales", "quats", "opacity_logits",
                        "sh", "alive")})


def render_splats(raw: Dict, viewmats: jnp.ndarray, Ks: jnp.ndarray,
                  width: int, height: int, cfg: SplatOptConfig,
                  abs_tap: Optional[jnp.ndarray] = None):
    means, quats, scales, opac, sh = _activate(raw)
    if cfg.mode == "2dgs":
        from ..ops.gs2d import rasterize_2dgs
        colors, alphas, normals = rasterize_2dgs(
            means, quats, scales, opac, sh, viewmats, Ks, width, height,
            tile_size=cfg.tile_size, render_mode="RGB+ED",
            max_per_tile=cfg.max_per_tile, quat_order="wxyz",
            sh_degree=int(sh.shape[-2] ** 0.5) - 1)
        return colors, alphas, {"normals": normals}
    colors, alphas, meta = rasterizer.rasterize(
        means, quats, scales, opac, sh, viewmats, Ks, width, height,
        tile_size=cfg.tile_size, render_mode="RGB+ED",
        max_per_tile=cfg.max_per_tile, impl=cfg.rasterizer_impl,
        quat_order="wxyz", abs_tap=abs_tap)
    return colors, alphas, meta


def make_train_step(cfg: SplatOptConfig, tx, width: int, height: int):
    use_abs = cfg.resolved_signal() == "absgrad"

    def step(raw, opt_state, viewmats, Ks, gt_images):
        tap = jnp.zeros((raw["means"].shape[0], 2), jnp.float32)

        def loss_fn(r, t):
            colors, _, meta = render_splats(r, viewmats, Ks, width, height,
                                            cfg, abs_tap=t if use_abs else None)
            rgb = colors[..., :3]
            loss = losses.photometric_loss(rgb, gt_images, cfg.ssim_lambda)
            return loss, meta

        (loss, meta), (grads, tap_grad) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(raw, tap)
        # Dead (padded) slots sit at the origin where the perspective divide
        # is singular — their grads are NaN by construction. They are not
        # parameters; zero their rows so the optimizer state stays clean
        # (selective Adam would otherwise mark NaN rows as "visible").
        alive_rows = raw["alive"] > 0.5
        grads = jax.tree.map(
            lambda g: jnp.where(
                alive_rows.reshape((-1,) + (1,) * (g.ndim - 1)), g, 0.0),
            grads)
        if use_abs:
            # AbsGS screen-space signal in gsplat's units: pixel-space
            # |dL/dmean2d| scaled by half the image size
            # (gsplat strategy/default.py: grads *= [W/2, H/2])
            scale = jnp.asarray([width * 0.5, height * 0.5], jnp.float32)
            g2d = jnp.linalg.norm(tap_grad * scale, axis=-1)
            g2d = jnp.where(alive_rows, g2d, 0.0)
        else:
            # world-space fallback (every impl/backend)
            g2d = jnp.linalg.norm(grads["means"], axis=-1)
        updates, opt_state = tx.update(grads, opt_state, raw)
        raw = optax.apply_updates(raw, updates)
        return raw, opt_state, loss, g2d

    return jax.jit(step)


def refine(raw: Dict, grad_accum: jnp.ndarray, cfg: SplatOptConfig,
           key) -> Dict:
    """DefaultStrategy-style grow/prune on the fixed-capacity array.

    duplicate: high 2D-grad & small scale -> clone into a free slot
    split:     high 2D-grad & large scale -> clone with scales/1.6 + jitter
    prune:     opacity below threshold -> deaden slot
    """
    means, quats, scales, opac, sh = _activate(raw)
    alive = raw["alive"] > 0.5
    N = means.shape[0]

    max_scale = jnp.max(scales, axis=-1)
    high_grad = (grad_accum > cfg.grow_grad2d) & alive
    is_split = high_grad & (max_scale > cfg.grow_scale3d)

    # prune low-opacity
    keep = alive & (opac > cfg.prune_opacity)
    raw = dict(raw)
    raw["alive"] = keep.astype(jnp.float32)

    # free slots (dead), candidates to grow (by grad desc)
    free_rank = jnp.argsort(raw["alive"])          # dead slots first
    grow_score = jnp.where(high_grad & keep, grad_accum, -jnp.inf)
    grow_rank = jnp.argsort(-grow_score)           # best candidates first

    n_free = jnp.sum(raw["alive"] < 0.5)
    n_grow = jnp.sum(jnp.isfinite(grow_score) & (grow_score > 0))
    n_clone = jnp.minimum(n_free, n_grow)

    slot_idx = free_rank                            # (N,) target slots
    src_idx = grow_rank                             # (N,) sources
    do = (jnp.arange(N) < n_clone)

    jitter = jax.random.normal(key, (N, 3)) * scales[src_idx] * 0.5
    split_src = is_split[src_idx]
    new_means = means[src_idx] + jnp.where(split_src[:, None], jitter, 0.0)
    new_logs = jnp.where(split_src[:, None],
                         raw["log_scales"][src_idx] - jnp.log(1.6),
                         raw["log_scales"][src_idx])

    def scatter(arr, new_vals):
        return arr.at[slot_idx].set(
            jnp.where(do[:, None] if new_vals.ndim > 1 else do,
                      new_vals, arr[slot_idx]))

    raw["means"] = scatter(raw["means"], new_means)
    raw["log_scales"] = scatter(raw["log_scales"], new_logs)
    raw["quats"] = scatter(raw["quats"], raw["quats"][src_idx])
    raw["opacity_logits"] = scatter(raw["opacity_logits"],
                                    raw["opacity_logits"][src_idx])
    sh_flat = raw["sh"].reshape(N, -1)
    raw["sh"] = scatter(raw["sh"].reshape(N, -1),
                        sh_flat[src_idx]).reshape(raw["sh"].shape)
    raw["alive"] = raw["alive"].at[slot_idx].set(
        jnp.where(do, 1.0, raw["alive"][slot_idx]))
    # the split source also shrinks
    shrink = jnp.where(is_split, raw["log_scales"][:, 0] * 0 - jnp.log(1.6), 0.0)
    raw["log_scales"] = raw["log_scales"] + shrink[:, None]
    return raw


def optimize_splats(
    splats: Dict[str, np.ndarray],      # from predictions["splats"][b]
    images: np.ndarray,                 # (S, H, W, 3) gt views
    c2w: np.ndarray,                    # (S, 4, 4)
    Ks: np.ndarray,                     # (S, 3, 3)
    cfg: Optional[SplatOptConfig] = None,
    seed: int = 0,
    log_fn=print,
) -> Dict[str, np.ndarray]:
    """Optimize a splat set against its source views; returns activated splats."""
    cfg = cfg or SplatOptConfig()
    S, H, W, _ = images.shape
    n = splats["means"].shape[0]
    capacity = int(n * cfg.capacity_factor)

    raw = _raw_from_splats({k: jnp.asarray(v) for k, v in splats.items()}, capacity)
    scene_scale = float(np.linalg.norm(
        np.asarray(c2w)[:, :3, 3] - np.asarray(c2w)[:, :3, 3].mean(0), axis=-1).max() + 1e-6)

    tx = make_optimizer(cfg, scene_scale)
    opt_state = tx.init(raw)
    step_fn = make_train_step(cfg, tx, W, H)
    if cfg.strategy == "mcmc":
        from . import mcmc as mcmc_lib
        refine_fn = jax.jit(lambda r, g, k: mcmc_lib.mcmc_refine(
            r, k, min_opacity=cfg.min_opacity))
        noise_scaler = cfg.lr_means * scene_scale * cfg.noise_lr
        noise_fn = jax.jit(lambda r, k: mcmc_lib.inject_position_noise(
            r, k, noise_scaler))
    else:
        refine_fn = jax.jit(lambda r, g, k: refine(r, g, cfg, k))
        noise_fn = None

    viewmats = jnp.asarray(cam_utils.se3_inverse(jnp.asarray(c2w)))
    Ks_j = jnp.asarray(Ks)
    gt = jnp.asarray(images)

    key = jax.random.PRNGKey(seed)
    # gsplat DefaultStrategy accumulation: per-splat grad sums averaged over
    # the steps the splat was actually visible (strategy/default.py state
    # grad2d/count)
    grad_sum = jnp.zeros((capacity,))
    seen = jnp.zeros((capacity,))
    for it in range(cfg.iters):
        raw, opt_state, loss, g2d = step_fn(raw, opt_state, viewmats, Ks_j, gt)
        grad_sum = grad_sum + g2d
        seen = seen + (g2d > 0)
        if (cfg.refine_start <= it < cfg.refine_stop
                and (it + 1) % cfg.refine_every == 0):
            key, sub = jax.random.split(key)
            raw = refine_fn(raw, grad_sum / jnp.maximum(seen, 1.0), sub)
            opt_state = tx.init(raw)  # reset moments after topology change
            grad_sum = jnp.zeros((capacity,))
            seen = jnp.zeros((capacity,))
        if noise_fn is not None:
            # MCMC: exploration noise after every optimizer step
            # (reference mcmc.py:141-145)
            key, sub = jax.random.split(key)
            raw = noise_fn(raw, sub)
        if (it + 1) % 100 == 0:
            log_fn(f"splat-opt iter {it + 1}: loss {float(loss):.4f} "
                   f"alive {int(jnp.sum(raw['alive'] > 0.5))}")

    means, quats, scales, opac, sh = _activate(raw)
    alive = np.asarray(raw["alive"] > 0.5)
    return {"means": np.asarray(means)[alive], "quats": np.asarray(quats)[alive],
            "scales": np.asarray(scales)[alive],
            "opacities": np.asarray(opac)[alive], "sh": np.asarray(sh)[alive]}
