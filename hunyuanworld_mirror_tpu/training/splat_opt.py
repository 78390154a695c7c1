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

from dataclasses import dataclass, field
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
    # camera pose optimization (reference simple_trainer_worldmirror.py
    # :177-183, 511-528: per-camera 9-dim delta = 3 translation + 6D rotation
    # applied as c2w @ T(delta), AdamW with exponential lr decay to 1% over
    # the run)
    pose_opt: bool = False
    pose_opt_lr: float = 1e-3
    pose_opt_reg: float = 1e-5
    # random background compositing to discourage transparency (reference
    # :143, :772-774: colors += bkgd * (1 - alpha), bkgd ~ U[0,1)^3 per step)
    random_bkgd: bool = False
    # depth supervision in disparity space (reference :202, :793-811 — the
    # reference samples sparse COLMAP points via grid_sample; our input path
    # carries dense depth from inference, so the L1 runs over valid pixels)
    depth_loss: bool = False
    depth_lambda: float = 1e-2
    # opacity / scale regularization (reference :817-820)
    opacity_reg: float = 0.0
    scale_reg: float = 0.0
    # bilateral-grid appearance compensation (reference :196-199, 556-566:
    # per-view 3x4 color-affine grids sliced by (x, y, gray), Adam 2e-3,
    # + 10x total-variation regularizer at :813)
    use_bilateral_grid: bool = False
    bilateral_grid_shape: Tuple[int, int, int] = (16, 16, 8)
    bilgrid_lr: float = 2e-3
    bilgrid_tv_mult: float = 10.0
    # TensorBoard logging (reference tb_every=100 / tb_save_image :206-209):
    # scalars every tb_every steps; rendered-vs-GT image pairs when
    # tb_save_image. Enabled by passing tb_logdir to optimize_splats.
    tb_every: int = 100
    tb_save_image: bool = False
    # in-loop held-out eval cadence (reference eval_steps loop,
    # simple_trainer_worldmirror.py:1005): every eval_every steps render the
    # eval views passed to optimize_splats(eval_data=...) and log PSNR/SSIM.
    # 0 = only whatever the caller does post-hoc.
    eval_every: int = 0
    # live-viewer snapshot cadence (training/live_viewer.py — the reference's
    # in-training viser loop :1310-1334); used when optimize_splats gets a
    # viewer. 0 disables snapshots even with a viewer attached.
    viewer_every: int = 200
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
    txs = {
        "means": make_adam(cfg.lr_means * scene_scale),
        "log_scales": make_adam(cfg.lr_scales),
        "quats": make_adam(cfg.lr_quats),
        "opacity_logits": make_adam(cfg.lr_opacities),
        "sh": make_adam(cfg.lr_sh),
        "alive": optax.set_to_zero(),
    }
    if cfg.pose_opt:
        # reference :515-519 + :667-671: AdamW(pose_opt_lr, wd pose_opt_reg)
        # with ExponentialLR gamma = 0.01^(1/max_steps)
        sched = optax.exponential_decay(cfg.pose_opt_lr, cfg.iters,
                                        decay_rate=0.01)
        txs["cam_deltas"] = optax.adamw(sched, weight_decay=cfg.pose_opt_reg)
    if cfg.use_bilateral_grid:
        txs["bil_grids"] = optax.adam(cfg.bilgrid_lr, eps=1e-15)
    return optax.multi_transform(txs, {k: k for k in txs})


def apply_cam_deltas(viewmats: jnp.ndarray, deltas: jnp.ndarray) -> jnp.ndarray:
    """Adjust (S, 4, 4) w2c by per-camera 9-dim deltas on the c2w side.

    Matches CameraOptModule.forward (gsplat examples/utils.py:28-48):
    c2w' = c2w @ [[rot6d(identity + drot), dx], [0, 1]].
    """
    from ..utils import rotation
    c2w = cam_utils.se3_inverse(viewmats)
    dx, drot = deltas[:, :3], deltas[:, 3:]
    ident = jnp.asarray([1.0, 0, 0, 0, 1.0, 0], deltas.dtype)
    R = rotation.rot6d_to_matrix(drot + ident)
    T = jnp.concatenate([
        jnp.concatenate([R, dx[:, :, None]], axis=-1),
        jnp.broadcast_to(jnp.asarray([[0.0, 0, 0, 1]], deltas.dtype),
                         (deltas.shape[0], 1, 4))], axis=1)
    return cam_utils.se3_inverse(c2w @ T)


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


def make_train_step(cfg: SplatOptConfig, tx, width: int, height: int,
                    scene_scale: float = 1.0):
    use_abs = cfg.resolved_signal() == "absgrad"

    def step(raw, opt_state, viewmats, Ks, gt_images, gt_depths=None,
             key=None):
        if cfg.depth_loss and gt_depths is None:
            raise ValueError("cfg.depth_loss needs gt_depths")
        if cfg.random_bkgd and key is None:
            key = jax.random.PRNGKey(0)
        tap = jnp.zeros((raw["means"].shape[0], 2), jnp.float32)

        def loss_fn(r, t):
            vm = viewmats
            if cfg.pose_opt:
                vm = apply_cam_deltas(viewmats, r["cam_deltas"])
            colors, alphas, meta = render_splats(
                r, vm, Ks, width, height, cfg,
                abs_tap=t if use_abs else None)
            rgb = colors[..., :3]
            if cfg.use_bilateral_grid:
                # appearance compensation BEFORE background compositing
                # (reference order :765 then :772)
                from . import bilagrid
                rgb = bilagrid.slice_image_grids(r["bil_grids"], rgb)
            if cfg.random_bkgd:
                # reference :772-774: composite over a random background so
                # transparency can't fake the photometric loss
                bkgd = jax.random.uniform(key, (1, 1, 1, 3))
                rgb = rgb + bkgd * (1.0 - alphas)
            loss = losses.photometric_loss(rgb, gt_images, cfg.ssim_lambda)
            if cfg.depth_loss:
                # disparity-space L1 (reference :793-811), dense variant:
                # our input path carries per-pixel depth from inference
                d = colors[..., 3]
                valid = (gt_depths > 1e-6) & (d > 1e-6)
                disp = jnp.where(d > 1e-6, 1.0 / jnp.maximum(d, 1e-6), 0.0)
                disp_gt = jnp.where(gt_depths > 1e-6,
                                    1.0 / jnp.maximum(gt_depths, 1e-6), 0.0)
                dl = (jnp.sum(jnp.abs(disp - disp_gt) * valid)
                      / jnp.maximum(jnp.sum(valid), 1.0)) * scene_scale
                loss = loss + dl * cfg.depth_lambda
            alive_f = r["alive"]
            n_alive = jnp.maximum(jnp.sum(alive_f), 1.0)
            if cfg.opacity_reg > 0.0:  # reference :817-818
                loss = loss + cfg.opacity_reg * jnp.sum(
                    jax.nn.sigmoid(r["opacity_logits"]) * alive_f) / n_alive
            if cfg.scale_reg > 0.0:  # reference :819-820
                loss = loss + cfg.scale_reg * jnp.sum(
                    jnp.exp(r["log_scales"]) * alive_f[:, None]) / (3 * n_alive)
            if cfg.use_bilateral_grid:  # reference :813 (10x TV loss)
                from . import bilagrid
                loss = loss + cfg.bilgrid_tv_mult * \
                    bilagrid.total_variation_loss(r["bil_grids"])
            return loss, meta

        (loss, meta), (grads, tap_grad) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(raw, tap)
        # Dead (padded) slots sit at the origin where the perspective divide
        # is singular — their grads are NaN by construction. They are not
        # parameters; zero their rows so the optimizer state stays clean
        # (selective Adam would otherwise mark NaN rows as "visible").
        alive_rows = raw["alive"] > 0.5
        grads = {
            k: (g if k in ("cam_deltas", "bil_grids") else jnp.where(
                alive_rows.reshape((-1,) + (1,) * (g.ndim - 1)), g, 0.0))
            for k, g in grads.items()}
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
    depths: Optional[np.ndarray] = None,  # (S, H, W) for cfg.depth_loss
    tb_logdir: Optional[str] = None,      # TensorBoard events (tb_writer.py)
    eval_data: Optional[Tuple] = None,    # (images, c2w, Ks) held-out views
                                          # for cfg.eval_every in-loop eval
    viewer=None,                          # live_viewer.LiveViewer (snapshots
                                          # every cfg.viewer_every steps)
) -> Dict[str, np.ndarray]:
    """Optimize a splat set against its source views; returns activated splats
    (+ "c2w_opt" refined cameras when cfg.pose_opt, + "eval_history" rows of
    (step, psnr, ssim) when in-loop eval ran)."""
    cfg = cfg or SplatOptConfig()
    S, H, W, _ = images.shape
    n = splats["means"].shape[0]
    capacity = int(n * cfg.capacity_factor)

    raw = _raw_from_splats({k: jnp.asarray(v) for k, v in splats.items()}, capacity)
    if cfg.pose_opt:
        raw["cam_deltas"] = jnp.zeros((S, 9), jnp.float32)  # zero_init
    if cfg.use_bilateral_grid:
        from . import bilagrid
        gx, gy, gw = cfg.bilateral_grid_shape
        raw["bil_grids"] = bilagrid.init_bilateral_grids(S, gx, gy, gw)
    scene_scale = float(np.linalg.norm(
        np.asarray(c2w)[:, :3, 3] - np.asarray(c2w)[:, :3, 3].mean(0), axis=-1).max() + 1e-6)

    tx = make_optimizer(cfg, scene_scale)
    opt_state = tx.init(raw)
    step_fn = make_train_step(cfg, tx, W, H, scene_scale)
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
    gt_depths = (jnp.asarray(depths) if depths is not None
                 else jnp.zeros((S, H, W), jnp.float32))

    tb = None
    if tb_logdir:
        from .tb_writer import TBWriter
        tb = TBWriter(tb_logdir)

    eval_history = []
    if eval_data is not None and cfg.eval_every > 0:
        ev_imgs, ev_c2w, ev_Ks = eval_data
        # eval renders reuse the TRAINING W,H render program — a mismatched
        # eval resolution would shape-crash or mis-score (advisor r4)
        ev_hw = np.asarray(ev_imgs).shape[1:3]
        if tuple(ev_hw) != (H, W):
            raise ValueError(
                f"eval_data resolution {tuple(ev_hw)} != training ({H}, {W});"
                " resize the held-out views to the training resolution")
        ev_vm = jnp.asarray(cam_utils.se3_inverse(jnp.asarray(ev_c2w)))
        ev_Ks_j = jnp.asarray(ev_Ks)

    def _alive_splats(r):
        means_, quats_, scales_, opac_, sh_ = _activate(r)
        alive_ = np.asarray(r["alive"] > 0.5)
        return {"means": np.asarray(means_)[alive_],
                "quats": np.asarray(quats_)[alive_],
                "scales": np.asarray(scales_)[alive_],
                "opacities": np.asarray(opac_)[alive_],
                "sh": np.asarray(sh_)[alive_]}

    key = jax.random.PRNGKey(seed)
    # gsplat DefaultStrategy accumulation: per-splat grad sums averaged over
    # the steps the splat was actually visible (strategy/default.py state
    # grad2d/count)
    grad_sum = jnp.zeros((capacity,))
    seen = jnp.zeros((capacity,))
    for it in range(cfg.iters):
        key, kstep = jax.random.split(key)
        raw, opt_state, loss, g2d = step_fn(raw, opt_state, viewmats, Ks_j,
                                            gt, gt_depths, kstep)
        grad_sum = grad_sum + g2d
        seen = seen + (g2d > 0)
        if (cfg.refine_start <= it < cfg.refine_stop
                and (it + 1) % cfg.refine_every == 0):
            key, sub = jax.random.split(key)
            raw = refine_fn(raw, grad_sum / jnp.maximum(seen, 1.0), sub)
            new_state = tx.init(raw)  # reset moments after topology change
            keep_states = [k for k in ("cam_deltas", "bil_grids")
                           if k in raw]
            if keep_states:
                # cameras/appearance grids didn't change topology: keep
                # their Adam moments and lr-schedule step (the reference
                # never resets these optimizers on densify)
                new_state = new_state._replace(inner_states={
                    **new_state.inner_states,
                    **{k: opt_state.inner_states[k] for k in keep_states}})
            opt_state = new_state
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
        if (eval_data is not None and cfg.eval_every > 0
                and (it + 1) % cfg.eval_every == 0):
            # in-loop held-out eval (reference eval_steps loop :1005)
            from ..utils.metrics import nvs_metrics
            img, _, _ = render_splats(raw, ev_vm, ev_Ks_j, W, H, cfg)
            m = nvs_metrics(np.clip(np.asarray(img[..., :3]), 0, 1),
                            np.asarray(ev_imgs))
            eval_history.append((it + 1, float(m["psnr"]), float(m["ssim"])))
            log_fn(f"splat-opt eval @{it + 1}: PSNR {m['psnr']:.2f} "
                   f"SSIM {m['ssim']:.4f} ({len(ev_imgs)} held-out views)")
            if tb is not None:
                tb.scalars({"eval/psnr": float(m["psnr"]),
                            "eval/ssim": float(m["ssim"])}, it + 1)
                tb.flush()
        if (viewer is not None and cfg.viewer_every > 0
                and ((it + 1) % cfg.viewer_every == 0
                     or it == cfg.iters - 1)):
            viewer.update(_alive_splats(raw), it + 1, float(loss))
        if tb is not None and (it + 1) % max(cfg.tb_every, 1) == 0:
            tb.scalars({"train/loss": float(loss),
                        "train/num_GS": float(jnp.sum(raw["alive"] > 0.5))},
                       it + 1)
            if cfg.tb_save_image:
                # rendered view 0 vs GT side by side (reference :206-209)
                img, _, _ = render_splats(raw, viewmats[:1], Ks_j[:1],
                                          W, H, cfg)
                pair = np.concatenate([
                    np.clip(np.asarray(img[0, ..., :3]), 0, 1),
                    np.asarray(gt[0])], axis=1)
                tb.image("train/render_vs_gt", pair, it + 1)
            tb.flush()

    means, quats, scales, opac, sh = _activate(raw)
    alive = np.asarray(raw["alive"] > 0.5)
    out = {"means": np.asarray(means)[alive], "quats": np.asarray(quats)[alive],
           "scales": np.asarray(scales)[alive],
           "opacities": np.asarray(opac)[alive], "sh": np.asarray(sh)[alive]}
    if cfg.pose_opt:
        vm_opt = apply_cam_deltas(viewmats, raw["cam_deltas"])
        out["c2w_opt"] = np.asarray(cam_utils.se3_inverse(vm_opt))
    if eval_history:
        out["eval_history"] = np.asarray(eval_history, np.float64)
    return out
