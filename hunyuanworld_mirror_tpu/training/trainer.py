"""Training loop for the CenterSnap 6D-pose workload.

Behavioral parity: reference train.py:152-356 — AdamW(5e-5, wd 0.05) + cosine
schedule, WDS-shard streaming, per-epoch test pass, checkpoint every 2 epochs.
Additions over the reference (SURVEY.md §5.3-5.4 gaps): resume from
checkpoint (params + optimizer + step) and jit-compiled train/eval steps.
"""

import time
from dataclasses import dataclass, field
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import centersnap, panoptic
from ..utils import priors as prior_utils
from . import checkpoint as ckpt_lib
from . import losses

# ImageNet stats: the panoptic baseline consumes pre-normalized RGB
# (reference train_centersnap_panoptic.py:118-123 un-normalizes for vis)
_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


@dataclass
class TrainConfig:
    train_shards: str = ""
    test_shards: str = ""
    batch_size: int = 20
    epochs: int = 10
    lr: float = 5e-5
    weight_decay: float = 0.05
    steps_per_epoch: int = 18000  # cosine horizon (reference train.py:178)
    log_every: int = 100
    # image-grid / bbox-overlay logging cadence (reference train.py:244-282
    # logs visualizations every 14000 steps); 0 disables
    vis_every: int = 14000
    ckpt_every_epochs: int = 2
    ckpt_path: str = "checkpoints/centersnap.npz"
    resume: Optional[str] = None
    seed: int = 0
    # "transformer" = WorldMirrorCenterSnap (reference train.py); "res_fpn" =
    # the ResNet-FPN panoptic baseline (reference train_centersnap_panoptic.py)
    arch: str = "transformer"
    model: Any = field(default_factory=centersnap.CenterSnapConfig)


def model_init(cfg: TrainConfig, key):
    if cfg.arch == "res_fpn":
        return panoptic.init(key, cfg.model)
    return centersnap.init(key, cfg.model)


def model_forward(cfg: TrainConfig, params, batch: Dict):
    if cfg.arch == "res_fpn":
        return panoptic.forward(params, cfg.model, batch["rgb"], batch["depth"])
    return centersnap.forward(params, cfg.model, batch["rgb"],
                              batch.get("depth"))


def make_optimizer(cfg: TrainConfig):
    schedule = optax.cosine_decay_schedule(
        cfg.lr, decay_steps=cfg.epochs * cfg.steps_per_epoch)
    return optax.adamw(schedule, weight_decay=cfg.weight_decay)


def make_train_step(cfg: TrainConfig, tx):
    def train_step(params, opt_state, batch):
        def loss_fn(p):
            preds = model_forward(cfg, p, batch)
            return losses.centersnap_loss(preds, batch)

        (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, logs

    return jax.jit(train_step)


def make_eval_step(cfg: TrainConfig):
    def eval_step(params, batch):
        preds = model_forward(cfg, params, batch)
        return losses.centersnap_loss(preds, batch)

    return jax.jit(eval_step)


def _prepare_batch(cfg: TrainConfig, batch: Dict[str, np.ndarray]) -> Dict:
    out = {"rgb": jnp.asarray(batch["rgb"]),
           "heatmap": jnp.asarray(batch["heatmap"]),
           "pose_map": jnp.asarray(batch["pose_map"])}
    if cfg.arch == "res_fpn":
        out["rgb"] = (out["rgb"] - _IMAGENET_MEAN) / _IMAGENET_STD
    if "depth" in batch:
        out["depth"] = prior_utils.normalize_depth_fixed(jnp.asarray(batch["depth"]))
    elif cfg.arch == "res_fpn":
        out["depth"] = jnp.zeros(out["rgb"].shape[:3], out["rgb"].dtype)
    # pose maps stored channel-first by the preprocessing (reference
    # preprocessing/utils.py) -> NHWC
    if out["pose_map"].ndim == 4 and out["pose_map"].shape[1] == 12:
        out["pose_map"] = jnp.transpose(out["pose_map"], (0, 2, 3, 1))
    return out


def train(cfg: TrainConfig, log_fn=print, tb_logdir=None):
    """Run the fork-workload training loop.

    `tb_logdir`: optional directory — scalar losses are then also written in
    TensorBoard event format (training/tb_writer.py, the reference's wandb /
    tensorboard logging equivalent, reference train.py:154).
    """
    from .data import ShardedLoader

    tb = None
    if tb_logdir:
        from .tb_writer import TBWriter
        tb = TBWriter(tb_logdir)

    key = jax.random.PRNGKey(cfg.seed)
    params = model_init(cfg, key)
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)
    step = 0

    if cfg.resume:
        params, step_loaded = ckpt_lib.load_train_state(cfg.resume)
        restored = ckpt_lib.restore_opt_state(cfg.resume, opt_state)
        if restored is not None:
            opt_state = restored
        step = step_loaded or 0
        log_fn(f"resumed from {cfg.resume} at step {step}")

    train_step = make_train_step(cfg, tx)
    eval_step = make_eval_step(cfg)

    loader = ShardedLoader(cfg.train_shards, batch_size=cfg.batch_size,
                           seed=cfg.seed)
    test_loader = (ShardedLoader(cfg.test_shards, batch_size=cfg.batch_size,
                                 shuffle_buffer=1, seed=cfg.seed)
                   if cfg.test_shards else None)

    start_epoch = step // max(cfg.steps_per_epoch, 1)
    for epoch in range(start_epoch, cfg.epochs):
        t0 = time.time()
        for batch in loader.epoch(epoch):
            batch = _prepare_batch(cfg, batch)
            params, opt_state, loss, logs = train_step(params, opt_state, batch)
            step += 1
            if step % cfg.log_every == 0:
                log_fn(f"epoch {epoch} step {step}: loss={float(loss):.4f} "
                       + " ".join(f"{k}={float(v):.4f}" for k, v in logs.items()))
                if tb is not None:
                    tb.scalars({"loss/train": float(loss),
                                **{f"loss/{k}": float(v)
                                   for k, v in logs.items()}}, step)
                    tb.flush()
            if (tb is not None and cfg.vis_every
                    and step % cfg.vis_every == 0):
                # GT-vs-pred heatmap grids + 3D bbox overlays at the
                # reference's cadence (train.py:244-282)
                from . import visualize as vz
                preds = jax.tree.map(np.asarray,
                                     model_forward(cfg, params, batch))
                for tag, img in vz.training_visuals(batch, preds).items():
                    tb.image(tag, img, step)
                tb.flush()

        if test_loader is not None:
            tot, n = 0.0, 0
            for batch in test_loader.epoch(0):
                batch = _prepare_batch(cfg, batch)
                loss, _ = eval_step(params, batch)
                tot += float(loss)
                n += 1
            log_fn(f"epoch {epoch}: test loss {tot / max(n, 1):.4f} "
                   f"({time.time() - t0:.0f}s)")
            if tb is not None:
                tb.scalars({"loss/test": tot / max(n, 1)}, step)
                tb.flush()

        if (epoch + 1) % cfg.ckpt_every_epochs == 0:
            ckpt_lib.save_params(cfg.ckpt_path, params, step=step,
                                 opt_state=opt_state)
            log_fn(f"saved checkpoint -> {cfg.ckpt_path}")

    ckpt_lib.save_params(cfg.ckpt_path, params, step=step, opt_state=opt_state)
    if tb is not None:
        tb.close()
    return params
