"""Real-TPU A/B: post-opt splat trainer with impl=pallas vs impl=jax.

Builds a synthetic scene (GT images rendered from a dense splat cloud),
initializes from a perturbed/sparser cloud, optimizes with each rasterizer
impl, and reports per-iter ms + the loss curve. The pallas run uses the
AbsGS densification signal (resolved automatically on TPU), the jax run the
world-space mean-grad norm.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/splat_ab.py
        [--iters 300] [--n 20000] [--img 256]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from hunyuanworld_mirror_tpu.ops import rasterizer
from hunyuanworld_mirror_tpu.training import splat_opt


def make_gt(n, img, seed=0):
    """Random cloud in a unit box viewed by 4 cameras on a circle."""
    rng = np.random.default_rng(seed)
    means = rng.uniform(-0.5, 0.5, size=(n, 3))
    quats = rng.normal(size=(n, 4))
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    scales = rng.uniform(0.004, 0.02, size=(n, 3))
    opac = rng.uniform(0.4, 0.95, size=n)
    sh = rng.uniform(0, 1, size=(n, 1, 3))  # deg-0 SH (raw RGB-ish)

    views, Ks = [], []
    f = img * 1.2
    for ang in np.linspace(0, 2 * np.pi, 4, endpoint=False):
        c, s = np.cos(ang), np.sin(ang)
        # camera at radius 2 looking at origin
        pos = np.array([2 * s, 0.0, 2 * c])
        fwd = -pos / np.linalg.norm(pos)
        up = np.array([0.0, -1.0, 0.0])
        right = np.cross(fwd, up)
        right /= np.linalg.norm(right)
        upv = np.cross(fwd, right)
        R = np.stack([right, upv, fwd], 0)  # world->cam rows
        t = -R @ pos
        w2c = np.eye(4)
        w2c[:3, :3] = R
        w2c[:3, 3] = t
        views.append(w2c)
        Ks.append(np.array([[f, 0, img / 2], [0, f, img / 2], [0, 0, 1.0]]))
    viewmats = np.stack(views).astype(np.float32)
    Ks = np.stack(Ks).astype(np.float32)

    colors, alphas, _ = rasterizer.rasterize(
        jnp.asarray(means, jnp.float32), jnp.asarray(quats, jnp.float32),
        jnp.asarray(scales, jnp.float32), jnp.asarray(opac, jnp.float32),
        jnp.asarray(sh, jnp.float32), jnp.asarray(viewmats), jnp.asarray(Ks),
        img, img, render_mode="RGB", impl="jax", quat_order="wxyz")
    gt = np.asarray(colors[..., :3])

    # init: subsample half the splats, jitter positions
    m = n // 2
    idx = rng.choice(n, m, replace=False)
    splats = {
        "means": (means[idx] + rng.normal(0, 0.01, size=(m, 3))).astype(np.float32),
        "quats": quats[idx].astype(np.float32),
        "scales": (scales[idx] * 1.5).astype(np.float32),
        "opacities": (opac[idx] * 0.7).astype(np.float32),
        "sh": sh[idx].astype(np.float32),
    }
    c2w = np.linalg.inv(viewmats)
    return splats, gt, c2w, Ks


def run(impl, splats, gt, c2w, Ks, iters):
    cfg = splat_opt.SplatOptConfig(
        iters=iters, rasterizer_impl=impl, refine_every=50, refine_start=50,
        refine_stop=iters - 50, max_per_tile=1024)
    log = []
    t0 = time.perf_counter()
    out = splat_opt.optimize_splats(
        splats, gt, c2w, Ks, cfg, log_fn=lambda s: log.append(s))
    dt = time.perf_counter() - t0
    sig = cfg.resolved_signal()
    return out, log, dt, sig


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--n", type=int, default=20000)
    ap.add_argument("--img", type=int, default=256)
    args = ap.parse_args()

    splats, gt, c2w, Ks = make_gt(args.n, args.img)
    print(f"scene: {args.n} GT splats, init {splats['means'].shape[0]}, "
          f"4 views {args.img}px", flush=True)

    for impl in ("pallas", "jax"):
        try:
            out, log, dt, sig = run(impl, splats, gt, c2w, Ks, args.iters)
        except Exception as e:
            msg = str(e).splitlines()[0][:160]
            print(f"impl={impl} FAILED: {type(e).__name__}: {msg}", flush=True)
            continue
        print(f"impl={impl} signal={sig} total {dt:.1f}s "
              f"({1e3 * dt / args.iters:.1f} ms/iter incl. refine/compile) "
              f"final {out['means'].shape[0]} splats", flush=True)
        for ln in log:
            print(f"  {ln}", flush=True)


if __name__ == "__main__":
    main()
