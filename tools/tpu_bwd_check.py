"""Real-TPU check: flat Pallas rasterizer forward+backward vs the jax path.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/tpu_bwd_check.py
        [n_splats] [img_size]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from hunyuanworld_mirror_tpu.ops import tiles
from hunyuanworld_mirror_tpu.ops.rasterizer import rasterize_binned_jax
from hunyuanworld_mirror_tpu.ops.rasterizer_pallas import rasterize_flat_pallas

TPG, MPT, TILE = 9, 1024, 16


def make_scene(n, w, h, seed=0):
    rng = np.random.default_rng(seed)
    means2d = jnp.asarray(rng.uniform([0, 0], [w, h], size=(n, 2)), jnp.float32)
    scale = rng.uniform(2.0, 12.0, size=(n, 2))
    theta = rng.uniform(0, np.pi, size=n)
    c, s = np.cos(theta), np.sin(theta)
    a = c * c * scale[:, 0] ** 2 + s * s * scale[:, 1] ** 2
    b = c * s * (scale[:, 0] ** 2 - scale[:, 1] ** 2)
    d = s * s * scale[:, 0] ** 2 + c * c * scale[:, 1] ** 2
    det = a * d - b * b
    conics = jnp.asarray(np.stack([d / det, -b / det, a / det], -1), jnp.float32)
    colors = jnp.asarray(rng.uniform(size=(n, 3)), jnp.float32)
    opac = jnp.asarray(rng.uniform(0.2, 0.95, size=n), jnp.float32)
    radii = jnp.asarray(np.maximum(scale * 3, 1).astype(np.int32))
    depths = jnp.asarray(rng.uniform(0.5, 10.0, size=n), jnp.float32)
    return means2d, conics, colors, opac, radii, depths


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    w = h = int(sys.argv[2]) if len(sys.argv) > 2 else 518
    means2d, conics, colors, opac, radii, depths = make_scene(n, w, h)
    tw, th = -(-w // TILE), -(-h // TILE)

    def loss_pallas(m, c, col, op, tap):
        img, a, _ = rasterize_flat_pallas(m, c, col, op, radii, depths, tap,
                                          w, h, TILE, TPG, MPT)
        return jnp.sum(img * img) + jnp.sum(a), (img, a)

    def loss_jax(m, c, col, op, tap):
        bins = tiles.bin_gaussians(m, radii, depths, TILE, tw, th, TPG, MPT)
        img, a = rasterize_binned_jax(m, c, col, op, bins, w, h, TILE)
        return jnp.sum(img * img) + jnp.sum(a), (img, a)

    tap = jnp.zeros((n, 2), jnp.float32)

    results = {}
    for name, f in (("pallas", loss_pallas), ("jax", loss_jax)):
        g = jax.jit(jax.grad(f, argnums=(0, 1, 2, 3, 4), has_aux=True))
        grads, aux = g(means2d, conics, colors, opac, tap)
        np.asarray(grads[0])  # sync through the relay
        t0 = time.perf_counter()
        for _ in range(3):
            grads, aux = g(means2d, conics, colors, opac, tap)
            np.asarray(grads[0])
        dt = (time.perf_counter() - t0) / 3
        results[name] = ([np.asarray(x) for x in grads],
                         [np.asarray(x) for x in aux], dt)
        print(f"{name:6s} bwd+fwd {1e3*dt:7.1f} ms", flush=True)

    gp, auxp, _ = results["pallas"]
    gj, auxj, _ = results["jax"]
    ok = True
    for nm, a, b in zip(["means2d", "conics", "colors", "opac"], gp[:4], gj[:4]):
        ref = np.abs(b).max() + 1e-8
        err = np.abs(a - b).max() / ref
        print(f"grad {nm:8s} rel err {err:.2e}")
        ok &= err < 1e-4
    print(f"absgrad nonzero entries: {np.count_nonzero(gp[4])}, "
          f"max {np.abs(gp[4]).max():.3e}  (jax path tap grad is zero by "
          f"construction: {np.abs(gj[4]).max():.1e})")
    ok &= np.count_nonzero(gp[4]) > 0
    for nm, a, b in zip(["img", "alpha"], auxp, auxj):
        err = np.abs(a - b).max()
        print(f"fwd  {nm:8s} abs err {err:.2e}")
        ok &= err < 1e-3
    print("OK" if ok else "MISMATCH")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
