"""Measure tile-intersection counts under binning variants (VERDICT r4 #3).

Runs the model forward at S views, takes the compacted splats + predicted
cameras, projects them per camera, and reports for each camera:

  aabb        intersections from the shipped 3.33-sigma AABB boxes
  tight       after opacity-tight radii (tiles.opacity_tight_radii — EXACT)
  ellipse     after additionally dropping box cells whose tile rect lies
              entirely outside the splat's alpha>=1/255 conic level set
              (exact rect-vs-ellipse min test — also EXACT semantics)

plus the per-slot coverage histogram that sizes AUTO_SLOT_FRACS.

Usage: python tools/isect_stats.py [--views 4] [--img 518]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def rect_sigma_min(u, v, a, b, c, x0, x1, y0, y1):
    """Min of sigma(d) = 0.5(a dx^2 + c dy^2) + b dx dy over the rect
    [x0,x1]x[y0,y1], exactly (convex quadratic: interior or edge minima).

    All args (N,) planes; rect bounds per-splat arrays or scalars."""
    inside = (u >= x0) & (u <= x1) & (v >= y0) & (v <= y1)

    def edge_x(xe):  # vertical edge x = xe, y in [y0, y1]
        dx = xe - u
        t = np.clip(-b * dx / np.maximum(c, 1e-12), y0 - v, y1 - v)
        return 0.5 * (a * dx * dx + c * t * t) + b * dx * t

    def edge_y(ye):  # horizontal edge y = ye
        dy = ye - v
        t = np.clip(-b * dy / np.maximum(a, 1e-12), x0 - u, x1 - u)
        return 0.5 * (a * t * t + c * dy * dy) + b * t * dy

    m = np.minimum(np.minimum(edge_x(x0), edge_x(x1)),
                   np.minimum(edge_y(y0), edge_y(y1)))
    return np.where(inside, 0.0, m)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=4)
    ap.add_argument("--img", type=int, default=518)
    ap.add_argument("--tile", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import bench
    from hunyuanworld_mirror_tpu.models import gaussians, worldmirror
    from hunyuanworld_mirror_tpu.ops import projection, tiles
    from hunyuanworld_mirror_tpu.utils import camera as cam_utils

    S, img, ts = args.views, args.img, args.tile
    fwd, params, views, cfg = bench.build(S, img, render=False)
    preds = fwd(params, views)
    splats = preds["splats"]
    W = H = img
    tw = th = -(-img // ts)

    ext, intr = cam_utils.vector_to_camera_matrices(
        preds["camera_params"].reshape(S, 9), (H, W))
    w2c = np.asarray(cam_utils.to_homogeneous(ext))
    Ks = np.asarray(intr)

    means = splats["means"][0]
    quats = splats["quats"][0][..., jnp.array([1, 2, 3, 0])]
    scales = splats["scales"][0]
    op_raw = np.asarray(splats["opacities"][0])
    covars = projection.quat_scale_to_covar_planes(quats, scales)

    proj = jax.jit(lambda vm, K: projection.fully_fused_projection(
        means, covars, vm, K, W, H))(jnp.asarray(w2c), jnp.asarray(Ks))
    m2d = np.asarray(proj.means2d)
    con = np.asarray(proj.conics)
    rad = np.asarray(proj.radii)
    N = m2d.shape[1]

    tight = np.asarray(jax.jit(tiles.opacity_tight_radii)(
        proj.radii.reshape(-1, 2),
        jnp.broadcast_to(jnp.asarray(op_raw)[None], (S, N)).reshape(-1)
    )).reshape(S, N, 2)

    def cover_counts(u, v, rx, ry):
        txmin = np.clip(np.floor((u - rx) / ts), 0, tw).astype(np.int64)
        txmax = np.clip(np.ceil((u + rx) / ts), 0, tw).astype(np.int64)
        tymin = np.clip(np.floor((v - ry) / ts), 0, th).astype(np.int64)
        tymax = np.clip(np.ceil((v + ry) / ts), 0, th).astype(np.int64)
        valid = (rx > 0) & (ry > 0)
        return (np.where(valid, (txmax - txmin) * (tymax - tymin), 0),
                txmin, tymin, txmax - txmin, tymax - tymin, valid)

    print(f"S={S} img={img} N={N} splats/view tile={ts}")
    tot = {"aabb": 0, "tight": 0, "ellipse": 0}
    hist = np.zeros(12, np.int64)
    for c_i in range(S):
        u, v = m2d[c_i, :, 0], m2d[c_i, :, 1]
        a, b, cc = con[c_i, :, 0], con[c_i, :, 1], con[c_i, :, 2]
        n_aabb = cover_counts(u, v, rad[c_i, :, 0], rad[c_i, :, 1])[0].sum()
        cov_t, txm, tym, bw, bh, valid = cover_counts(
            u, v, tight[c_i, :, 0], tight[c_i, :, 1])
        n_tight = cov_t.sum()
        # exact ellipse test per covered cell (loop over box cells, bounded)
        lvl = np.log(np.maximum(op_raw, 1e-12) * 255.0)
        n_ell = np.zeros(N, np.int64)
        jmax = int((bw * bh).max())
        for j in range(min(jmax, 32)):
            has = (j < bw * bh) & valid
            jx = txm + j % np.maximum(bw, 1)
            jy = tym + j // np.maximum(bw, 1)
            x0, x1 = jx * ts + 0.5, (jx + 1) * ts - 0.5
            y0, y1 = jy * ts + 0.5, (jy + 1) * ts - 0.5
            smin = rect_sigma_min(u, v, a, b, cc, x0, x1, y0, y1)
            n_ell += (has & (smin <= lvl)).astype(np.int64)
        tot["aabb"] += n_aabb
        tot["tight"] += n_tight
        tot["ellipse"] += n_ell.sum()
        cnt = np.minimum(n_ell, 11)
        hist += np.bincount(cnt, minlength=12)
    print(f"intersections/camera: aabb {tot['aabb']/S:.0f}  "
          f"tight {tot['tight']/S:.0f} ({100*tot['tight']/max(tot['aabb'],1):.1f}%)  "
          f"ellipse {tot['ellipse']/S:.0f} "
          f"({100*tot['ellipse']/max(tot['aabb'],1):.1f}%)")
    frac = hist / hist.sum()
    print("exact-cover histogram (cover k: fraction):",
          " ".join(f"{k}:{frac[k]:.4f}" for k in range(12) if frac[k] > 0))
    tail = np.cumsum(frac[::-1])[::-1]
    print("fraction needing slot >= k:",
          " ".join(f"{k}:{tail[k]:.4f}" for k in range(1, 10)))


if __name__ == "__main__":
    main()
