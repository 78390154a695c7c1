"""2DGS projection parity vs the reference torch oracle + blend invariants.

Oracle: submodules/gsplat/gsplat/cuda/_torch_impl_2dgs.py (projection runs
without CUDA/nerfacc; the blend path is cross-checked with a direct numpy
per-pixel compositor)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hunyuanworld_mirror_tpu.ops import gs2d

from conftest import torch_reference


def _scene(rng, N=64, C=2):
    means = rng.uniform(-1, 1, (N, 3)).astype(np.float32) + [0, 0, 3.0]
    quats = rng.normal(size=(N, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    scales = np.exp(rng.uniform(-3.5, -2, (N, 3))).astype(np.float32)
    opac = rng.uniform(0.3, 0.95, N).astype(np.float32)
    colors = rng.uniform(0, 1, (N, 3)).astype(np.float32)
    vm = np.broadcast_to(np.eye(4, dtype=np.float32), (C, 4, 4)).copy()
    vm[:, 0, 3] = np.linspace(-0.2, 0.2, C)
    K = np.broadcast_to(np.array([[60.0, 0, 32], [0, 60.0, 32], [0, 0, 1]],
                                 np.float32), (C, 3, 3)).copy()
    return means, quats, scales, opac, colors, vm, K


def test_projection_2dgs_torch_parity(rng):
    torch = torch_reference()
    import sys
    sys.path.insert(0, "/root/reference/submodules/gsplat")
    from gsplat.cuda import _torch_impl_2dgs as oracle

    means, quats, scales, _, _, vm, K = _scene(rng)
    # oracle quats are wxyz
    quats_wxyz = quats[:, [3, 0, 1, 2]]
    # oracle mixes in f64 constants -> run it fully in f64
    t64 = lambda x: torch.from_numpy(np.asarray(x, np.float64))
    radii_t, m2d_t, dep_t, M_t, nrm_t = oracle._fully_fused_projection_2dgs(
        t64(means), t64(quats_wxyz), t64(scales), t64(vm), t64(K),
        width=64, height=64)

    proj = gs2d.fully_fused_projection_2dgs(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(vm), jnp.asarray(K), 64, 64)

    np.testing.assert_allclose(np.asarray(proj.depths), dep_t.numpy(),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(proj.radii), radii_t.numpy())
    live = radii_t.numpy().max(-1) > 0
    np.testing.assert_allclose(np.asarray(proj.means2d)[live],
                               m2d_t.numpy()[live], atol=2e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(proj.ray_transforms)[live],
                               M_t.numpy()[live], atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(proj.normals)[live],
                               nrm_t.numpy()[live], atol=1e-5)


def _numpy_composite_pixel(px, py, order, M, m2d, opac, colors, normals):
    """Direct front-to-back compositing at one pixel (oracle accumulate math)."""
    T = 1.0
    out = np.zeros(colors.shape[-1])
    nrm = np.zeros(3)
    a_sum = 0.0
    for i in order:
        h_u = -M[i, 0] + M[i, 2] * px
        h_v = -M[i, 1] + M[i, 2] * py
        t = np.cross(h_u, h_v)
        if abs(t[2]) < 1e-12:
            continue
        u, v = t[0] / t[2], t[1] / t[2]
        s3 = u * u + v * v
        s2 = 2 * ((px - m2d[i, 0]) ** 2 + (py - m2d[i, 1]) ** 2)
        sigma = 0.5 * min(s3, s2)
        alpha = min(0.999, opac[i] * np.exp(-sigma))
        if alpha < 1.0 / 255.0:
            continue
        if T * (1 - alpha) <= 1e-4:
            break
        w = alpha * T
        out += w * colors[i]
        nrm += w * normals[i]
        a_sum += w
        T *= 1 - alpha
    return out, a_sum, nrm


def test_rasterize_2dgs_matches_direct_compositing(rng):
    means, quats, scales, opac, colors, vm, K = _scene(rng, N=48, C=1)
    W = H = 64
    img, alpha, nrm = gs2d.rasterize_2dgs(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opac), jnp.asarray(colors), jnp.asarray(vm),
        jnp.asarray(K), width=W, height=H, render_mode="RGB")
    img, alpha, nrm = np.asarray(img), np.asarray(alpha), np.asarray(nrm)
    assert np.isfinite(img).all() and alpha.max() > 0.2

    proj = gs2d.fully_fused_projection_2dgs(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(vm), jnp.asarray(K), W, H)
    M = np.asarray(proj.ray_transforms[0])
    m2d = np.asarray(proj.means2d[0])
    dep = np.asarray(proj.depths[0])
    rad = np.asarray(proj.radii[0]).max(-1)
    order = np.argsort(dep)
    order = order[rad[order] > 0]

    got_exact = 0
    for px_i, py_i in [(20, 20), (32, 32), (45, 12), (10, 50)]:
        # only splats whose AABB covers the pixel participate (tile binning)
        sel = [i for i in order
               if abs(px_i + 0.5 - m2d[i, 0]) <= rad[i] + 16
               and abs(py_i + 0.5 - m2d[i, 1]) <= rad[i] + 16]
        out, a, n = _numpy_composite_pixel(
            px_i + 0.5, py_i + 0.5, sel, M, m2d, opac, colors,
            np.asarray(proj.normals[0]))
        if np.allclose(img[0, py_i, px_i], out, atol=2e-3) and \
           np.allclose(alpha[0, py_i, px_i, 0], a, atol=2e-3):
            got_exact += 1
    assert got_exact >= 3, f"only {got_exact}/4 pixels matched"


def test_rasterize_2dgs_depth_and_normals(rng):
    """A single fronto-parallel surfel: ED depth equals its plane depth and
    the rendered normal points at the camera."""
    means = np.array([[0.0, 0.0, 2.0]], np.float32)
    quats = np.array([[0.0, 0, 0, 1.0]], np.float32)   # identity (xyzw)
    scales = np.array([[0.5, 0.5, 1e-3]], np.float32)
    opac = np.array([0.95], np.float32)
    colors = np.array([[1.0, 0, 0]], np.float32)
    vm = np.eye(4, dtype=np.float32)[None]
    K = np.array([[[60.0, 0, 32], [0, 60.0, 32], [0, 0, 1]]], np.float32)
    # the surfel spans ~50px -> covers 16 tiles; raise the per-gaussian cap
    img, alpha, nrm = gs2d.rasterize_2dgs(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opac), jnp.asarray(colors), jnp.asarray(vm),
        jnp.asarray(K), width=64, height=64, render_mode="RGB+ED",
        max_tiles_per_gauss=25)
    img, alpha, nrm = np.asarray(img), np.asarray(alpha), np.asarray(nrm)
    cy = cx = 32
    assert alpha[0, cy, cx, 0] > 0.9
    assert abs(img[0, cy, cx, 3] - 2.0) < 1e-3      # expected depth
    # oracle semantics: the normal channel is RS's third column (carries the
    # s_z scale) — normalize to check direction only
    n = nrm[0, cy, cx] / (np.linalg.norm(nrm[0, cy, cx]) + 1e-12)
    assert n[2] < -0.9  # faces the camera (camera looks +z)


def test_rasterize_2dgs_zero_distortion_matches_pinhole(rng):
    means, quats, scales, opac, colors, vm, K = _scene(rng)
    base = gs2d.rasterize_2dgs(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opac), jnp.asarray(colors), jnp.asarray(vm),
        jnp.asarray(K), 64, 64)
    zero = gs2d.rasterize_2dgs(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opac), jnp.asarray(colors), jnp.asarray(vm),
        jnp.asarray(K), 64, 64,
        radial_coeffs=jnp.zeros((2, 4), jnp.float32))
    for a, b in zip(base, zero):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_rasterize_2dgs_distorted_warp_consistency(rng):
    """Mild radial distortion: the distorted render at pixel p should match
    the pinhole render sampled at p's undistorted coordinate (plane
    intersection is exact; the 2px screen-space floor differs, so use big
    surfels where the object-space term dominates and compare loosely)."""
    means, quats, scales, opac, colors, vm, K = _scene(rng, N=40, C=1)
    scales = scales * 6.0  # big surfels -> sigma3d < sigma2d nearly everywhere
    radial = np.array([[-0.08, 0.01, 0.0, 0.0]], np.float32)

    args = (jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
            jnp.asarray(opac), jnp.asarray(colors), jnp.asarray(vm),
            jnp.asarray(K))
    pin, _, _ = gs2d.rasterize_2dgs(*args, 64, 64, render_mode="RGB")
    dis, _, _ = gs2d.rasterize_2dgs(*args, 64, 64, render_mode="RGB",
                                    radial_coeffs=jnp.asarray(radial))

    und = np.asarray(gs2d._undistort_pixel_map(
        jnp.asarray(K[0]), 64, 64, "pinhole", jnp.asarray(radial[0]), None))
    pin_np = np.asarray(pin[0])
    dis_np = np.asarray(dis[0])
    # sample the pinhole render at the undistorted coords (nearest neighbor),
    # compare interior pixels where the source stays in frame
    xs = np.clip(np.round(und[..., 0] - 0.5).astype(int), 0, 63)
    ys = np.clip(np.round(und[..., 1] - 0.5).astype(int), 0, 63)
    warped = pin_np[ys, xs]
    interior = ((und[..., 0] > 2) & (und[..., 0] < 62)
                & (und[..., 1] > 2) & (und[..., 1] < 62))
    diff = np.abs(warped - dis_np)[interior]
    # nearest-neighbor resample + low-pass floor delta: most pixels agree
    assert np.median(diff) < 0.02
    assert (diff > 0.15).mean() < 0.08


def test_rasterize_to_indices_2dgs(rng):
    """Top-k per-pixel surfel enumeration: weights must reproduce the render
    when k covers every contributor (reference RasterizeToIndices2DGS.cu)."""
    means, quats, scales, opac, colors, vm, K = _scene(rng, N=24, C=1)
    args = (jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
            jnp.asarray(opac))
    img, alpha, _ = gs2d.rasterize_2dgs(
        *args, jnp.asarray(colors), jnp.asarray(vm), jnp.asarray(K),
        48, 48, render_mode="RGB")
    ids, w = gs2d.rasterize_to_indices_2dgs(
        *args, jnp.asarray(vm), jnp.asarray(K), 48, 48, k=24)
    ids, w = np.asarray(ids), np.asarray(w)
    assert ids.shape == (1, 48, 48, 24) and w.shape == ids.shape
    # padded entries are -1 with zero weight; valid ids in range
    assert np.all((ids >= -1) & (ids < 24))
    assert np.all(w[ids == -1] == 0)
    # recomposite from the enumerated weights
    recon = np.einsum("chwk,chwkd->chwd", w,
                      np.asarray(colors)[np.maximum(ids, 0)])
    np.testing.assert_allclose(recon, np.asarray(img), atol=1e-4)
    np.testing.assert_allclose(w.sum(-1), np.asarray(alpha)[..., 0], atol=1e-4)


def test_splat_opt_2dgs_mode(rng):
    """--gs2d trainer mode: a few surfel-optimization steps reduce the loss."""
    from hunyuanworld_mirror_tpu.training import splat_opt

    n = 80
    splats = {
        "means": (rng.normal(0, 0.4, (n, 3)).astype(np.float32)
                  + np.array([0, 0, 2.5], np.float32)),
        "quats": np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1)),
        "scales": np.full((n, 3), 0.08, np.float32),
        "opacities": np.full((n,), 0.7, np.float32),
        "sh": rng.normal(0, 0.3, (n, 1, 3)).astype(np.float32),
    }
    images = rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32)
    c2w = np.eye(4, dtype=np.float32)[None]
    Ks = np.array([[[40, 0, 16], [0, 40, 16], [0, 0, 1]]], np.float32)

    cfg = splat_opt.SplatOptConfig(iters=30, refine_every=1000, mode="2dgs")
    assert cfg.resolved_signal() == "mean3d"
    losses = []
    splat_opt.optimize_splats(
        splats, images, c2w, Ks, cfg,
        log_fn=lambda m: losses.append(m))
    # direct check: loss at iter end < loss at start
    tx = splat_opt.make_optimizer(cfg)
    raw = splat_opt._raw_from_splats(
        {k: jnp.asarray(v) for k, v in splats.items()}, n)
    step = splat_opt.make_train_step(cfg, tx, 32, 32)
    st = tx.init(raw)
    vms = jnp.asarray(np.linalg.inv(c2w))
    l0 = l_last = None
    for i in range(25):
        raw, st, loss, _ = step(raw, st, vms, jnp.asarray(Ks),
                                jnp.asarray(images))
        l0 = float(loss) if l0 is None else l0
        l_last = float(loss)
    assert l_last < l0
