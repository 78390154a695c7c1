"""Gaussian rasterization stack tests.

Pattern copied from gsplat's test strategy (SURVEY.md §4): pure oracles vs the
production path, projected-op parity against the reference torch impl, and
gradient checks on the differentiable path.
"""

import importlib.util
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hunyuanworld_mirror_tpu.ops import projection, tiles, rasterizer
from hunyuanworld_mirror_tpu.ops.rasterizer_ref import rasterize_reference


def _gsplat_oracle():
    path = "/root/reference/submodules/gsplat/gsplat/cuda/_torch_impl.py"
    if not os.path.exists(path):
        pytest.skip("gsplat reference unavailable")
    torch = pytest.importorskip("torch")
    spec = importlib.util.spec_from_file_location("gsplat_torch_impl", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return torch, mod


def _random_scene(rng, n=200, c=3):
    means = rng.normal(size=(n, 3)).astype(np.float32)
    means[:, 2] += 4.0  # mostly in front of identity cameras
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    scales = rng.uniform(0.02, 0.2, size=(n, 3)).astype(np.float32)
    opac = rng.uniform(0.3, 1.0, size=(n,)).astype(np.float32)
    colors = rng.uniform(size=(n, 3)).astype(np.float32)

    viewmats = np.tile(np.eye(4, dtype=np.float32), (c, 1, 1))
    for i in range(c):
        angle = 0.15 * i
        ca, sa = np.cos(angle), np.sin(angle)
        viewmats[i, :3, :3] = np.array([[ca, 0, sa], [0, 1, 0], [-sa, 0, ca]],
                                       dtype=np.float32)
        viewmats[i, 0, 3] = 0.2 * i
    Ks = np.tile(np.array([[60.0, 0, 32.0], [0, 60.0, 24.0], [0, 0, 1]],
                          dtype=np.float32), (c, 1, 1))
    return means, quats, scales, opac, colors, viewmats, Ks


class TestProjectionParity:
    def test_quat_scale_to_covar(self, rng):
        torch, oracle = _gsplat_oracle()
        q = rng.normal(size=(50, 4)).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        s = rng.uniform(0.01, 0.5, size=(50, 3)).astype(np.float32)

        ref, _ = oracle._quat_scale_to_covar_preci(
            torch.from_numpy(q), torch.from_numpy(s), compute_preci=False)
        # gsplat quats are WXYZ; ours XYZW
        ours = projection.quat_scale_to_covar(
            jnp.asarray(q[:, [1, 2, 3, 0]]), jnp.asarray(s))
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)

    def test_fully_fused_projection(self, rng):
        torch, oracle = _gsplat_oracle()
        means, quats, scales, opac, colors, viewmats, Ks = _random_scene(rng)
        covars_t, _ = oracle._quat_scale_to_covar_preci(
            torch.from_numpy(quats), torch.from_numpy(scales), compute_preci=False)

        radii_r, means2d_r, depths_r, conics_r, comp_r = oracle._fully_fused_projection(
            torch.from_numpy(means), covars_t, torch.from_numpy(viewmats),
            torch.from_numpy(Ks), 64, 48, calc_compensations=True)

        covars = projection.quat_scale_to_covar(
            jnp.asarray(quats[:, [1, 2, 3, 0]]), jnp.asarray(scales))
        proj = projection.fully_fused_projection(
            jnp.asarray(means), covars, jnp.asarray(viewmats), jnp.asarray(Ks),
            64, 48, calc_compensations=True)

        np.testing.assert_allclose(np.asarray(proj.depths), depths_r.numpy(), atol=1e-4)
        np.testing.assert_allclose(np.asarray(proj.means2d), means2d_r.numpy(),
                                   atol=5e-3)
        valid = (radii_r.numpy() > 0).all(-1)
        np.testing.assert_array_equal(np.asarray(proj.radii > 0).all(-1), valid)
        np.testing.assert_allclose(np.asarray(proj.conics)[valid],
                                   conics_r.numpy()[valid], rtol=2e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(proj.compensations)[valid],
                                   comp_r.numpy()[valid], atol=1e-4)


class TestTileBinning:
    def test_bins_cover_all_intersections(self, rng):
        means, quats, scales, opac, colors, viewmats, Ks = _random_scene(rng, n=100, c=1)
        covars = projection.quat_scale_to_covar(jnp.asarray(quats), jnp.asarray(scales))
        proj = projection.fully_fused_projection(
            jnp.asarray(means), covars, jnp.asarray(viewmats), jnp.asarray(Ks), 64, 48)
        bins = tiles.bin_gaussians(proj.means2d[0], proj.radii[0], proj.depths[0],
                                   16, 4, 3, max_tiles_per_gauss=12,
                                   max_per_tile=100 * 12)
        assert int(bins.n_dropped) == 0
        # every (gaussian, tile) pair appears exactly where expected
        tmin, tmax, valid = tiles.tile_ranges(proj.means2d[0], proj.radii[0], 16, 4, 3)
        tmin, tmax, valid = map(np.asarray, (tmin, tmax, valid))
        expect_counts = np.zeros(12, np.int32)
        for n in range(100):
            if not valid[n]:
                continue
            for ty in range(tmin[n, 1], tmax[n, 1]):
                for tx in range(tmin[n, 0], tmax[n, 0]):
                    expect_counts[ty * 4 + tx] += 1
        np.testing.assert_array_equal(np.asarray(bins.counts), expect_counts)

    def test_depth_ordering_within_tile(self, rng):
        means, quats, scales, opac, colors, viewmats, Ks = _random_scene(rng, n=60, c=1)
        covars = projection.quat_scale_to_covar(jnp.asarray(quats), jnp.asarray(scales))
        proj = projection.fully_fused_projection(
            jnp.asarray(means), covars, jnp.asarray(viewmats), jnp.asarray(Ks), 64, 48)
        bins = tiles.bin_gaussians(proj.means2d[0], proj.radii[0], proj.depths[0],
                                   16, 4, 3, max_tiles_per_gauss=12, max_per_tile=720)
        depths = np.asarray(proj.depths[0])
        ids = np.asarray(bins.gauss_ids)
        counts = np.asarray(bins.counts)
        for t in range(12):
            d = depths[ids[t, :counts[t]]]
            assert (np.diff(d) >= 0).all(), f"tile {t} not depth sorted"


class TestRasterizeParity:
    def test_tiled_matches_reference(self, rng):
        means, quats, scales, opac, colors, viewmats, Ks = _random_scene(rng, n=150, c=2)
        W, H = 64, 48
        render, alphas, meta = rasterizer.rasterize(
            jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
            jnp.asarray(opac), jnp.asarray(colors), jnp.asarray(viewmats),
            jnp.asarray(Ks), W, H, render_mode="RGB",
            max_per_tile=2048, max_tiles_per_gauss=12)

        covars = projection.quat_scale_to_covar(jnp.asarray(quats), jnp.asarray(scales))
        proj = projection.fully_fused_projection(
            jnp.asarray(means), covars, jnp.asarray(viewmats), jnp.asarray(Ks), W, H)
        for cam in range(2):
            ref_img, ref_alpha = rasterize_reference(
                proj.means2d[cam], proj.conics[cam], jnp.asarray(colors),
                jnp.asarray(opac), proj.depths[cam], proj.radii[cam], W, H)
            np.testing.assert_allclose(np.asarray(render[cam]), np.asarray(ref_img),
                                       atol=1e-4)
            np.testing.assert_allclose(np.asarray(alphas[cam]), np.asarray(ref_alpha),
                                       atol=1e-4)

    def test_rgb_ed_mode(self, rng):
        means, quats, scales, opac, colors, viewmats, Ks = _random_scene(rng, n=100, c=1)
        render, alphas, _ = rasterizer.rasterize(
            jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
            jnp.asarray(opac), jnp.asarray(colors), jnp.asarray(viewmats),
            jnp.asarray(Ks), 64, 48, render_mode="RGB+ED", max_per_tile=2048,
            max_tiles_per_gauss=12)
        assert render.shape == (1, 48, 64, 4)
        depth = np.asarray(render[0, ..., 3])
        a = np.asarray(alphas[0, ..., 0])
        assert np.isfinite(depth).all()
        # expected depth lands inside the scene depth range where opaque
        sel = a > 0.5
        if sel.any():
            assert depth[sel].min() > 0.5 and depth[sel].max() < 20.0

    def test_grad_flows(self, rng):
        means, quats, scales, opac, colors, viewmats, Ks = _random_scene(rng, n=40, c=1)

        def loss(m, s, o, c):
            render, _, _ = rasterizer.rasterize(
                m, jnp.asarray(quats), s, o, c, jnp.asarray(viewmats),
                jnp.asarray(Ks), 32, 32, render_mode="RGB",
                max_per_tile=512, max_tiles_per_gauss=9)
            return jnp.sum(render ** 2)

        g = jax.grad(loss, argnums=(0, 1, 2, 3))(
            jnp.asarray(means), jnp.asarray(scales), jnp.asarray(opac),
            jnp.asarray(colors))
        for gi in g:
            assert np.isfinite(np.asarray(gi)).all()
        assert any(float(jnp.abs(gi).max()) > 0 for gi in g)

    def test_grad_matches_oracle_finite_diff(self, rng):
        """Spot-check autodiff of the tiled path against finite differences."""
        means, quats, scales, opac, colors, viewmats, Ks = _random_scene(rng, n=20, c=1)

        def loss(o):
            render, _, _ = rasterizer.rasterize(
                jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
                o, jnp.asarray(colors), jnp.asarray(viewmats), jnp.asarray(Ks),
                32, 32, render_mode="RGB", max_per_tile=256, max_tiles_per_gauss=9)
            return jnp.sum(render * jnp.linspace(0, 1, render.size).reshape(render.shape))

        o0 = jnp.asarray(opac)
        g = jax.grad(loss)(o0)
        eps = 1e-3
        for i in [0, 7, 13]:
            lp = loss(o0.at[i].add(eps))
            lm = loss(o0.at[i].add(-eps))
            fd = (lp - lm) / (2 * eps)
            np.testing.assert_allclose(float(g[i]), float(fd), rtol=5e-2, atol=5e-3)


def test_radius_clip(rng):
    """radius_clip culls sub-threshold footprints (reference rendering.py:45):
    a huge clip blanks the image; clip=0 is the default behavior."""
    import jax.numpy as jnp
    from hunyuanworld_mirror_tpu.ops import rasterizer

    means, quats, scales, opac, colors, viewmats, Ks = _random_scene(
        rng, n=60, c=1)
    common = dict(width=64, height=48, render_mode="RGB",
                  max_per_tile=512, max_tiles_per_gauss=9)
    out0, alpha0, _ = rasterizer.rasterize(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opac), jnp.asarray(colors), jnp.asarray(viewmats),
        jnp.asarray(Ks), **common)
    out_hi, alpha_hi, _ = rasterizer.rasterize(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opac), jnp.asarray(colors), jnp.asarray(viewmats),
        jnp.asarray(Ks), radius_clip=1e6, **common)
    assert np.asarray(alpha0).max() > 0.1
    assert np.asarray(alpha_hi).max() == 0.0
    # a moderate clip keeps the image close to unclipped minus small splats
    out_lo, _, _ = rasterizer.rasterize(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opac), jnp.asarray(colors), jnp.asarray(viewmats),
        jnp.asarray(Ks), radius_clip=1.0, **common)
    assert np.isfinite(np.asarray(out_lo)).all()


class TestExactTileTest:
    """Exact ellipse-tile overlap mask (tiles.conic_test_planes, VERDICT r4
    #3): binning must drop only AABB cells outside the alpha>=1/255 level
    set — renders bit-identical, per-tile entry counts <=, and genuinely
    smaller for anisotropic splats (where the AABB overlaps ~2x more tiles
    than the ellipse)."""

    def _aniso_scene(self, rng, n=150):
        means, quats, scales, opac, colors, viewmats, Ks = _random_scene(
            rng, n=n, c=1)
        # strongly anisotropic: 20:1 axis ratios produce diagonal footprints
        scales = np.stack([
            rng.uniform(0.2, 0.5, size=n),
            rng.uniform(0.01, 0.03, size=n),
            rng.uniform(0.01, 0.03, size=n)], -1).astype(np.float32)
        return means, quats, scales, opac, colors, viewmats, Ks

    def _project(self, means, quats, scales, viewmats, Ks, W, H):
        covars = projection.quat_scale_to_covar(
            jnp.asarray(quats), jnp.asarray(scales))
        return projection.fully_fused_projection(
            jnp.asarray(means), covars, jnp.asarray(viewmats),
            jnp.asarray(Ks), W, H)

    def test_counts_reduced_render_identical(self, rng):
        means, quats, scales, opac, colors, viewmats, Ks = \
            self._aniso_scene(rng)
        W, H, ts, tw, th = 64, 48, 16, 4, 3
        proj = self._project(means, quats, scales, viewmats, Ks, W, H)
        m2d, rad, dep = proj.means2d[0], proj.radii[0], proj.depths[0]
        con, op = proj.conics[0], jnp.asarray(opac)

        kw = dict(max_tiles_per_gauss=16, max_per_tile=2048)
        b_aabb = tiles.bin_gaussians(m2d, rad, dep, ts, tw, th, **kw)
        ct = tiles.conic_test_planes(con, op)
        b_ell = tiles.bin_gaussians(m2d, rad, dep, ts, tw, th,
                                    conic_test=ct, **kw)
        c_aabb = int(np.asarray(b_aabb.counts).sum())
        c_ell = int(np.asarray(b_ell.counts).sum())
        assert c_ell <= c_aabb
        assert c_ell < c_aabb, "anisotropic scene must shed AABB-only cells"

        from hunyuanworld_mirror_tpu.ops.rasterizer import rasterize_binned_jax
        col = jnp.asarray(colors)
        img_a, al_a = rasterize_binned_jax(m2d, con, col, op, b_aabb, W, H, ts)
        img_e, al_e = rasterize_binned_jax(m2d, con, col, op, b_ell, W, H, ts)
        # every removed entry contributes exactly zero, but its removal
        # shifts later entries' positions in the f32 reduction — the only
        # permitted delta is summation-reassociation noise (~1 ulp)
        np.testing.assert_allclose(np.asarray(img_a), np.asarray(img_e),
                                   atol=5e-7)
        np.testing.assert_allclose(np.asarray(al_a), np.asarray(al_e),
                                   atol=5e-7)

    def test_mask_never_drops_contributing_tile(self, rng):
        """Brute force: every tile with a pixel whose alpha >= 1/255 must
        survive the mask (the exactness direction that matters)."""
        means, quats, scales, opac, colors, viewmats, Ks = \
            self._aniso_scene(rng, n=60)
        W, H, ts, tw, th = 64, 48, 16, 4, 3
        proj = self._project(means, quats, scales, viewmats, Ks, W, H)
        m2d = np.asarray(proj.means2d[0])
        con = np.asarray(proj.conics[0])
        rad = np.asarray(proj.radii[0])
        ct = tiles.conic_test_planes(proj.conics[0], jnp.asarray(opac))

        tmin, tmax, valid = map(np.asarray, tiles.tile_ranges(
            proj.means2d[0], proj.radii[0], ts, tw, th))
        lvl = np.log(np.maximum(opac, 1e-12) * 255.0)
        for n in range(60):
            if not valid[n]:
                continue
            for ty in range(tmin[n, 1], tmax[n, 1]):
                for tx in range(tmin[n, 0], tmax[n, 0]):
                    px, py = np.meshgrid(
                        tx * ts + np.arange(ts) + 0.5,
                        ty * ts + np.arange(ts) + 0.5)
                    dx, dy = px - m2d[n, 0], py - m2d[n, 1]
                    a, b, c = con[n]
                    sig = 0.5 * (a * dx * dx + c * dy * dy) + b * dx * dy
                    contributes = (sig <= lvl[n]).any()
                    keep = bool(np.asarray(tiles._conic_slot_mask(
                        tuple(p[n] for p in ct),
                        jnp.asarray(tx), jnp.asarray(ty),
                        proj.means2d[0][n, 0], proj.means2d[0][n, 1], ts)))
                    if contributes:
                        assert keep, (n, tx, ty)

    def test_prefix_path_accepts_conic_test(self, rng):
        means, quats, scales, opac, colors, viewmats, Ks = \
            self._aniso_scene(rng, n=100)
        W, H, ts, tw, th = 64, 48, 16, 4, 3
        proj = self._project(means, quats, scales, viewmats, Ks, W, H)
        m2d, rad, dep = proj.means2d[0], proj.radii[0], proj.depths[0]
        con, op = proj.conics[0], jnp.asarray(opac)
        values = (m2d[:, 0], m2d[:, 1], con[:, 0], con[:, 1], con[:, 2], op)
        ct = tiles.conic_test_planes(con, op)
        fl = tiles.bin_gaussians_packed_prefix(
            m2d, rad, dep, values, ts, tw, th, max_tiles_per_gauss=9,
            max_per_tile=1024, slot_fracs=(1.0,) * 9, align=128,
            conic_test=ct)
        fl_classic = tiles.bin_gaussians_packed(
            m2d, rad, dep, values, ts, tw, th, max_tiles_per_gauss=9,
            max_per_tile=1024, conic_test=ct)
        # full-prefix scheduling with the same mask = identical counts
        np.testing.assert_array_equal(np.asarray(fl.counts),
                                      np.asarray(fl_classic.counts))
