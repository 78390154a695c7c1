"""Pallas tile rasterizer vs the JAX tiled formulation (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hunyuanworld_mirror_tpu.ops import projection, tiles
from hunyuanworld_mirror_tpu.ops.rasterizer import rasterize_binned_jax
from hunyuanworld_mirror_tpu.ops.rasterizer_pallas import rasterize_binned_pallas

from test_rasterizer import _random_scene


def _setup(rng, n=150, W=64, H=48, tile=16, mpt=512):
    means, quats, scales, opac, colors, viewmats, Ks = _random_scene(rng, n=n, c=1)
    covars = projection.quat_scale_to_covar(jnp.asarray(quats), jnp.asarray(scales))
    proj = projection.fully_fused_projection(
        jnp.asarray(means), covars, jnp.asarray(viewmats), jnp.asarray(Ks), W, H)
    tw, th = (W + tile - 1) // tile, (H + tile - 1) // tile
    bins = tiles.bin_gaussians(proj.means2d[0], proj.radii[0], proj.depths[0],
                               tile, tw, th, max_tiles_per_gauss=12,
                               max_per_tile=mpt)
    colors_d = jnp.concatenate([jnp.asarray(colors), proj.depths[0][:, None]], -1)
    return proj, bins, colors_d, jnp.asarray(opac), (W, H, tile)


class TestPallasParity:
    def test_matches_jax_path(self, rng):
        proj, bins, colors, opac, (W, H, tile) = _setup(rng)
        img_j, a_j = rasterize_binned_jax(
            proj.means2d[0], proj.conics[0], colors, opac, bins, W, H, tile)
        img_p, a_p = rasterize_binned_pallas(
            proj.means2d[0], proj.conics[0], colors, opac, bins, W, H, tile,
            True)  # interpret
        np.testing.assert_allclose(np.asarray(img_p), np.asarray(img_j),
                                   atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(a_p), np.asarray(a_j), atol=1e-4)

    def test_multi_chunk_carry(self, rng):
        # force several chunks per tile so the scratch carry path executes
        proj, bins, colors, opac, (W, H, tile) = _setup(rng, n=400, mpt=1024)
        img_j, a_j = rasterize_binned_jax(
            proj.means2d[0], proj.conics[0], colors, opac, bins, W, H, tile)
        img_p, a_p = rasterize_binned_pallas(
            proj.means2d[0], proj.conics[0], colors, opac, bins, W, H, tile,
            True)
        np.testing.assert_allclose(np.asarray(img_p), np.asarray(img_j),
                                   atol=1e-4, rtol=1e-4)

    def test_opaque_early_stop(self, rng):
        # stack many near-opaque splats on one spot -> early stop must engage
        N, W, H, tile = 600, 32, 32, 16
        means2d = jnp.tile(jnp.asarray([[16.0, 16.0]]), (N, 1))
        conics = jnp.tile(jnp.asarray([[0.5, 0.0, 0.5]]), (N, 1))
        colors = jnp.linspace(0, 1, N)[:, None] * jnp.ones((1, 3))
        opac = jnp.full((N,), 0.9)
        depths = jnp.linspace(1.0, 2.0, N)
        radii = jnp.full((N, 2), 5, jnp.int32)
        bins = tiles.bin_gaussians(means2d, radii, depths, tile, 2, 2,
                                   max_tiles_per_gauss=4, max_per_tile=1024)
        img_j, a_j = rasterize_binned_jax(means2d, conics, colors, opac,
                                          bins, W, H, tile)
        img_p, a_p = rasterize_binned_pallas(means2d, conics, colors, opac,
                                             bins, W, H, tile, True)
        np.testing.assert_allclose(np.asarray(img_p), np.asarray(img_j), atol=1e-4)
        assert 0.999 < float(a_p.max()) <= 1.0

    def test_grad_custom_vjp(self, rng):
        proj, bins, colors, opac, (W, H, tile) = _setup(rng, n=60)

        def loss_pallas(col, op):
            img, a = rasterize_binned_pallas(proj.means2d[0], proj.conics[0],
                                             col, op, bins, W, H, tile, True)
            return jnp.sum(img ** 2) + jnp.sum(a)

        def loss_jax(col, op):
            img, a = rasterize_binned_jax(proj.means2d[0], proj.conics[0],
                                          col, op, bins, W, H, tile)
            return jnp.sum(img ** 2) + jnp.sum(a)

        gp = jax.grad(loss_pallas, argnums=(0, 1))(colors, opac)
        gj = jax.grad(loss_jax, argnums=(0, 1))(colors, opac)
        for a, b in zip(gp, gj):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-3, rtol=1e-3)


class TestFlatPallasParity:
    """Flat sorted-list kernel (rasterize_flat_pallas) vs the dense JAX path."""

    def _run_both(self, rng, n=150, mpt=512, tpg=12):
        from hunyuanworld_mirror_tpu.ops.rasterizer_pallas import (
            rasterize_flat_pallas)

        proj, bins, colors, opac, (W, H, tile) = _setup(rng, n=n, mpt=mpt)
        img_j, a_j = rasterize_binned_jax(
            proj.means2d[0], proj.conics[0], colors, opac, bins, W, H, tile)
        img_f, a_f, n_drop = rasterize_flat_pallas(
            proj.means2d[0], proj.conics[0], colors, opac,
            proj.radii[0], proj.depths[0], jnp.zeros_like(proj.means2d[0]),
            W, H, tile, tpg, mpt, True)
        return (img_j, a_j), (img_f, a_f, n_drop)

    def test_matches_jax_path(self, rng):
        (img_j, a_j), (img_f, a_f, _) = self._run_both(rng)
        np.testing.assert_allclose(np.asarray(img_f), np.asarray(img_j),
                                   atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(a_f), np.asarray(a_j), atol=1e-4)

    def test_multi_chunk_and_unaligned_starts(self, rng):
        (img_j, a_j), (img_f, a_f, _) = self._run_both(rng, n=400, mpt=1024)
        np.testing.assert_allclose(np.asarray(img_f), np.asarray(img_j),
                                   atol=1e-4, rtol=1e-4)

    def test_grad_matches_jax(self, rng):
        # the hand-written backward kernel (_kernel_flat_bwd) vs autodiff of
        # the dense JAX path, over ALL differentiable inputs
        from hunyuanworld_mirror_tpu.ops.rasterizer_pallas import (
            rasterize_flat_pallas)

        proj, bins, colors, opac, (W, H, tile) = _setup(rng, n=60)
        m2d, con = proj.means2d[0], proj.conics[0]
        tap = jnp.zeros_like(m2d)

        def loss_flat(m, c, col, op):
            img, a, _ = rasterize_flat_pallas(
                m, c, col, op,
                proj.radii[0], proj.depths[0], tap, W, H, tile, 12, 512, True)
            return jnp.sum(img ** 2) + jnp.sum(a)

        def loss_jax(m, c, col, op):
            img, a = rasterize_binned_jax(m, c, col, op, bins, W, H, tile)
            return jnp.sum(img ** 2) + jnp.sum(a)

        gf = jax.grad(loss_flat, argnums=(0, 1, 2, 3))(m2d, con, colors, opac)
        gj = jax.grad(loss_jax, argnums=(0, 1, 2, 3))(m2d, con, colors, opac)
        for a, b in zip(gf, gj):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-3, rtol=1e-3)

    def test_grad_multi_chunk(self, rng):
        # several chunks per tile: exercises the sweep-B cum/logt carries
        from hunyuanworld_mirror_tpu.ops.rasterizer_pallas import (
            rasterize_flat_pallas)

        proj, bins, colors, opac, (W, H, tile) = _setup(rng, n=400, mpt=1024)
        m2d, con = proj.means2d[0], proj.conics[0]
        tap = jnp.zeros_like(m2d)

        def loss_flat(m, col):
            img, a, _ = rasterize_flat_pallas(
                m, con, col, opac, proj.radii[0], proj.depths[0], tap,
                W, H, tile, 12, 1024, True)
            return jnp.sum(jnp.sin(img)) + jnp.sum(a ** 2)

        def loss_jax(m, col):
            img, a = rasterize_binned_jax(m, con, col, opac, bins, W, H, tile)
            return jnp.sum(jnp.sin(img)) + jnp.sum(a ** 2)

        gf = jax.grad(loss_flat, argnums=(0, 1))(m2d, colors)
        gj = jax.grad(loss_jax, argnums=(0, 1))(m2d, colors)
        for a, b in zip(gf, gj):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-3, rtol=1e-3)

    def test_absgrad_tap(self, rng):
        # absgrad = sum_pixels |dL/dmeans2d|: elementwise >= |signed grad|,
        # zero exactly where the signed grad has no contributing pixels
        from hunyuanworld_mirror_tpu.ops.rasterizer_pallas import (
            rasterize_flat_pallas)

        proj, bins, colors, opac, (W, H, tile) = _setup(rng, n=60)
        m2d, con = proj.means2d[0], proj.conics[0]

        def loss(m, tap):
            img, a, _ = rasterize_flat_pallas(
                m, con, colors, opac, proj.radii[0], proj.depths[0], tap,
                W, H, tile, 12, 512, True)
            return jnp.sum(img ** 2) + jnp.sum(a)

        gm, gabs = jax.grad(loss, argnums=(0, 1))(m2d, jnp.zeros_like(m2d))
        gm, gabs = np.asarray(gm), np.asarray(gabs)
        assert gabs.shape == gm.shape
        assert np.all(gabs >= np.abs(gm) - 1e-5)
        assert np.any(gabs > 0)
        # a splat rasterized to no pixel (culled: radii == 0) must have an
        # exactly-zero absgrad
        culled = np.asarray(proj.radii[0].min(axis=-1) <= 0)
        if culled.any():
            assert np.all(gabs[culled] == 0.0)
        # and wherever the signed mean-grad is zero in BOTH components the
        # splat contributed no pixel, so the abs accumulation is zero too
        no_contrib = np.all(gm == 0.0, axis=-1)
        assert np.all(gabs[no_contrib] == 0.0)


class TestMultiCameraBatch:
    """Camera-batched binning + flat kernel vs the per-camera path."""

    def test_bins_match_per_camera(self, rng):
        means, quats, scales, opac, colors, viewmats, Ks = _random_scene(
            rng, n=200, c=3)
        covars = projection.quat_scale_to_covar_planes(
            jnp.asarray(quats), jnp.asarray(scales))
        W, H, tile = 64, 48, 16
        proj = projection.fully_fused_projection(
            jnp.asarray(means), covars, jnp.asarray(viewmats),
            jnp.asarray(Ks), W, H)
        tw, th = (W + tile - 1) // tile, (H + tile - 1) // tile
        n_tiles = tw * th
        C, N = proj.depths.shape
        op = jnp.broadcast_to(jnp.asarray(opac)[None], (C, N))
        vals_multi = (proj.means2d[..., 0], proj.means2d[..., 1],
                      proj.conics[..., 0], proj.conics[..., 1],
                      proj.conics[..., 2], op)
        fl_m = tiles.bin_gaussians_packed_multi(
            proj.means2d, proj.radii, proj.depths, vals_multi, tile, tw, th,
            max_tiles_per_gauss=8, max_per_tile=512, with_ids=True)
        assert fl_m.starts.shape == (C * n_tiles,)

        for c in range(C):
            vals_c = tuple(v[c] for v in vals_multi)
            fl_c = tiles.bin_gaussians_packed(
                proj.means2d[c], proj.radii[c], proj.depths[c], vals_c,
                tile, tw, th, max_tiles_per_gauss=8, max_per_tile=512,
                with_ids=True)
            s_m = fl_m.starts[c * n_tiles:(c + 1) * n_tiles]
            c_m = fl_m.counts[c * n_tiles:(c + 1) * n_tiles]
            np.testing.assert_array_equal(np.asarray(c_m),
                                          np.asarray(fl_c.counts))
            # per-tile entry sets agree (depth quantization differs — the
            # multi key has fewer depth bits — so within-tile ORDER may
            # permute at quantization ties; compare as sets per tile)
            for t in range(n_tiles):
                n_t = int(fl_c.counts[t])
                if n_t == 0:
                    continue
                ids_c = np.sort(np.asarray(
                    fl_c.gauss_ids[int(fl_c.starts[t]):int(fl_c.starts[t]) + n_t]))
                ids_m = np.sort(np.asarray(
                    fl_m.gauss_ids[int(s_m[t]):int(s_m[t]) + n_t]))
                np.testing.assert_array_equal(ids_m, ids_c)

    def test_multi_forward_matches_jax(self, rng):
        from hunyuanworld_mirror_tpu.ops.rasterizer_pallas import (
            rasterize_flat_pallas_multi)

        means, quats, scales, opac, colors, viewmats, Ks = _random_scene(
            rng, n=150, c=2)
        covars = projection.quat_scale_to_covar_planes(
            jnp.asarray(quats), jnp.asarray(scales))
        W, H, tile = 64, 48, 16
        proj = projection.fully_fused_projection(
            jnp.asarray(means), covars, jnp.asarray(viewmats),
            jnp.asarray(Ks), W, H)
        C, N = proj.depths.shape
        colors_j = jnp.asarray(colors)
        col_all = jnp.concatenate([
            jnp.broadcast_to(colors_j[None], (C, N, 3)),
            proj.depths[..., None]], -1)
        op = jnp.broadcast_to(jnp.asarray(opac)[None], (C, N))

        out_m, a_m, _ = rasterize_flat_pallas_multi(
            proj.means2d, proj.conics, col_all, op, proj.radii, proj.depths,
            W, H, tile, 8, 512, interpret=True)

        tw, th = (W + tile - 1) // tile, (H + tile - 1) // tile
        for c in range(C):
            bins = tiles.bin_gaussians(proj.means2d[c], proj.radii[c],
                                       proj.depths[c], tile, tw, th,
                                       max_tiles_per_gauss=8, max_per_tile=512)
            img_j, a_j = rasterize_binned_jax(
                proj.means2d[c], proj.conics[c], col_all[c], op[c], bins,
                W, H, tile)
            np.testing.assert_allclose(np.asarray(out_m[c]),
                                       np.asarray(img_j), atol=1e-3,
                                       rtol=1e-3)
            np.testing.assert_allclose(np.asarray(a_m[c]), np.asarray(a_j),
                                       atol=1e-3)

    def test_rasterize_camera_batch_flag_cpu_fallback(self, rng):
        # on CPU impl="pallas" falls back to "jax"; camera_batch must not
        # change results or crash
        from hunyuanworld_mirror_tpu.ops.rasterizer import rasterize
        means, quats, scales, opac, colors, viewmats, Ks = _random_scene(
            rng, n=80, c=2)
        a = rasterize(jnp.asarray(means), jnp.asarray(quats),
                      jnp.asarray(scales), jnp.asarray(opac),
                      jnp.asarray(colors), jnp.asarray(viewmats),
                      jnp.asarray(Ks), 64, 48, max_per_tile=512,
                      camera_batch=True)[0]
        b = rasterize(jnp.asarray(means), jnp.asarray(quats),
                      jnp.asarray(scales), jnp.asarray(opac),
                      jnp.asarray(colors), jnp.asarray(viewmats),
                      jnp.asarray(Ks), 64, 48, max_per_tile=512)[0]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


class TestF16Payload:
    """f16-packed isect-sort payload (inference knob): parity within f16
    rounding of the f32 path; means2d stay exact."""

    def test_pack_roundtrip(self, rng):
        from hunyuanworld_mirror_tpu.ops.rasterizer_pallas import (
            pack_f16_pairs, _unpack_f16_row)
        a = jnp.asarray(rng.normal(size=(1, 256)).astype(np.float32))
        b = jnp.asarray(rng.uniform(0.001, 5, size=(1, 256)).astype(np.float32))
        packed = pack_f16_pairs(a, b)
        hi, lo = _unpack_f16_row(packed)
        np.testing.assert_allclose(np.asarray(hi),
                                   np.asarray(a.astype(jnp.float16), np.float32),
                                   rtol=0, atol=0)
        np.testing.assert_allclose(np.asarray(lo),
                                   np.asarray(b.astype(jnp.float16), np.float32),
                                   rtol=0, atol=0)

    def test_forward_close_to_f32(self, rng):
        from hunyuanworld_mirror_tpu.ops.rasterizer_pallas import (
            rasterize_flat_pallas)
        means, quats, scales, opac, colors, viewmats, Ks = _random_scene(
            rng, n=150, c=1)
        covars = projection.quat_scale_to_covar_planes(
            jnp.asarray(quats), jnp.asarray(scales))
        W, H, tile = 64, 48, 16
        proj = projection.fully_fused_projection(
            jnp.asarray(means), covars, jnp.asarray(viewmats),
            jnp.asarray(Ks), W, H)
        col = jnp.concatenate([jnp.asarray(colors),
                               proj.depths[0][:, None]], -1)
        tap = jnp.zeros_like(proj.means2d[0])
        args = (proj.means2d[0], proj.conics[0], col, jnp.asarray(opac),
                proj.radii[0], proj.depths[0], tap, W, H, tile, 8, 512)
        img32, a32, _ = rasterize_flat_pallas(*args, True, False)
        img16, a16, _ = rasterize_flat_pallas(*args, True, True)
        # f16 conic/opacity/color rounding: ~1e-3 relative
        np.testing.assert_allclose(np.asarray(img16), np.asarray(img32),
                                   atol=2e-2, rtol=2e-2)
        np.testing.assert_allclose(np.asarray(a16), np.asarray(a32),
                                   atol=1e-2)
        d = np.abs(np.asarray(img16) - np.asarray(img32))
        assert float(np.median(d)) < 2e-3


class TestPrefixBinning:
    """Coverage-scheduled binning (tiles.bin_gaussians_packed_prefix):
    bit-identical to the classic dense-slot expansion at full prefixes,
    honest drop accounting under tight prefixes, and render parity through
    the flat kernel."""

    def _bin_inputs(self, rng, n=800, W=160, H=160, tile=16, rmax=20):
        m2d = jnp.asarray(rng.uniform(-10, W + 10, (n, 2)).astype(np.float32))
        rad = jnp.asarray(rng.integers(0, rmax, (n, 2)).astype(np.int32))
        rad = rad.at[::7].set(0)  # some culled splats
        dep = jnp.asarray(rng.uniform(0.1, 9.0, n).astype(np.float32))
        vals = tuple(jnp.asarray(rng.normal(size=n).astype(np.float32))
                     for _ in range(3))
        tw, th = (W + tile - 1) // tile, (H + tile - 1) // tile
        return m2d, rad, dep, vals, tile, tw, th

    def test_full_fracs_match_classic(self, rng):
        m2d, rad, dep, vals, tile, tw, th = self._bin_inputs(rng)
        classic = tiles.bin_gaussians_packed(m2d, rad, dep, vals, tile, tw,
                                             th, 9, 4096)
        prefix = tiles.bin_gaussians_packed_prefix(
            m2d, rad, dep, vals, tile, tw, th, 9, 4096, slot_fracs=(1.0,) * 9)
        assert int(classic.n_dropped) == int(prefix.n_dropped)
        np.testing.assert_array_equal(np.asarray(classic.counts),
                                      np.asarray(prefix.counts))
        # per-tile payload multisets identical (order may differ on exact
        # (tile, quantized-depth) ties — both deterministic)
        for t in range(tw * th):
            c = np.sort(np.asarray(
                classic.packed[0][classic.starts[t]:
                                  classic.starts[t] + classic.counts[t]]))
            p = np.sort(np.asarray(
                prefix.packed[0][prefix.starts[t]:
                                 prefix.starts[t] + prefix.counts[t]]))
            np.testing.assert_array_equal(c, p)

    def test_tight_fracs_count_drops(self, rng):
        m2d, rad, dep, vals, tile, tw, th = self._bin_inputs(rng)
        classic = tiles.bin_gaussians_packed(m2d, rad, dep, vals, tile, tw,
                                             th, 9, 4096)
        # align=64 so tiny-N prefixes actually bite
        tight = tiles.bin_gaussians_packed_prefix(
            m2d, rad, dep, vals, tile, tw, th, 9, 4096,
            slot_fracs=(1.0, 0.25, 0.125, 0.125, 0.0625, 0.0625, 0.0625,
                        0.0625, 0.0625), align=64)
        lost = int(jnp.sum(classic.counts) - jnp.sum(tight.counts))
        assert lost > 0
        assert int(tight.n_dropped) == int(classic.n_dropped) + lost

    def test_render_parity_generous_fracs(self, rng):
        from hunyuanworld_mirror_tpu.ops.rasterizer_pallas import (
            rasterize_flat_pallas)
        means, quats, scales, opac, colors, viewmats, Ks = _random_scene(
            rng, n=150, c=1)
        covars = projection.quat_scale_to_covar_planes(
            jnp.asarray(quats), jnp.asarray(scales))
        W, H, tile = 64, 48, 16
        proj = projection.fully_fused_projection(
            jnp.asarray(means), covars, jnp.asarray(viewmats),
            jnp.asarray(Ks), W, H)
        col = jnp.concatenate([jnp.asarray(colors),
                               proj.depths[0][:, None]], -1)
        tap = jnp.zeros_like(proj.means2d[0])
        args = (proj.means2d[0], proj.conics[0], col, jnp.asarray(opac),
                proj.radii[0], proj.depths[0], tap, W, H, tile, 8, 512)
        img_c, a_c, d_c = rasterize_flat_pallas(*args, True, False, None)
        img_p, a_p, d_p = rasterize_flat_pallas(*args, True, False, (1.0,) * 8)
        assert int(d_c) == int(d_p)
        np.testing.assert_allclose(np.asarray(img_p), np.asarray(img_c),
                                   atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(a_p), np.asarray(a_c),
                                   atol=1e-5)
