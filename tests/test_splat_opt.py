"""Splat post-optimization: loss decreases, densify/prune keeps shapes static."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hunyuanworld_mirror_tpu.training import splat_opt


def _scene(rng, n=80):
    means = rng.normal(size=(n, 3)).astype(np.float32) * 0.3
    means[:, 2] += 2.0
    quats = np.tile([1.0, 0, 0, 0], (n, 1)).astype(np.float32)  # wxyz identity
    scales = np.full((n, 3), 0.05, np.float32)
    opac = np.full((n,), 0.8, np.float32)
    sh = rng.normal(size=(n, 1, 3)).astype(np.float32) * 0.3
    splats = {"means": means, "quats": quats, "scales": scales,
              "opacities": opac, "sh": sh}
    c2w = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
    c2w[1, 0, 3] = 0.1
    K = np.tile(np.array([[40.0, 0, 16], [0, 40.0, 16], [0, 0, 1]],
                         dtype=np.float32), (2, 1, 1))
    return splats, c2w, K


class TestSplatOpt:
    def test_loss_decreases(self, rng):
        splats, c2w, K = _scene(rng)
        W = H = 32
        # target: render of a perturbed copy (so the optimum is reachable)
        target_splats = dict(splats)
        target_splats["sh"] = splats["sh"] + 0.5
        from hunyuanworld_mirror_tpu.training.splat_opt import (
            SplatOptConfig, _raw_from_splats, render_splats)
        from hunyuanworld_mirror_tpu.utils import camera as cam_utils
        cfg = SplatOptConfig(iters=30, refine_start=1000, max_per_tile=512,
                             tile_size=16)
        raw_t = _raw_from_splats({k: jnp.asarray(v) for k, v in target_splats.items()},
                                 splats["means"].shape[0])
        viewmats = cam_utils.se3_inverse(jnp.asarray(c2w))
        gt, _, _ = render_splats(raw_t, viewmats, jnp.asarray(K), W, H, cfg)
        gt_rgb = np.asarray(gt[..., :3])

        logs = []
        out = splat_opt.optimize_splats(splats, gt_rgb, c2w, K, cfg,
                                        log_fn=lambda s: logs.append(s))
        # re-render optimized splats and compare photometric error to the start
        raw_0 = _raw_from_splats({k: jnp.asarray(v) for k, v in splats.items()},
                                 splats["means"].shape[0])
        start, _, _ = render_splats(raw_0, viewmats, jnp.asarray(K), W, H, cfg)
        raw_f = _raw_from_splats({k: jnp.asarray(v) for k, v in out.items()},
                                 out["means"].shape[0])
        final, _, _ = render_splats(raw_f, viewmats, jnp.asarray(K), W, H, cfg)
        err0 = float(jnp.abs(start[..., :3] - gt_rgb).mean())
        err1 = float(jnp.abs(final[..., :3] - gt_rgb).mean())
        assert err1 < err0 * 0.8, (err0, err1)

    def test_refine_keeps_capacity(self, rng):
        splats, c2w, K = _scene(rng, n=40)
        from hunyuanworld_mirror_tpu.training.splat_opt import (
            SplatOptConfig, _raw_from_splats, refine)
        cfg = SplatOptConfig()
        cap = 80
        raw = _raw_from_splats({k: jnp.asarray(v) for k, v in splats.items()}, cap)
        grads = jnp.asarray(rng.uniform(0, 0.001, size=(cap,)), jnp.float32)
        grads = grads.at[:10].set(0.01)  # 10 hot splats
        out = refine(raw, grads, cfg, jax.random.PRNGKey(0))
        assert out["means"].shape == (cap, 3)
        n_alive = int(jnp.sum(out["alive"] > 0.5))
        assert n_alive >= 40  # grew into free slots

    def test_pose_opt_recovers_perturbation(self, rng):
        """pose_opt=True: optimizing cam deltas against GT rendered from the
        TRUE cameras, starting from perturbed cameras, must beat the same run
        without pose_opt (reference simple_trainer:177-183, CameraOptModule)."""
        splats, c2w, K = _scene(rng)
        W = H = 32
        from hunyuanworld_mirror_tpu.training.splat_opt import (
            SplatOptConfig, _raw_from_splats, render_splats)
        from hunyuanworld_mirror_tpu.utils import camera as cam_utils

        cfg0 = SplatOptConfig(iters=0, max_per_tile=512)
        raw = _raw_from_splats({k: jnp.asarray(v) for k, v in splats.items()},
                               splats["means"].shape[0])
        vm_true = cam_utils.se3_inverse(jnp.asarray(c2w))
        gt, _, _ = render_splats(raw, vm_true, jnp.asarray(K), W, H, cfg0)
        gt_rgb = np.asarray(gt[..., :3])

        c2w_bad = c2w.copy()
        c2w_bad[:, :3, 3] += rng.normal(size=(2, 3)).astype(np.float32) * 0.02

        def run(pose_opt):
            cfg = SplatOptConfig(iters=40, refine_start=10_000,
                                 max_per_tile=512, pose_opt=pose_opt,
                                 pose_opt_lr=5e-3,
                                 # freeze splats: isolate the camera effect
                                 lr_means=0.0, lr_scales=0.0, lr_quats=0.0,
                                 lr_opacities=0.0, lr_sh=0.0)
            out = splat_opt.optimize_splats(splats, gt_rgb, c2w_bad, K, cfg,
                                            log_fn=lambda s: None)
            vm = cam_utils.se3_inverse(
                jnp.asarray(out.get("c2w_opt", c2w_bad)))
            img, _, _ = render_splats(raw, vm, jnp.asarray(K), W, H, cfg0)
            return float(jnp.abs(img[..., :3] - gt_rgb).mean()), out

        err_off, _ = run(False)
        err_on, out = run(True)
        assert "c2w_opt" in out
        assert err_on < err_off * 0.8, (err_on, err_off)

    def test_apply_cam_deltas_identity(self, rng):
        from hunyuanworld_mirror_tpu.training.splat_opt import apply_cam_deltas
        from hunyuanworld_mirror_tpu.utils import camera as cam_utils
        c2w = np.tile(np.eye(4, dtype=np.float32), (3, 1, 1))
        c2w[:, :3, 3] = rng.normal(size=(3, 3)).astype(np.float32)
        vm = cam_utils.se3_inverse(jnp.asarray(c2w))
        out = apply_cam_deltas(vm, jnp.zeros((3, 9)))
        np.testing.assert_allclose(np.asarray(out), np.asarray(vm), atol=1e-5)

    def test_depth_loss_and_regs_smoke(self, rng):
        """depth_loss + random_bkgd + opacity/scale regs: loss finite and the
        depth term pulls rendered depth toward GT."""
        splats, c2w, K = _scene(rng)
        W = H = 32
        from hunyuanworld_mirror_tpu.training.splat_opt import (
            SplatOptConfig, _raw_from_splats, render_splats)
        from hunyuanworld_mirror_tpu.utils import camera as cam_utils
        cfg0 = SplatOptConfig(iters=0, max_per_tile=512)
        raw = _raw_from_splats({k: jnp.asarray(v) for k, v in splats.items()},
                               splats["means"].shape[0])
        vm = cam_utils.se3_inverse(jnp.asarray(c2w))
        gt, _, _ = render_splats(raw, vm, jnp.asarray(K), W, H, cfg0)
        gt_rgb = np.asarray(gt[..., :3])
        gt_depth = np.asarray(gt[..., 3])

        cfg = SplatOptConfig(iters=15, refine_start=10_000, max_per_tile=512,
                             depth_loss=True, depth_lambda=1e-2,
                             random_bkgd=True, opacity_reg=0.01,
                             scale_reg=0.01)
        out = splat_opt.optimize_splats(splats, gt_rgb, c2w, K, cfg,
                                        depths=gt_depth,
                                        log_fn=lambda s: None)
        for v in out.values():
            assert np.isfinite(v).all()


class TestColmapDataset:
    def test_roundtrip_and_normalize(self, rng, tmp_path):
        """Write a tiny reconstruction with io/colmap's writers, parse it
        back with training/colmap_dataset, check cameras/points and the
        normalization invariants (median camera distance 1, principal axes
        aligned)."""
        from hunyuanworld_mirror_tpu.io import colmap as cio
        from hunyuanworld_mirror_tpu.training import colmap_dataset as cds

        sparse = tmp_path / "sparse" / "0"
        sparse.mkdir(parents=True)
        n_cams = 6
        # cameras on a ring looking inward
        c2w_true = []
        for i in range(n_cams):
            a = 2 * np.pi * i / n_cams
            pos = np.array([2 * np.cos(a), 0.3, 2 * np.sin(a)])
            fwd = -pos / np.linalg.norm(pos)
            up = np.array([0.0, -1.0, 0.0])
            right = np.cross(up, fwd); right /= np.linalg.norm(right)
            upv = np.cross(fwd, right)
            c2w = np.eye(4)
            c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, upv, fwd, pos
            c2w_true.append(c2w)
        c2w_true = np.stack(c2w_true)

        cio.write_cameras_bin(str(sparse / "cameras.bin"), [
            {"camera_id": 1, "model": "PINHOLE", "width": 64, "height": 48,
             "params": [60.0, 60.0, 32.0, 24.0]}])
        ims = []
        for i, c2w in enumerate(c2w_true):
            w2c = np.linalg.inv(c2w)
            R = w2c[:3, :3]
            qv = cio._rotmat_to_qvec_wxyz(R)
            ims.append({"image_id": i + 1, "qvec": qv, "tvec": w2c[:3, 3],
                        "camera_id": 1, "name": f"img_{i:02d}.png"})
        cio.write_images_bin(str(sparse / "images.bin"), ims)
        pts = rng.normal(size=(50, 3)) * 0.5
        cio.write_points3d_bin(str(sparse / "points3D.bin"), [
            {"id": j, "xyz": pts[j], "rgb": (10, 20, 30)} for j in range(50)])

        scene = cds.parse_colmap(str(tmp_path))
        assert len(scene.image_names) == n_cams
        assert scene.image_names == sorted(scene.image_names)
        np.testing.assert_allclose(scene.c2w, c2w_true, atol=1e-5)
        np.testing.assert_allclose(scene.Ks[0],
                                   [[60, 0, 32], [0, 60, 24], [0, 0, 1]],
                                   atol=1e-6)
        assert scene.points.shape == (50, 3)

        norm = cds.parse_colmap(str(tmp_path), normalize=True)
        # similarity_from_cameras scales the median camera distance to ~1
        d = np.linalg.norm(norm.c2w[:, :3, 3]
                           - np.median(norm.c2w[:, :3, 3], 0), axis=1)
        assert 0.3 < np.median(d) < 3.0
        # rotations stay orthonormal after the similarity transform
        RtR = np.einsum("nij,nik->njk", norm.c2w[:, :3, :3],
                        norm.c2w[:, :3, :3])
        np.testing.assert_allclose(RtR, np.tile(np.eye(3), (n_cams, 1, 1)),
                                   atol=1e-4)
        # points follow the same transform (relative geometry preserved up to
        # scale): pairwise distance ratios constant
        r0 = np.linalg.norm(pts[0] - pts[1]) / np.linalg.norm(pts[2] - pts[3])
        r1 = (np.linalg.norm(norm.points[0] - norm.points[1])
              / np.linalg.norm(norm.points[2] - norm.points[3]))
        np.testing.assert_allclose(r0, r1, rtol=1e-4)

    def test_split(self):
        from hunyuanworld_mirror_tpu.training import colmap_dataset as cds
        scene = cds.ColmapScene(
            [f"i{i}" for i in range(10)], [""] * 10,
            np.tile(np.eye(4, dtype=np.float32), (10, 1, 1)),
            np.tile(np.eye(3, dtype=np.float32), (10, 1, 1)),
            np.zeros((10, 2), np.int64), np.zeros((0, 3), np.float32),
            np.zeros((0, 3), np.uint8))
        train, test = scene.split(test_every=4)
        assert list(test) == [0, 4, 8]
        assert len(train) == 7 and not set(train) & set(test)


class TestBilateralGrid:
    def test_identity_grid_is_identity(self, rng):
        from hunyuanworld_mirror_tpu.training import bilagrid
        g = bilagrid.init_bilateral_grids(2)
        imgs = jnp.asarray(rng.uniform(size=(2, 12, 16, 3)).astype(np.float32))
        out = bilagrid.slice_image_grids(g, imgs)
        np.testing.assert_allclose(np.asarray(out), np.asarray(imgs),
                                   atol=1e-6)
        assert float(bilagrid.total_variation_loss(g)) == 0.0

    def test_grid_learns_brightness_shift(self, rng):
        """A constant color offset between render and GT must be absorbable
        by the grid's affine bias channel."""
        from hunyuanworld_mirror_tpu.training import bilagrid
        import optax
        img = jnp.asarray(rng.uniform(0.2, 0.6,
                                      size=(1, 12, 16, 3)).astype(np.float32))
        target = jnp.clip(img + 0.2, 0, 1)
        grids = bilagrid.init_bilateral_grids(1, 8, 8, 4)
        tx = optax.adam(5e-2)
        state = tx.init(grids)

        @jax.jit
        def step(g, s):
            def loss_fn(g):
                out = bilagrid.slice_image_grids(g, img)
                return jnp.mean((out - target) ** 2)
            l, gr = jax.value_and_grad(loss_fn)(g)
            up, s = tx.update(gr, s)
            return optax.apply_updates(g, up), s, l

        l0 = None
        for i in range(60):
            grids, state, l = step(grids, state)
            if l0 is None:
                l0 = float(l)
        assert float(l) < l0 * 0.05, (l0, float(l))

    def test_splat_opt_with_bilgrid_smoke(self, rng):
        splats, c2w, K = _scene(rng)
        from hunyuanworld_mirror_tpu.training.splat_opt import (
            SplatOptConfig, _raw_from_splats, render_splats)
        from hunyuanworld_mirror_tpu.utils import camera as cam_utils
        cfg0 = SplatOptConfig(iters=0, max_per_tile=512)
        raw = _raw_from_splats({k: jnp.asarray(v) for k, v in splats.items()},
                               splats["means"].shape[0])
        vm = cam_utils.se3_inverse(jnp.asarray(c2w))
        gt, _, _ = render_splats(raw, vm, jnp.asarray(K), 32, 32, cfg0)
        cfg = SplatOptConfig(iters=10, refine_start=5, refine_every=5,
                             refine_stop=100, max_per_tile=512,
                             use_bilateral_grid=True,
                             bilateral_grid_shape=(8, 8, 4))
        out = splat_opt.optimize_splats(splats, np.asarray(gt[..., :3]),
                                        c2w, K, cfg, log_fn=lambda s: None)
        for v in out.values():
            assert np.isfinite(v).all()


def test_splat_opt_tb_logging(rng, tmp_path):
    """tb_logdir: scalar + image events land in a readable events file."""
    from hunyuanworld_mirror_tpu.training import tb_writer
    splats, c2w, K = _scene(rng, n=40)
    imgs = rng.uniform(size=(2, 32, 32, 3)).astype(np.float32)
    cfg = splat_opt.SplatOptConfig(iters=4, refine_start=1000,
                                   max_per_tile=512, tb_every=2,
                                   tb_save_image=True)
    splat_opt.optimize_splats(splats, imgs, c2w, K, cfg,
                              log_fn=lambda s: None,
                              tb_logdir=str(tmp_path))
    import glob
    (path,) = glob.glob(str(tmp_path / "events.out.tfevents.*"))
    scalars = tb_writer.read_scalars(path)
    steps = [s for s, v in scalars if "train/loss" in v]
    assert steps == [2, 4], steps
    images = tb_writer.read_images(path)
    assert [(s, t) for s, t, _ in images] == [
        (2, "train/render_vs_gt"), (4, "train/render_vs_gt")]
    assert images[0][2].shape == (32, 64, 3)


def test_splat_opt_inloop_eval(rng):
    """cfg.eval_every + eval_data: PSNR/SSIM rows logged at the cadence and
    returned as eval_history (reference eval_steps loop,
    simple_trainer_worldmirror.py:1005)."""
    splats, c2w, K = _scene(rng, n=40)
    imgs = rng.uniform(size=(2, 32, 32, 3)).astype(np.float32)
    cfg = splat_opt.SplatOptConfig(iters=6, refine_start=1000,
                                   max_per_tile=512, eval_every=3)
    logs = []
    out = splat_opt.optimize_splats(
        splats, imgs, c2w, K, cfg, log_fn=logs.append,
        eval_data=(imgs[:1], c2w[:1], K[:1]))
    hist = out["eval_history"]
    assert hist.shape == (2, 3) and list(hist[:, 0]) == [3, 6]
    assert np.isfinite(hist[:, 1:]).all()
    assert sum("splat-opt eval @" in s for s in logs) == 2


def test_splat_opt_live_viewer(rng, tmp_path):
    """viewer + cfg.viewer_every: snapshots published during optimization,
    servable over the sidecar's endpoints (reference in-training viser loop
    :1310-1334)."""
    import json
    import urllib.request

    from hunyuanworld_mirror_tpu.training.live_viewer import LiveViewer

    splats, c2w, K = _scene(rng, n=40)
    imgs = rng.uniform(size=(2, 32, 32, 3)).astype(np.float32)
    lv = LiveViewer(str(tmp_path / "live"))
    try:
        cfg = splat_opt.SplatOptConfig(iters=4, refine_start=1000,
                                       max_per_tile=512, viewer_every=2)
        splat_opt.optimize_splats(splats, imgs, c2w, K, cfg,
                                  log_fn=lambda s: None, viewer=lv)
        st = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{lv.port}/out/live/live_status.json").read())
        assert st["step"] == 4 and st["version"] >= 2 and st["num_gs"] == 40
        blob = urllib.request.urlopen(
            f"http://127.0.0.1:{lv.port}/out/live/live.splat").read()
        assert len(blob) == 40 * 32  # 32-byte records, all splats alive
        page = urllib.request.urlopen(
            f"http://127.0.0.1:{lv.port}/viewer").read().decode()
        assert 'PARAMS.get("mode") || "live"' in page  # live default
        assert "live_status.json" in page and "live.splat" in page
    finally:
        lv.close()


def test_splat_opt_compression_stage(rng, tmp_path):
    """Optimized splats survive the PNG compression round-trip the --compress
    trainer stage runs (reference compression step :1293-1300)."""
    from hunyuanworld_mirror_tpu.io import compression

    splats, c2w, K = _scene(rng, n=64)
    imgs = rng.uniform(size=(2, 32, 32, 3)).astype(np.float32)
    cfg = splat_opt.SplatOptConfig(iters=2, refine_start=1000,
                                   max_per_tile=512)
    out = splat_opt.optimize_splats(splats, imgs, c2w, K, cfg,
                                    log_fn=lambda s: None)
    op = np.clip(out["opacities"], 1e-6, 1 - 1e-6)
    cdir = str(tmp_path / "compressed")
    compression.compress(cdir, {
        "means": out["means"],
        "scales": np.log(np.maximum(out["scales"], 1e-12)),
        "quats": out["quats"],
        "opacities": np.log(op / (1 - op)),
        "sh": out["sh"]})
    back = compression.decompress(cdir)
    n = back["means"].shape[0]
    assert n == int(np.sqrt(len(out["means"]))) ** 2
    assert np.isfinite(back["means"]).all()
    # morton sort reorders rows; the quantized coordinate SET must round-trip
    lo = np.sort(out["means"][:, 0])[:n]
    assert abs(float(np.median(np.sort(back["means"][:, 0]))
                     - np.median(lo))) < 0.2
