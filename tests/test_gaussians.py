"""Voxel-prune / conf-filter parity vs a brute-force numpy oracle.

Oracle semantics follow reference src/models/models/rasterization.py:301-387
(torch.unique over quantized coords + weighted scatter_add merge); our
static-shape version leaves merged-away entries in the array as dead splats
(opacity 0) instead of compacting, so comparison is over the alive set.
"""

import numpy as np
import jax.numpy as jnp

from hunyuanworld_mirror_tpu.models import gaussians as G


def _rand_splats(rng, N, spread=0.01):
    return {
        "means": rng.uniform(-spread, spread, (1, N, 3)).astype(np.float32),
        "quats": rng.normal(size=(1, N, 4)).astype(np.float32),
        "scales": rng.uniform(1e-4, 1e-2, (1, N, 3)).astype(np.float32),
        "opacities": rng.uniform(0, 1, (1, N)).astype(np.float32),
        "sh": rng.normal(size=(1, N, 1, 3)).astype(np.float32),
        "weights": rng.uniform(0.01, 1, (1, N)).astype(np.float32),
    }


def _oracle(splats, vs):
    """Weighted merge per voxel, like reference prune_gs."""
    m = splats["means"][0]
    vox = np.floor(m / vs)
    vox -= vox.min(axis=0, keepdims=True)
    keys = [tuple(v) for v in vox.astype(np.int64)]
    groups = {}
    for i, k in enumerate(keys):
        groups.setdefault(k, []).append(i)
    out = []
    for k, idx in groups.items():
        w = splats["weights"][0][idx]
        ws = w.sum()
        if ws <= 1e-6:
            continue
        mean = (splats["means"][0][idx] * w[:, None]).sum(0) / ws
        scale = (splats["scales"][0][idx] * w[:, None]).sum(0) / ws
        sh = (splats["sh"][0][idx] * w[:, None, None]).sum(0) / ws
        q = (splats["quats"][0][idx] * w[:, None]).sum(0) / ws
        q = q / max(np.linalg.norm(q), 1e-8)
        op = (w * w).sum() / ws
        out.append((mean, scale, sh, q, op, ws))
    return out


def test_voxel_prune_matches_oracle():
    rng = np.random.default_rng(0)
    N = 256
    splats = _rand_splats(rng, N, spread=0.004)  # dense -> many collisions
    cfg = G.GSRendererConfig(voxel_size=0.002)
    jx = {k: jnp.asarray(v) for k, v in splats.items()}
    merged = {k: np.asarray(v) for k, v in G.voxel_prune(cfg, jx).items()}

    alive = merged["opacities"][0] > 0
    got = sorted(
        zip(merged["means"][0][alive].tolist(),
            merged["weights"][0][alive].tolist()),
        key=lambda t: t[0])
    want_raw = _oracle(splats, cfg.voxel_size)
    want = sorted(((m.tolist(), float(ws)) for m, _, _, _, _, ws in want_raw),
                  key=lambda t: t[0])
    assert len(got) == len(want), (len(got), len(want))
    for (gm, gw), (wm, ww) in zip(got, want):
        np.testing.assert_allclose(gm, wm, rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(gw, ww, rtol=1e-4)

    # full per-voxel attribute check via a means->oracle lookup
    lut = {tuple(np.round(m, 5)): (s, sh, q, op)
           for m, s, sh, q, op, _ in want_raw}
    for i in np.flatnonzero(alive):
        key = tuple(np.round(merged["means"][0][i], 5))
        assert key in lut
        s, sh, q, op = lut[key]
        np.testing.assert_allclose(merged["scales"][0][i], s, rtol=1e-3)
        np.testing.assert_allclose(merged["sh"][0][i], sh, rtol=1e-3, atol=1e-5)
        np.testing.assert_allclose(merged["quats"][0][i], q, rtol=1e-3, atol=1e-5)
        np.testing.assert_allclose(merged["opacities"][0][i], op, rtol=1e-3)


def test_voxel_prune_isolated_splats_pass_through():
    rng = np.random.default_rng(1)
    N = 64
    splats = _rand_splats(rng, N, spread=10.0)  # sparse -> no collisions
    cfg = G.GSRendererConfig(voxel_size=0.002)
    jx = {k: jnp.asarray(v) for k, v in splats.items()}
    merged = {k: np.asarray(v) for k, v in G.voxel_prune(cfg, jx).items()}
    alive = merged["opacities"][0] > 0
    assert alive.sum() == N
    got = np.sort(merged["means"][0][alive], axis=0)
    want = np.sort(splats["means"][0], axis=0)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_voxel_prune_dead_splats_stay_dead():
    rng = np.random.default_rng(2)
    splats = _rand_splats(rng, 32)
    splats["weights"][:] = 0.0
    splats["means"][:] = 1e12  # parked like confidence_filter does
    cfg = G.GSRendererConfig(voxel_size=0.002)
    jx = {k: jnp.asarray(v) for k, v in splats.items()}
    merged = G.voxel_prune(cfg, jx)
    assert np.asarray(merged["opacities"]).max() == 0.0


def test_position_from_variants():
    """prepare_splats position modes (reference rasterization.py:389-498)."""
    import jax
    from hunyuanworld_mirror_tpu.utils import camera as cam_utils

    rng = np.random.default_rng(0)
    B, S, H, W = 1, 2, 4, 4
    N = S * H * W
    imgs = jnp.asarray(rng.uniform(size=(B, S, H, W, 3)).astype(np.float32))

    # identity-ish cameras: vector = [t=0, quat xyzw=(0,0,0,1), fovs]
    cam_vec = np.zeros((B, S, 9), np.float32)
    cam_vec[..., 6] = 1.0
    cam_vec[..., 7:] = 0.9
    preds = {
        "camera_params": jnp.asarray(cam_vec),
        "pts3d": jnp.asarray(rng.normal(size=(B, S, H, W, 3)).astype(np.float32)),
        "depth": jnp.full((B, S, H, W, 1), 2.0),
        "gs_depth": jnp.full((B, S, H, W, 1), 3.0),
    }
    views = {
        "camera_pose": jnp.tile(jnp.eye(4), (B, S, 1, 1)),
        "camera_intrinsics": jnp.asarray(
            np.tile(np.array([[4.0, 0, 2], [0, 4.0, 2], [0, 0, 1]],
                             np.float32), (B, S, 1, 1))),
    }
    cfg0 = G.GSRendererConfig()
    key = jax.random.PRNGKey(0)
    params = G.init(key, cfg0)
    feat = jnp.asarray(rng.normal(size=(B * S, H, W, cfg0.raw_channels)).astype(np.float32))

    def prep(mode):
        import dataclasses
        cfg = dataclasses.replace(cfg0, position_from=mode)
        raw = jnp.asarray(rng.normal(size=(B * S, H, W, cfg.raw_channels)).astype(np.float32) * 0)
        return G.prepare_splats(cfg, raw, imgs, preds, views=views)

    # pts3d mode returns the point head verbatim (zero offsets)
    np.testing.assert_allclose(np.asarray(prep("pts3d")["means"]),
                               np.asarray(preds["pts3d"]).reshape(B, N, 3))

    # gt-camera mode: identity pose, depth 3.0 -> z == 3 everywhere
    m = np.asarray(prep("gsdepth+gtcamera")["means"]).reshape(B, S, H, W, 3)
    np.testing.assert_allclose(m[..., 2], 3.0, atol=1e-6)

    # preddepth vs gsdepth differ by the depth scale (2 vs 3) through the
    # same predicted camera
    mp = np.asarray(prep("preddepth+predcamera")["means"])
    mg = np.asarray(prep("gsdepth+predcamera")["means"])
    np.testing.assert_allclose(mp * 1.5, mg, atol=1e-5)


def test_compact_reports_dropped_live_splats():
    """compact_splats surfaces the live-splats-beyond-cap count instead of
    silently truncating (round-1 VERDICT weak #8)."""
    rng = np.random.default_rng(7)
    N = 2048
    splats = _rand_splats(rng, N, spread=1.0)  # well-separated: all live
    cfg = G.GSRendererConfig(feature_dim=32, compact_fraction=0.25)
    out = G.compact_splats(cfg, {k: jnp.asarray(v) for k, v in splats.items()})
    cap = out["means"].shape[1]
    assert cap == 512
    assert int(out["n_compact_dropped"][0]) == N - cap
    # survivors are the highest-weight ones
    w_sorted = np.sort(splats["weights"][0])[::-1]
    np.testing.assert_allclose(np.sort(np.asarray(out["weights"][0]))[::-1],
                               w_sorted[:cap], rtol=1e-6)


def test_compact_no_drop_when_under_cap():
    rng = np.random.default_rng(8)
    splats = _rand_splats(rng, 1024, spread=1.0)
    splats["weights"][0, 512:] = 0.0  # half dead
    cfg = G.GSRendererConfig(feature_dim=32, compact_fraction=0.5)
    out = G.compact_splats(cfg, {k: jnp.asarray(v) for k, v in splats.items()})
    assert int(out["n_compact_dropped"][0]) == 0
