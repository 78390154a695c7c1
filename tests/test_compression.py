"""Splat compression roundtrip + rasterize_to_indices.

Parity targets: gsplat/compression/png_compression.py (quantized PNG grids,
k-means SH) and csrc/RasterizeToIndices3DGS.cu (per-pixel splat enumeration)."""

import numpy as np
import jax.numpy as jnp
import pytest

from hunyuanworld_mirror_tpu.io import compression as comp
from hunyuanworld_mirror_tpu.ops import rasterizer


def _splats(rng, n):
    return {
        "means": rng.normal(0, 2, (n, 3)).astype(np.float32),
        "scales": rng.uniform(-5, -2, (n, 3)).astype(np.float32),   # log
        "quats": rng.normal(size=(n, 4)).astype(np.float32),
        "opacities": rng.uniform(-3, 3, n).astype(np.float32),      # logits
        "sh": rng.normal(0, 0.4, (n, 4, 3)).astype(np.float32),
        "weights": rng.uniform(0, 1, n).astype(np.float32),          # extra -> npz
    }


def test_compression_roundtrip(tmp_path, rng):
    splats = _splats(rng, 17 ** 2)
    meta = comp.compress(str(tmp_path), splats)
    assert meta["count"] == 17 ** 2
    out = comp.decompress(str(tmp_path))

    assert out["means"].shape == (289, 3)
    # means: 16-bit log-quantized -> tight
    order_err = np.sort(out["means"], 0) - np.sort(splats["means"], 0)
    assert np.abs(order_err).max() < 2e-3
    # 8-bit attributes: ~range/255 error, compared as sorted sets (the
    # compressor reorders splats by the Morton curve)
    for k in ("scales", "opacities"):
        a = np.sort(np.asarray(out[k]).reshape(-1))
        b = np.sort(splats[k].reshape(-1))
        rng_k = b.max() - b.min()
        assert np.abs(a - b).max() < rng_k / 100
    # extra key roundtrips via npz losslessly (as a sorted set)
    np.testing.assert_allclose(np.sort(out["weights"]),
                               np.sort(splats["weights"]), atol=1e-6)
    assert out["sh"].shape == (289, 4, 3)


def test_compression_crops_to_square(tmp_path, rng):
    splats = _splats(rng, 260)  # 16^2 = 256 -> drops 4 lowest-opacity
    comp.compress(str(tmp_path), splats)
    out = comp.decompress(str(tmp_path))
    assert len(out["means"]) == 256
    dropped = np.sort(splats["opacities"])[:4]
    assert np.sort(out["opacities"])[0] > dropped[-1] - 0.1


def test_compression_size_beats_npz(tmp_path, rng):
    import os
    splats = _splats(rng, 64 ** 2)
    comp.compress(str(tmp_path / "c"), {k: v for k, v in splats.items()
                                        if k != "weights"})
    total = sum(f.stat().st_size for f in (tmp_path / "c").iterdir())
    raw = sum(v.nbytes for k, v in splats.items() if k != "weights")
    assert total < raw * 0.45  # compression actually compresses


def test_rasterize_to_indices(rng):
    N = 64
    means = jnp.asarray(rng.uniform(-1, 1, (N, 3)) + [0, 0, 3.0], jnp.float32)
    quats = jnp.asarray(np.tile([0, 0, 0, 1.0], (N, 1)), jnp.float32)
    scales = jnp.full((N, 3), 0.05, jnp.float32)
    opac = jnp.full((N,), 0.8, jnp.float32)
    vm = jnp.eye(4, dtype=jnp.float32)[None]
    K = jnp.asarray([[[60.0, 0, 32], [0, 60.0, 32], [0, 0, 1]]], jnp.float32)

    ids, w = rasterizer.rasterize_to_indices(
        means, quats, scales, opac, vm, K, width=64, height=64, k=4)
    ids, w = np.asarray(ids), np.asarray(w)
    assert ids.shape == (1, 64, 64, 4) and w.shape == (1, 64, 64, 4)
    assert (ids >= -1).all() and (ids < N).all()
    # weights sorted descending per pixel, -1 ids carry zero weight
    assert (np.diff(w, axis=-1) <= 1e-6).all()
    assert (w[ids == -1] == 0).all()
    covered = ids[0, ..., 0] >= 0
    assert covered.mean() > 0.2

    # cross-check against the rendered alpha: sum of top-k weights where k
    # covers everything equals alpha
    ids_all, w_all = rasterizer.rasterize_to_indices(
        means, quats, scales, opac, vm, K, width=64, height=64, k=N)
    colors = jnp.ones((N, 3), jnp.float32)
    _, alpha, _ = rasterizer.rasterize(
        means, quats, scales, opac, colors, vm, K, width=64, height=64,
        render_mode="RGB", impl="jax")
    np.testing.assert_allclose(np.asarray(w_all).sum(-1),
                               np.asarray(alpha)[..., 0], atol=1e-4)
