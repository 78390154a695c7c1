"""Target generation + peak decoding + shard tooling (fork-stack parity).

Oracles: geometric invariants pinned to the reference semantics
(preprocessing/utils.py, training/data/datasets/utils.py:203-295)."""

import subprocess
import sys
import tarfile
from pathlib import Path

import numpy as np
import pytest

from hunyuanworld_mirror_tpu import preprocessing as prep


def _disc_mask(H, W, cy, cx, r):
    yy, xx = np.mgrid[0:H, 0:W]
    return ((yy - cy) ** 2 + (xx - cx) ** 2) <= r * r


def test_heatmap_peak_at_centroid():
    mask = _disc_mask(64, 64, 20, 40, 8)
    heat = prep.compute_heatmap_from_mask(mask)
    assert heat.shape == (64, 64) and heat.max() == pytest.approx(1.0)
    y, x = np.unravel_index(np.argmax(heat), heat.shape)
    assert abs(y - 20) <= 1 and abs(x - 40) <= 1


def test_heatmap_tiny_mask_is_zero():
    mask = np.zeros((32, 32), bool)
    mask[5, 5] = True
    assert prep.compute_heatmap_from_mask(mask).max() == 0.0


def test_heatmap_projected_center_shifts_mean():
    mask = _disc_mask(64, 64, 32, 32, 10)
    K = np.array([[50.0, 0, 32], [0, 50.0, 32], [0, 0, 1]])
    t = np.array([0.2, 0.0, 1.0])  # projects to x = 32 + 10
    heat = prep.compute_heatmap_from_mask(mask, t, K)
    _, x = np.unravel_index(np.argmax(heat), heat.shape)
    assert 33 <= x <= 38  # mean of centroid (32) and projection (42)


def test_abspose_field_roundtrip(rng):
    H = W = 64
    masks = [_disc_mask(H, W, 16, 16, 8), _disc_mask(H, W, 48, 48, 8)]
    Rs, ts, ss = [], [], []
    for _ in range(2):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        x, y, z, w = q
        R = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)]])
        Rs.append(R.astype(np.float32))
        ts.append(rng.normal(size=3).astype(np.float32))
        ss.append(rng.uniform(0.05, 0.3, 3).astype(np.float32))

    heat, field = prep.make_targets(masks, Rs, ts, ss)
    assert heat.shape == (H, W)
    assert field.shape == (H // 2, W // 2, 12)

    peaks = prep.extract_peaks(heat, min_distance=5, min_confidence=0.3)
    assert len(peaks) == 2
    poses, sizes = prep.extract_poses_at_peaks(peaks, field, scale_factor=2)
    # match decoded poses to GT (peaks sorted by x: obj0 at x=16, obj1 at 48)
    for i in range(2):
        np.testing.assert_allclose(poses[i][:3, :3], Rs[i], atol=1e-4)
        np.testing.assert_allclose(poses[i][:3, 3], ts[i], atol=1e-5)
        np.testing.assert_allclose(sizes[i], ss[i], atol=1e-5)
        # decoded rotation is orthonormal
        np.testing.assert_allclose(poses[i][:3, :3] @ poses[i][:3, :3].T,
                                   np.eye(3), atol=1e-5)


def test_extract_peaks_min_distance():
    heat = np.zeros((32, 32), np.float32)
    heat[10, 10] = 1.0
    heat[12, 12] = 0.9   # suppressed: within min_distance of the stronger one
    heat[25, 25] = 0.8
    peaks = prep.extract_peaks(heat, min_distance=5, min_confidence=0.2)
    assert len(peaks) == 2
    assert (peaks == [10, 10]).all(axis=1).any()
    assert (peaks == [25, 25]).all(axis=1).any()


def test_wds_convert_roundtrip(tmp_path, rng):
    """convert -> list -> ShardedLoader stream -> extract roundtrip."""
    from PIL import Image
    from hunyuanworld_mirror_tpu.training.data import ShardedLoader

    src = tmp_path / "samples"
    src.mkdir()
    H = W = 32
    for i in range(6):
        Image.fromarray(
            (rng.uniform(0, 1, (H, W, 3)) * 255).astype(np.uint8)
        ).save(src / f"{i:06d}.color.png")
        np.savez_compressed(src / f"{i:06d}.heatmap.npz",
                            heatmap=rng.uniform(0, 1, (H, W)).astype(np.float32))
        np.savez_compressed(src / f"{i:06d}.pose_map.npz",
                            abs_pose=rng.normal(size=(H // 2, W // 2, 12)).astype(np.float32))

    out = tmp_path / "shards"
    r = subprocess.run(
        [sys.executable, "tools/wds_tools.py", "convert", str(src), str(out),
         "--shard-size", "4"], capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    shards = sorted(out.glob("*.tar"))
    assert len(shards) == 2

    loader = ShardedLoader(str(out / "shard-*.tar"), batch_size=3,
                           shuffle_buffer=1)
    batch = next(iter(loader.epoch(0)))
    assert batch["rgb"].shape == (3, H, W, 3)
    assert batch["heatmap"].shape == (3, H, W)
    assert batch["pose_map"].shape == (3, H // 2, W // 2, 12)

    ext = tmp_path / "extracted"
    r = subprocess.run(
        [sys.executable, "tools/wds_tools.py", "extract",
         *[str(s) for s in shards], str(ext)],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    assert len(list(ext.iterdir())) == 18  # 6 samples x 3 files
