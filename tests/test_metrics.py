"""Eval metrics: Umeyama sim(3), ATE/RPE, Acc/Comp, NVS PSNR/SSIM."""

import numpy as np
import pytest

from hunyuanworld_mirror_tpu.utils import metrics


def _rand_rot(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    x, y, z, w = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ])


def test_umeyama_recovers_sim3(rng):
    src = rng.normal(size=(50, 3))
    R = _rand_rot(rng)
    s, t = 2.3, np.array([0.5, -1.0, 4.0])
    dst = s * src @ R.T + t
    s2, R2, t2 = metrics.umeyama_alignment(src, dst)
    assert abs(s2 - s) < 1e-9
    np.testing.assert_allclose(R2, R, atol=1e-9)
    np.testing.assert_allclose(t2, t, atol=1e-8)
    np.testing.assert_allclose(metrics.apply_sim3(src, s2, R2, t2), dst,
                               atol=1e-8)


def test_ate_zero_for_sim3_related_trajectories(rng):
    n = 12
    c2w = np.tile(np.eye(4), (n, 1, 1))
    c2w[:, :3, 3] = rng.normal(size=(n, 3))
    R = _rand_rot(rng)
    pred = c2w.copy()
    pred[:, :3, 3] = 1.7 * c2w[:, :3, 3] @ R.T + np.array([1, 2, 3])
    assert metrics.ate_rmse(pred, c2w) < 1e-8
    # without alignment the error is large
    assert metrics.ate_rmse(pred, c2w, align=False) > 0.5


def test_rpe_identity():
    n = 6
    c2w = np.tile(np.eye(4), (n, 1, 1))
    c2w[:, :3, 3] = np.arange(n)[:, None] * np.array([1.0, 0, 0])
    rot_e, t_e = metrics.rpe(c2w, c2w)
    assert rot_e < 1e-6 and t_e < 1e-9


def test_accuracy_completeness_known_offset(rng):
    gt = rng.uniform(size=(2000, 3)).astype(np.float32)
    # pred = gt shifted by 0.01 along x: NN distance is exactly 0.01 when the
    # clouds are dense enough; use identical correspondence to keep it exact
    pred = gt + np.array([0.01, 0, 0], np.float32)
    acc, comp = metrics.accuracy_completeness(pred, gt)
    assert acc <= 0.01 + 1e-6
    assert comp <= 0.01 + 1e-6
    # subset pred -> completeness degrades, accuracy doesn't
    acc2, comp2 = metrics.accuracy_completeness(pred[:100], gt)
    assert acc2 <= 0.0101
    assert comp2 > comp


def test_accuracy_completeness_align(rng):
    gt = rng.uniform(size=(500, 3)).astype(np.float32)
    s, R, t = 1.4, _rand_rot(rng), np.array([2.0, 0, -1])
    pred = (np.linalg.inv(R) @ ((gt - t) / s).T).T.astype(np.float32)
    acc, comp = metrics.accuracy_completeness(pred, gt, align=True)
    assert acc < 1e-4 and comp < 1e-4


def test_nvs_metrics_identical_and_noise(rng):
    img = rng.uniform(size=(2, 32, 32, 3)).astype(np.float32)
    m = metrics.nvs_metrics(img, img)
    assert m["psnr"] > 100 and m["ssim"] > 0.999
    noisy = np.clip(img + rng.normal(scale=0.1, size=img.shape), 0, 1)
    m2 = metrics.nvs_metrics(noisy.astype(np.float32), img)
    assert 15 < m2["psnr"] < 30
    assert m2["ssim"] < 0.97


def test_eval_cli_points(tmp_path, rng):
    import json
    import subprocess
    import sys
    pred = rng.uniform(size=(300, 3)).astype(np.float32)
    np.save(tmp_path / "pred.npy", pred)
    np.save(tmp_path / "gt.npy", pred)
    r = subprocess.run(
        [sys.executable, "/root/repo/tools/eval.py", "points",
         "--pred", str(tmp_path / "pred.npy"), "--gt", str(tmp_path / "gt.npy")],
        capture_output=True, text=True,
        env={"PATH": "/usr/bin:/bin", "PYTHONPATH": "/root/repo",
             "JAX_PLATFORMS": "cpu", "HOME": "/root"})
    assert r.returncode == 0, r.stderr
    out = json.loads(r.stdout.strip().splitlines()[-1])
    # fp32 |q|^2+|r|^2-2qr cancellation floors NN distances near 3e-5
    assert out["accuracy"] < 1e-3 and out["completeness"] < 1e-3
