"""Parity: io.cropping vs reference src/utils/cropping.py (host-side)."""

import numpy as np
import pytest

from hunyuanworld_mirror_tpu.io import cropping as crp

from conftest import torch_reference


@pytest.fixture(scope="module")
def ref_cropping():
    torch_reference()  # puts /root/reference on sys.path (skips if absent)
    pytest.importorskip("cv2")
    pytest.importorskip("PIL")
    from src.utils import cropping as ref
    return ref


def _rand_view(rng, w=200, h=140):
    # smooth image: resampling-kernel differences (cv2 vs PIL Lanczos) are
    # negligible on low-frequency content but explode on white noise
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack([
        127 + 120 * np.sin(xx / 23.0),
        127 + 120 * np.cos(yy / 17.0),
        (xx + yy) / (w + h) * 255.0,
    ], axis=-1).clip(0, 255).astype(np.uint8)
    depth = rng.uniform(0.5, 4.0, size=(h, w)).astype(np.float32)
    K = np.array([[170.0, 0, 97.3], [0, 165.0, 71.2], [0, 0, 1]])
    return img, depth, K


def test_intrinsics_convention_roundtrip():
    K = np.array([[100.0, 0, 50.0], [0, 90.0, 40.0], [0, 0, 1]])
    back = crp.colmap_to_opencv_intrinsics(crp.opencv_to_colmap_intrinsics(K))
    np.testing.assert_allclose(back, K)


def test_camera_matrix_of_crop_matches_reference(ref_cropping, rng):
    K = np.array([[170.0, 0, 97.3], [0, 165.0, 71.2], [0, 0, 1]])
    ours = crp.camera_matrix_of_crop(K, (200, 140), (100, 80), scaling=0.75)
    ref = ref_cropping.camera_matrix_of_crop(K, np.array([200, 140]),
                                             np.array([100, 80]), scaling=0.75)
    np.testing.assert_allclose(ours, ref, atol=1e-9)


@pytest.mark.parametrize("res", [(126, 98), (252, 196)])
def test_crop_resize_matches_reference(ref_cropping, rng, res):
    import PIL.Image
    img, depth, K = _rand_view(rng)
    ours_img, ours_d, ours_K = crp.crop_resize_if_necessary(
        img, res, depthmap=depth, intrinsics=K)

    ref_img, ref_d, ref_K = ref_cropping.crop_resize_if_necessary(
        PIL.Image.fromarray(img), res, depthmap=depth, intrinsics=K.copy())
    ref_img = np.asarray(ref_img)

    assert ours_img.shape == ref_img.shape == (res[1], res[0], 3)
    np.testing.assert_allclose(ours_K, ref_K, atol=1e-6)
    # depth path is nearest-resized identically
    np.testing.assert_allclose(ours_d, ref_d, atol=1e-6)
    # RGB resamplers differ (cv2 Lanczos vs PIL Lanczos): require close-not-
    # identical agreement away from interpolation ringing.
    diff = np.abs(ours_img.astype(np.int32) - ref_img.astype(np.int32))
    assert np.median(diff) <= 2
    assert (diff <= 12).mean() > 0.95


def test_crop_with_intrinsics_shifts_pp():
    rng = np.random.default_rng(3)
    img, depth, K = _rand_view(rng)
    out, d, K2, _ = crp.crop_with_intrinsics(img, (10, 20, 110, 100),
                                             depthmap=depth, intrinsics=K)
    assert out.shape == (80, 100, 3) and d.shape == (80, 100)
    np.testing.assert_allclose(K2[0, 2], K[0, 2] - 10)
    np.testing.assert_allclose(K2[1, 2], K[1, 2] - 20)


def test_rescale_force_false_skips_upscale():
    rng = np.random.default_rng(4)
    img, depth, K = _rand_view(rng, w=64, h=48)
    out, d, K2, _ = crp.rescale_with_intrinsics(img, (128, 96), depth, K,
                                                force=False)
    assert out.shape == img.shape  # untouched
    np.testing.assert_allclose(K2, K)
