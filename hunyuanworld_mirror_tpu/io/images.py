"""Image/video loading and preprocessing for inference.

Behavioral parity: reference src/utils/inference_utils.py:149-262 and
src/utils/video_utils.py:13 — RGBA composited onto white, bicubic resize to
width 518 keeping aspect (height rounded to a patch multiple), center-crop or
white-pad to square, mixed-size harmonization by padding; videos sampled at a
target fps via OpenCV.

Output is NHWC float32 in [0, 1] (the framework's native layout), shape
(1, S, H, W, 3).
"""

import glob
import os
from typing import List, Sequence, Tuple

import numpy as np
from PIL import Image

IMAGE_EXTS = ("*.jpg", "*.jpeg", "*.png", "*.bmp", "*.webp", "*.JPG", "*.PNG")
VIDEO_EXTS = (".mp4", ".avi", ".mov", ".mkv", ".webm")


def _handle_alpha(img: Image.Image) -> Image.Image:
    if img.mode == "RGBA":
        white = Image.new("RGBA", img.size, (255, 255, 255, 255))
        img = Image.alpha_composite(white, img)
    return img.convert("RGB")


def _resize_dims(w: int, h: int, max_dim: int, strategy: str,
                 patch_size: int = 14) -> Tuple[int, int]:
    if strategy == "pad":
        if w >= h:
            new_w = max_dim
            new_h = round(h * (new_w / w) / patch_size) * patch_size
        else:
            new_h = max_dim
            new_w = round(w * (new_h / h) / patch_size) * patch_size
    else:  # crop
        new_w = max_dim
        new_h = round(h * (new_w / w) / patch_size) * patch_size
    return new_w, new_h


def _pad_to_square(arr: np.ndarray, target: int) -> np.ndarray:
    h, w = arr.shape[:2]
    ph, pw = target - h, target - w
    if ph > 0 or pw > 0:
        top, left = max(ph, 0) // 2, max(pw, 0) // 2
        arr = np.pad(arr, ((top, max(ph, 0) - top), (left, max(pw, 0) - left), (0, 0)),
                     constant_values=1.0)
    return arr


def load_image(path: str, target_size: int = 518, strategy: str = "crop") -> np.ndarray:
    """One image -> (H, W, 3) float32 in [0, 1]."""
    img = _handle_alpha(Image.open(path))
    w, h = img.size
    new_w, new_h = _resize_dims(w, h, target_size, strategy)
    img = img.resize((new_w, new_h), Image.Resampling.BICUBIC)
    arr = np.asarray(img, np.float32) / 255.0

    if strategy == "crop" and new_h > target_size:
        start = (new_h - target_size) // 2
        arr = arr[start:start + target_size]
    if strategy == "pad":
        arr = _pad_to_square(arr, target_size)
    return arr


def prepare_images(paths: Sequence[str], target_size: int = 518,
                   strategy: str = "crop") -> np.ndarray:
    """Image files -> (1, S, H, W, 3) float32 batch; mixed sizes get padded."""
    if not paths:
        raise ValueError("At least 1 image is required")
    if strategy not in ("crop", "pad"):
        raise ValueError("Strategy must be 'crop' or 'pad'")

    arrs = [load_image(p, target_size, strategy) for p in paths]
    dims = {a.shape[:2] for a in arrs}
    if len(dims) > 1:
        mh = max(d[0] for d in dims)
        mw = max(d[1] for d in dims)
        arrs = [_pad_to_square(a, max(mh, mw)) if a.shape[:2] != (mh, mw) else a
                for a in arrs]
    return np.stack(arrs)[None]


def video_to_frames(path: str, fps: float = 1.0, out_dir: str = None) -> List[str]:
    """Sample a video at `fps` frames/sec into numbered PNGs; returns paths."""
    import cv2

    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise ValueError(f"cannot open video {path}")
    native_fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    step = max(1, round(native_fps / fps))

    out_dir = out_dir or os.path.join(os.path.dirname(path) or ".",
                                      "frames_" + os.path.basename(path).split(".")[0])
    os.makedirs(out_dir, exist_ok=True)
    paths, i = [], 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if i % step == 0:
            p = os.path.join(out_dir, f"frame_{i:06d}.png")
            cv2.imwrite(p, frame)
            paths.append(p)
        i += 1
    cap.release()
    return paths


def load_inputs(path: str, fps: float = 1.0, target_size: int = 518,
                strategy: str = "crop") -> np.ndarray:
    """Directory of images or a video file -> (1, S, H, W, 3) batch."""
    if os.path.isfile(path) and os.path.splitext(path)[1].lower() in VIDEO_EXTS:
        frame_paths = sorted(video_to_frames(path, fps))
    else:
        frame_paths = []
        for ext in IMAGE_EXTS:
            frame_paths.extend(glob.glob(os.path.join(path, ext)))
        frame_paths = sorted(set(frame_paths))
    return prepare_images(frame_paths, target_size, strategy)


def crop_with_intrinsics(image: np.ndarray, K: np.ndarray,
                         crop_box) -> "tuple[np.ndarray, np.ndarray]":
    """Crop (y0, x0, y1, x1) and shift the principal point accordingly
    (reference src/utils/cropping.py:108-387, DUSt3R-style — utility only)."""
    y0, x0, y1, x1 = crop_box
    out = image[y0:y1, x0:x1]
    K2 = np.array(K, np.float64).copy()
    K2[0, 2] -= x0
    K2[1, 2] -= y0
    return out, K2.astype(K.dtype if hasattr(K, "dtype") else np.float32)


def rescale_with_intrinsics(image: np.ndarray, K: np.ndarray,
                            new_hw) -> "tuple[np.ndarray, np.ndarray]":
    """Resize to (H', W') and scale focal lengths / principal point
    (reference cropping.py rescale_image_and_intrinsics semantics)."""
    import cv2

    H, W = image.shape[:2]
    nh, nw = new_hw
    out = cv2.resize(image, (nw, nh), interpolation=cv2.INTER_AREA
                     if nw < W else cv2.INTER_CUBIC)
    K2 = np.array(K, np.float64).copy()
    K2[0] *= nw / W
    K2[1] *= nh / H
    return out, K2.astype(np.float32)
