"""Sharded-tar streaming data pipeline (WebDataset-compatible layout).

Behavioral parity: reference training/data/datasets/webdataloader_utils.py:97-360
— shard glob -> epoch-seeded shard shuffle -> worker split -> tar ->
key-grouped samples -> decode (color.png / depth.exr / meta.json /
heatmap.npz / pose_map.npz, depth clamped to 25m) -> shuffle buffer (2000) ->
batches, with corrupt samples skipped (warn-and-continue).

The webdataset package isn't in this image, so the tar/grouping layer is
implemented directly (tarfile + glob); a background thread prefetches batches
(the reference uses torch DataLoader workers + prefetch 4).
"""

import glob as globlib
import io
import json
import queue
import random
import tarfile
import threading
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np


def expand_shards(pattern) -> List[str]:
    """Accept a glob, brace-range 'shard-{000..012}.tar', list, or dir."""
    if isinstance(pattern, (list, tuple)):
        out = []
        for p in pattern:
            out.extend(expand_shards(p))
        return sorted(set(out))
    if "{" in pattern and ".." in pattern:
        head, rest = pattern.split("{", 1)
        rng, tail = rest.split("}", 1)
        lo, hi = rng.split("..")
        width = len(lo)
        return [f"{head}{i:0{width}d}{tail}" for i in range(int(lo), int(hi) + 1)]
    hits = sorted(globlib.glob(pattern))
    return hits if hits else [pattern]


def iter_tar_samples(shard_path: str) -> Iterator[Dict[str, bytes]]:
    """Group tar members by basename key: {key, ext: bytes, ...}."""
    with tarfile.open(shard_path, "r|*") as tf:
        current_key, sample = None, {}
        for member in tf:
            if not member.isfile():
                continue
            name = member.name
            if "." not in name:
                continue
            key, ext = name.split(".", 1)
            if current_key is not None and key != current_key:
                if sample:
                    sample["__key__"] = current_key
                    yield sample
                sample = {}
            current_key = key
            sample[ext] = tf.extractfile(member).read()
        if sample:
            sample["__key__"] = current_key
            yield sample


def decode_image_bytes(data: bytes) -> np.ndarray:
    from PIL import Image
    img = Image.open(io.BytesIO(data)).convert("RGB")
    return np.asarray(img, np.float32) / 255.0


def decode_exr_bytes(data: bytes) -> Optional[np.ndarray]:
    import cv2
    arr = np.frombuffer(data, np.uint8)
    img = cv2.imdecode(arr, cv2.IMREAD_UNCHANGED)
    if img is None:
        return None
    if img.ndim == 3:
        img = img[..., 0]
    return img.astype(np.float32)


def decode_npz_bytes(data: bytes) -> Dict[str, np.ndarray]:
    with np.load(io.BytesIO(data)) as z:
        return {k: z[k] for k in z.files}


def decode_sope_sample(sample: Dict[str, bytes],
                       max_depth: float = 25.0) -> Optional[Dict[str, np.ndarray]]:
    """SOPE sample: color.png + depth.exr + meta.json + heatmap/pose_map npz."""
    try:
        out = {"__key__": sample.get("__key__", "")}
        out["rgb"] = decode_image_bytes(sample["color.png"])
        if "depth.exr" in sample:
            depth = decode_exr_bytes(sample["depth.exr"])
            if depth is None:
                return None
            out["depth"] = np.clip(depth, 0.0, max_depth)
        if "meta.json" in sample:
            out["meta"] = json.loads(sample["meta.json"].decode())
        if "heatmap.npz" in sample:
            hm = decode_npz_bytes(sample["heatmap.npz"])
            out["heatmap"] = next(iter(hm.values())).astype(np.float32)
        if "pose_map.npz" in sample:
            pm = decode_npz_bytes(sample["pose_map.npz"])
            out["pose_map"] = next(iter(pm.values())).astype(np.float32)
        return out
    except Exception as e:  # warn-and-continue (reference :130)
        print(f"warning: skipping corrupt sample: {type(e).__name__}: {e}")
        return None


class ShardedLoader:
    """Epoch-seeded shard shuffle -> streamed decode -> shuffle buffer -> batch."""

    def __init__(self, shards, batch_size: int = 20, shuffle_buffer: int = 2000,
                 seed: int = 0, decode_fn=decode_sope_sample,
                 worker_index: int = 0, num_workers: int = 1,
                 prefetch: int = 4, drop_keys: Sequence[str] = ("meta", "__key__"),
                 use_native: str = "auto", native_threads: int = 3):
        """use_native: "auto" uses the C++ tar streamer (native/tar_reader.cpp)
        when libwmtar.so is built, "never"/"always" force a path."""
        self.shards = expand_shards(shards)
        self.batch_size = batch_size
        self.shuffle_buffer = shuffle_buffer
        self.seed = seed
        self.decode_fn = decode_fn
        self.worker_index = worker_index
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.drop_keys = set(drop_keys)
        self.native_threads = native_threads
        if use_native == "always":
            self.use_native = True
        elif use_native == "never":
            self.use_native = False
        else:
            from . import native_loader
            self.use_native = native_loader.available()

    def _raw_samples(self, shards: List[str]) -> Iterator[Dict[str, bytes]]:
        if self.use_native:
            from . import native_loader
            yield from native_loader.iter_shards_native(
                shards, n_threads=self.native_threads)
        else:
            for shard in shards:
                yield from iter_tar_samples(shard)

    def _samples(self, epoch: int) -> Iterator[Dict]:
        rng = random.Random(self.seed + epoch)
        shards = list(self.shards)
        rng.shuffle(shards)
        shards = shards[self.worker_index::self.num_workers]
        buf: List[Dict] = []
        for raw in self._raw_samples(shards):
            dec = self.decode_fn(raw)
            if dec is None:
                continue
            buf.append(dec)
            if len(buf) >= self.shuffle_buffer:
                idx = rng.randrange(len(buf))
                yield buf.pop(idx)
        rng.shuffle(buf)
        yield from buf

    def _batches(self, epoch: int) -> Iterator[Dict[str, np.ndarray]]:
        batch: List[Dict] = []
        for s in self._samples(epoch):
            batch.append(s)
            if len(batch) == self.batch_size:
                yield self._collate(batch)
                batch = []

    def _collate(self, batch: List[Dict]) -> Dict[str, np.ndarray]:
        keys = [k for k in batch[0] if k not in self.drop_keys]
        return {k: np.stack([b[k] for b in batch]) for k in keys}

    def epoch(self, epoch: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        """Iterate one epoch with a background prefetch thread."""
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        DONE = object()

        def producer():
            try:
                for b in self._batches(epoch):
                    q.put(b)
            finally:
                q.put(DONE)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is DONE:
                break
            yield item
