"""Native (C++) tar streamer vs the Python tarfile path.

The library is built on demand by the test (native/build.sh, ~1s)."""

import subprocess
import tarfile
import io

import numpy as np
import pytest

from hunyuanworld_mirror_tpu.training import data as data_lib
from hunyuanworld_mirror_tpu.training import native_loader


@pytest.fixture(scope="module")
def built():
    r = subprocess.run(["bash", "native/build.sh"], cwd="/root/repo",
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    assert native_loader.available()
    return True


def _make_shard(path, n, rng, offset=0):
    with tarfile.open(path, "w") as tar:
        for i in range(offset, offset + n):
            for suffix, payload in (
                ("color.png", rng.bytes(100 + i)),
                ("meta.json", b'{"id": %d}' % i),
            ):
                data = payload
                info = tarfile.TarInfo(f"{i:06d}.{suffix}")
                info.size = len(data)
                tar.addfile(info, io.BytesIO(data))


def test_native_matches_python(tmp_path, rng, built):
    shards = []
    for s in range(3):
        p = tmp_path / f"shard-{s}.tar"
        _make_shard(p, 5, rng, offset=s * 5)
        shards.append(str(p))

    py_samples = {}
    for shard in shards:
        for raw in data_lib.iter_tar_samples(shard):
            py_samples[raw["__key__"]] = raw

    native = {}
    for raw in native_loader.iter_shards_native(shards, n_threads=2):
        native[raw["__key__"]] = raw

    assert set(native) == set(py_samples) and len(native) == 15
    for k, v in py_samples.items():
        for part, payload in v.items():
            assert native[k][part] == payload


def test_sharded_loader_native_path(tmp_path, rng, built):
    """ShardedLoader(use_native='always') streams identical batches-worth of
    samples to the python path."""
    p = tmp_path / "s.tar"
    with tarfile.open(p, "w") as tar:
        for i in range(6):
            from PIL import Image
            buf = io.BytesIO()
            Image.fromarray((rng.uniform(0, 1, (16, 16, 3)) * 255)
                            .astype(np.uint8)).save(buf, format="PNG")
            data = buf.getvalue()
            info = tarfile.TarInfo(f"{i:06d}.color.png")
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))

    kw = dict(batch_size=3, shuffle_buffer=1, seed=1)
    a = data_lib.ShardedLoader(str(p), use_native="always", **kw)
    b = data_lib.ShardedLoader(str(p), use_native="never", **kw)
    assert a.use_native and not b.use_native
    ba = [x["rgb"] for x in a.epoch(0)]
    bb = [x["rgb"] for x in b.epoch(0)]
    np.testing.assert_array_equal(np.concatenate(ba), np.concatenate(bb))
