"""ctypes binding for the native (C++) sharded-tar streamer.

See native/tar_reader.cpp: a pthread pool reads shards sequentially, parses
ustar headers zero-copy, and groups files into webdataset samples behind a
bounded queue — replacing the reference's torch DataLoader worker PROCESSES
(reference webdataloader_utils.py:97-158) with in-process native threads (no
pickle/IPC per batch).

Falls back silently when the library isn't built; ShardedLoader selects it
via use_native="auto". Build with `bash native/build.sh`.

Measured (8 page-cached shards x 200 samples x 200KB): the native path wins
once the consumer does real decode work (1.23x with a crc+sum stand-in;
larger with cold disks or EXR decode) because shard IO + tar parsing overlap
the Python-side decode. On pure byte streaming with a hot page cache, the
single-threaded tarfile path is faster — keep "auto" and let workloads that
decode benefit.
"""

import ctypes
import os
from typing import Dict, Iterator, Optional, Sequence

_LIB_PATH = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "libwmtar.so")

_lib = None


def available() -> bool:
    return _load() is not None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.wmtar_open.restype = ctypes.c_void_p
    lib.wmtar_open.argtypes = [ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                               ctypes.c_int, ctypes.c_int]
    lib.wmtar_next.restype = ctypes.c_void_p
    lib.wmtar_next.argtypes = [ctypes.c_void_p]
    lib.wmtar_sample_key.restype = ctypes.c_char_p
    lib.wmtar_sample_key.argtypes = [ctypes.c_void_p]
    lib.wmtar_sample_nparts.restype = ctypes.c_int
    lib.wmtar_sample_nparts.argtypes = [ctypes.c_void_p]
    lib.wmtar_sample_part_name.restype = ctypes.c_char_p
    lib.wmtar_sample_part_name.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.wmtar_sample_part_data.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.wmtar_sample_part_data.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                           ctypes.POINTER(ctypes.c_int64)]
    lib.wmtar_sample_free.argtypes = [ctypes.c_void_p]
    lib.wmtar_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def iter_shards_native(shards: Sequence[str], n_threads: int = 3,
                       queue_cap: int = 128) -> Iterator[Dict[str, bytes]]:
    """Stream webdataset-style samples ({suffix: bytes, '__key__': str})
    from tar shards through the native thread pool."""
    lib = _load()
    if lib is None:
        raise RuntimeError(
            "native loader not built — run `bash native/build.sh`")
    arr = (ctypes.c_char_p * len(shards))(
        *[s.encode() for s in shards])
    handle = lib.wmtar_open(arr, len(shards), n_threads, queue_cap)
    try:
        while True:
            s = lib.wmtar_next(handle)
            if not s:
                break
            out = {"__key__": lib.wmtar_sample_key(s).decode()}
            n = lib.wmtar_sample_nparts(s)
            for i in range(n):
                name = lib.wmtar_sample_part_name(s, i).decode()
                size = ctypes.c_int64()
                ptr = lib.wmtar_sample_part_data(s, i, ctypes.byref(size))
                out[name] = ctypes.string_at(ptr, size.value)
            lib.wmtar_sample_free(s)
            yield out
    finally:
        lib.wmtar_close(handle)
