"""TensorBoard event-file writer, dependency-free.

The reference logs training scalars to wandb (reference train.py:154,248-258)
and the gsplat trainer to tensorboard (simple_trainer_worldmirror.py:28).
Neither package ships in this image, so this module writes the TensorBoard
on-disk format directly — TFRecord framing (length + masked CRC32C) around
hand-encoded `Event` protobufs — producing `events.out.tfevents.*` files any
TensorBoard UI reads.

Usage:
    w = TBWriter("/tmp/logs/run1")
    w.scalar("loss/train", 0.5, step=10)
    w.scalars({"loss": 0.5, "lr": 1e-4}, step=10)
    w.close()

    # trainer adapter: training/trainer.py takes log_fn(metrics: dict, step)
    trainer_log = w.as_log_fn()
"""

import os
import struct
import time
from typing import Dict, Optional

# ---------------------------------------------------------------------------
# CRC32C (Castagnoli), table-driven; TFRecord uses the masked variant
# ---------------------------------------------------------------------------

_CRC_TABLE = []
_POLY = 0x82F63B78
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ _POLY if _c & 1 else _c >> 1
    _CRC_TABLE.append(_c)


def _crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = _CRC_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = _crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# ---------------------------------------------------------------------------
# minimal protobuf wire encoding for Event / Summary
# ---------------------------------------------------------------------------

def _varint(n: int) -> bytes:
    out = bytearray()
    n &= (1 << 64) - 1
    while True:
        b = n & 0x7F
        n >>= 7
        out.append(b | (0x80 if n else 0))
        if not n:
            return bytes(out)


def _key(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _f64(field: int, v: float) -> bytes:
    return _key(field, 1) + struct.pack("<d", v)


def _f32(field: int, v: float) -> bytes:
    return _key(field, 5) + struct.pack("<f", v)


def _int(field: int, v: int) -> bytes:
    return _key(field, 0) + _varint(v)


def _bytes(field: int, v: bytes) -> bytes:
    return _key(field, 2) + _varint(len(v)) + v


def _summary_value(tag: str, value: float) -> bytes:
    # Summary { repeated Value = 1 }; Value { tag = 1 (string);
    # simple_value = 2 (float) } — each Value wraps as a field-1 submessage
    msg = _bytes(1, tag.encode()) + _f32(2, float(value))
    return _bytes(1, msg)


def _event(wall_time: float, step: Optional[int] = None,
           file_version: Optional[str] = None,
           values: Optional[Dict[str, float]] = None) -> bytes:
    # Event { wall_time = 1 (double); step = 2 (int64);
    #         file_version = 3 (string); summary = 5 (Summary) }
    out = _f64(1, wall_time)
    if step is not None:
        out += _int(2, step)
    if file_version is not None:
        out += _bytes(3, file_version.encode())
    if values:
        summary = b"".join(_summary_value(t, v) for t, v in values.items())
        out += _bytes(5, summary)
    return out


def _record(data: bytes) -> bytes:
    header = struct.pack("<Q", len(data))
    return (header + struct.pack("<I", _masked_crc(header))
            + data + struct.pack("<I", _masked_crc(data)))


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------

class TBWriter:
    """Append-only scalar event writer (one events file per instance)."""

    def __init__(self, logdir: str, filename_suffix: str = ""):
        os.makedirs(logdir, exist_ok=True)
        name = (f"events.out.tfevents.{int(time.time())}."
                f"{os.uname().nodename}.{os.getpid()}{filename_suffix}")
        self.path = os.path.join(logdir, name)
        self._f = open(self.path, "ab")
        self._f.write(_record(_event(time.time(),
                                     file_version="brain.Event:2")))
        self._f.flush()

    def scalar(self, tag: str, value: float, step: int):
        self._f.write(_record(_event(time.time(), step=step,
                                     values={tag: value})))

    def scalars(self, metrics: Dict[str, float], step: int):
        vals = {k: float(v) for k, v in metrics.items()
                if isinstance(v, (int, float))}
        if vals:
            self._f.write(_record(_event(time.time(), step=step, values=vals)))

    def flush(self):
        self._f.flush()

    def close(self):
        self._f.flush()
        self._f.close()

    def as_log_fn(self):
        """Adapter for trainer-style log hooks: accepts either
        (metrics_dict, step) or a bare message (ignored)."""
        counter = {"step": 0}

        def log_fn(arg, step: Optional[int] = None):
            if isinstance(arg, dict):
                s = counter["step"] if step is None else step
                self.scalars(arg, s)
                counter["step"] = s + 1
                self.flush()
        return log_fn


# ---------------------------------------------------------------------------
# reader (round-trip verification / tests; also handy for quick greps)
# ---------------------------------------------------------------------------

def read_scalars(path: str):
    """Parse an events file back to [(step, {tag: value})], verifying CRCs."""
    out = []
    with open(path, "rb") as f:
        while True:
            header = f.read(8)
            if len(header) < 8:
                break
            (length,) = struct.unpack("<Q", header)
            (hcrc,) = struct.unpack("<I", f.read(4))
            assert hcrc == _masked_crc(header), "corrupt length crc"
            data = f.read(length)
            (dcrc,) = struct.unpack("<I", f.read(4))
            assert dcrc == _masked_crc(data), "corrupt data crc"
            step, values = _parse_event(data)
            if values:
                out.append((step, values))
    return out


def _parse_event(data: bytes):
    i, step, values = 0, 0, {}

    def varint():
        nonlocal i
        shift = n = 0
        while True:
            b = data[i]
            i += 1
            n |= (b & 0x7F) << shift
            if not b & 0x80:
                return n
            shift += 7

    while i < len(data):
        tag = varint()
        field, wire = tag >> 3, tag & 7
        if wire == 0:
            v = varint()
            if field == 2:
                step = v
        elif wire == 1:
            i += 8
        elif wire == 5:
            i += 4
        elif wire == 2:
            ln = varint()
            payload = data[i:i + ln]
            i += ln
            if field == 5:
                values.update(_parse_summary(payload))
    return step, values


def _parse_summary(data: bytes):
    i, out = 0, {}

    def varint():
        nonlocal i
        shift = n = 0
        while True:
            b = data[i]
            i += 1
            n |= (b & 0x7F) << shift
            if not b & 0x80:
                return n
            shift += 7

    while i < len(data):
        tag = varint()
        field, wire = tag >> 3, tag & 7
        if wire != 2:
            break
        ln = varint()
        val = data[i:i + ln]
        i += ln
        if field == 1:  # Summary.Value
            j, name, num = 0, None, None
            while j < len(val):
                t = val[j]
                j += 1
                f2, w2 = t >> 3, t & 7
                if w2 == 2:
                    ln2 = val[j]
                    j += 1
                    if f2 == 1:
                        name = val[j:j + ln2].decode()
                    j += ln2
                elif w2 == 5:
                    if f2 == 2:
                        (num,) = struct.unpack("<f", val[j:j + 4])
                    j += 4
                elif w2 == 0:
                    while val[j] & 0x80:
                        j += 1
                    j += 1
                elif w2 == 1:
                    j += 8
            if name is not None and num is not None:
                out[name] = num
    return out
