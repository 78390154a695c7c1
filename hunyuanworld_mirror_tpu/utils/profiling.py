"""Profiling + roofline harness.

The reference's tracing is thin (gsplat/profile.py nvtx ranges; time.time()
around the forward, infer.py:151-160) — SURVEY.md §5.1 asks this framework to
do better: JAX profiler traces, per-phase wall timing with forced host
readbacks (through the axon relay, block_until_ready does NOT await remote
execution), and a speed-of-light roofline for the hot ops.

Chip peak numbers are parameters; defaults are TPU v5p
(459 TFLOP/s bf16, 2765 GB/s HBM — public spec).
"""

import contextlib
import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class ChipSpec:
    name: str = "v5p"
    peak_flops_bf16: float = 459e12
    peak_flops_f32: float = 115e12
    hbm_bytes_per_s: float = 2765e9


# public chip specs (cloud.google.com/tpu/docs system architecture pages)
CHIP_SPECS = {
    "v5p": ChipSpec("v5p", 459e12, 115e12, 2765e9),
    "v5e": ChipSpec("v5e", 197e12, 49e12, 819e9),
    "v4": ChipSpec("v4", 275e12, 69e12, 1228e9),
    "v6e": ChipSpec("v6e", 918e12, 230e12, 1640e9),
}


def detect_chip() -> ChipSpec:
    """Pick the ChipSpec for the attached device (falls back to v5p)."""
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return CHIP_SPECS["v5p"]
    if "lite" in kind or "v5e" in kind:
        return CHIP_SPECS["v5e"]
    for name in ("v6e", "v5p", "v4"):
        if name in kind:
            return CHIP_SPECS[name]
    return CHIP_SPECS["v5p"]


class PhaseTimer:
    """Accumulates wall time per named phase; sync via host readback."""

    def __init__(self):
        self.times: Dict[str, List[float]] = {}

    @contextlib.contextmanager
    def phase(self, name: str, sync_value=None):
        t0 = time.perf_counter()
        yield
        if sync_value is not None:
            _force_readback(sync_value)
        self.times.setdefault(name, []).append(time.perf_counter() - t0)

    def record(self, name: str, seconds: float):
        self.times.setdefault(name, []).append(seconds)

    def summary(self) -> str:
        rows = ["phase                     calls    mean_ms     total_ms"]
        for name, ts in self.times.items():
            rows.append(f"{name:<25s} {len(ts):>5d} {1e3 * np.mean(ts):>10.2f} "
                        f"{1e3 * np.sum(ts):>12.2f}")
        return "\n".join(rows)


def _force_readback(x):
    """Pull one scalar to the host — the only reliable sync point through
    the axon TPU relay (bench.py note)."""
    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[0] if hasattr(leaf, "ravel") else leaf))


@contextlib.contextmanager
def trace(log_dir: str):
    """JAX profiler trace (view with tensorboard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_fn(fn: Callable, *args, iters: int = 5, warmup: int = 1,
            **kwargs) -> float:
    """Median seconds/call with compile excluded and host-readback sync."""
    for _ in range(warmup):
        out = fn(*args, **kwargs)
        _force_readback(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        _force_readback(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


# ---------------------------------------------------------------------------
# rooflines
# ---------------------------------------------------------------------------

def attention_flops(B: int, N: int, H: int, D: int) -> float:
    """QK^T + PV matmul FLOPs for one attention call."""
    return 2.0 * B * H * N * N * D * 2


def vgt_flops(B: int, S: int, P: int, C: int, depth: int,
              mlp_ratio: float = 4.0) -> float:
    """Alternating-attention trunk FLOPs (frame + global per layer):
    qkv/proj/mlp GEMMs + attention matmuls on S*P tokens."""
    N = P
    tokens = B * S * N
    per_layer_linear = 2.0 * tokens * C * (3 * C + C + 2 * mlp_ratio * C)
    H = 16
    frame_attn = attention_flops(B * S, N, H, C // H)
    global_attn = attention_flops(B, S * N, H, C // H)
    return depth * (2 * per_layer_linear + frame_attn + global_attn)


def rasterizer_bytes(n_splats: int, n_pix: int, k_per_tile: int,
                     n_tiles: int, d_channels: int) -> float:
    """HBM traffic lower bound for the tile blender: staged splat rows +
    written pixels."""
    splat_row = (2 + 3 + d_channels + 1) * 4
    return n_tiles * k_per_tile * splat_row + n_pix * (d_channels + 1) * 4


def roofline(flops: float, bytes_moved: float, seconds: float,
             spec: Optional[ChipSpec] = None, dtype: str = "bf16") -> Dict:
    """Compare measured time against compute/bandwidth speed-of-light."""
    spec = spec or detect_chip()
    peak = spec.peak_flops_bf16 if dtype == "bf16" else spec.peak_flops_f32
    t_compute = flops / peak
    t_memory = bytes_moved / spec.hbm_bytes_per_s
    t_sol = max(t_compute, t_memory)
    return {
        "flops": flops,
        "bytes": bytes_moved,
        "arithmetic_intensity": flops / max(bytes_moved, 1.0),
        "bound": "compute" if t_compute >= t_memory else "memory",
        "t_sol_ms": 1e3 * t_sol,
        "t_measured_ms": 1e3 * seconds,
        "sol_fraction": t_sol / max(seconds, 1e-12),
        "chip": spec.name,
    }
