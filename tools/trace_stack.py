"""Trace the 24-layer global-attention stack and print top device ops.

Usage: PYTHONPATH=... python tools/trace_stack.py [impl] [views]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

impl = sys.argv[1] if len(sys.argv) > 1 else "einsum"
views = int(sys.argv[2]) if len(sys.argv) > 2 else 4
os.environ["WM_ATTN_IMPL"] = impl

import jax  # noqa: E402

from tools.attn_ab import bench_stack, timeit  # noqa: E402


def main():
    dt = bench_stack(impl, views, 518, 3)
    print(f"stack impl={impl}: {1e3*dt:.1f} ms", flush=True)
    trace_dir = f"/tmp/trace_stack_{impl}"
    with jax.profiler.trace(trace_dir):
        bench_stack(impl, views, 518, 2)
    from tools.trace_ops import top_ops
    print(top_ops(trace_dir, 25))


if __name__ == "__main__":
    main()
