"""xprof-grounded attribution of the FULL S=4/518px forward (VERDICT r4 #1).

Traces the all-outputs-live in-jit K-repeat of the composed forward (no
dispatch floor, no DCE — same harness as bench.phase_breakdown), then groups
device op self-times into attribution classes so >=90% of the forward is
accounted for:

  gemm        XLA dot/convolution fusions (MXU work incl. DPT convs)
  flash       Pallas flash-attention kernel
  raster      Pallas blend kernels
  sort        lax.sort (binning / prune / compact / isect)
  elementwise loose elementwise/reduce fusions (LN, RoPE, softmax glue, ...)
  transpose   copy/transpose/reshape materializations
  other       everything else

Usage: python tools/trace_forward.py [--views 4] [--img 518] [--k 4]
       [--no-render]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

GROUPS = (
    ("flash", ("flash_attention",)),
    ("raster", ("_kernel_flat", "rasterize", "_raster", "blend")),
    ("sort", ("sort",)),
    ("gemm", ("dot_general", "conv_general", "dot(", "convolution",
              "einsum", "matmul")),
    ("transpose", ("transpose", "copy", "reshape", "gather", "dynamic-slice",
                   "dynamic_slice", "concatenate", "pad(", "pad.")),
    ("elementwise", ("fusion", "add", "multiply", "subtract", "divide",
                     "exp", "log", "rsqrt", "tanh", "erf", "maximum",
                     "minimum", "select", "compare", "reduce", "convert",
                     "iota", "broadcast")),
)


def classify(ty: str, op: str) -> str:
    s = (ty + " " + op).lower()
    for name, keys in GROUPS:
        if any(k in s for k in keys):
            return name
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=4)
    ap.add_argument("--img", type=int, default=518)
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--no-render", action="store_true")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    import jax
    import bench
    from hunyuanworld_mirror_tpu.models import worldmirror

    render = not args.no_render
    fwd, params, views, cfg = bench.build(args.views, args.img, render)
    floor = bench.measure_floor()

    def e2e_fn(p, v):
        return worldmirror.forward(p, cfg, v, render=render)

    def perturb_views(args_, acc, i):
        p, v = args_
        return (p, {**v, "img": v["img"] + acc + i * 1e-9})

    rep = bench.repeat_jit(e2e_fn, perturb_views, args.k)
    t = (bench._time(rep, params, views, iters=2) - floor) / args.k
    print(f"e2e in-jit: {1e3 * t:.1f} ms/forward "
          f"({args.views / t:.2f} f/s)", flush=True)

    trace_dir = f"/tmp/trace_forward_s{args.views}"
    with jax.profiler.trace(trace_dir):
        bench._readback(rep(params, views))

    from tools.trace_ops import top_ops  # noqa: F401  (same parser)
    import glob
    import json as _json
    paths = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.xplane.pb"))
    from xprof.convert import raw_to_tool_data as rd
    data, _ = rd.xspace_to_tool_data(paths[-1:], "framework_op_stats", {})
    tables = _json.loads(data.decode() if isinstance(data, bytes) else str(data))
    tt = tables[0]
    cols = [c["id"] for c in tt["cols"]]
    i_dev, i_op = cols.index("host_or_device"), cols.index("operation")
    i_tot, i_ty = cols.index("total_self_time"), cols.index("type")
    rows = []
    for r in tt["rows"]:
        v = [c["v"] for c in r["c"]]
        if v[i_dev] == "Device":
            rows.append((v[i_tot], v[i_ty], v[i_op]))
    rows.sort(reverse=True)
    total = sum(r[0] for r in rows)
    per_fwd = 1e3 * total / args.k  # trace holds K repeats

    groups: dict = {}
    for tm, ty, op in rows:
        groups[classify(ty, op)] = groups.get(classify(ty, op), 0.0) + tm
    print(f"\ndevice total: {per_fwd:.1f} ms/forward (trace K={args.k}); "
          f"groups (ms/forward):")
    for name, tm in sorted(groups.items(), key=lambda kv: -kv[1]):
        print(f"  {name:12s} {1e3 * tm / args.k:8.1f}  "
              f"{100 * tm / max(total, 1e-12):5.1f}%")

    print(f"\ntop {args.top} ops (ms/forward):")
    for tm, ty, op in rows[:args.top]:
        print(f"{1e3 * tm / args.k:8.2f}  {100 * tm / max(total, 1e-12):5.1f}%"
              f"  [{classify(ty, op):11s}] {ty:16s} {op[:84]}")


if __name__ == "__main__":
    main()
