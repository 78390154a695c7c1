"""Print the top device ops of a JAX xprof trace.

Usage: python tools/trace_ops.py /tmp/trace [N]

Parses the .xplane.pb written by jax.profiler.trace via the xprof package's
converter (the tensorboard_plugin_profile copy in this image has a protobuf
version clash; xprof's own copy works). Complements tools/model_profile.py — that
gives per-phase wall times, this gives the op-level split inside one phase
(SURVEY.md §5.1: the reference has no model-path profiling at all).
"""

import glob
import json
import sys


def top_ops(trace_dir: str, n: int = 20):
    paths = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.xplane.pb"))
    if not paths:
        raise SystemExit(f"no .xplane.pb under {trace_dir}")
    from xprof.convert import raw_to_tool_data as rd
    data, _ = rd.xspace_to_tool_data(paths[-1:], "framework_op_stats", {})
    tables = json.loads(data.decode() if isinstance(data, bytes) else str(data))
    t = tables[0]
    cols = [c["id"] for c in t["cols"]]
    i_dev = cols.index("host_or_device")
    i_op = cols.index("operation")
    i_tot = cols.index("total_self_time")
    i_ty = cols.index("type")
    rows = []
    for r in t["rows"]:
        v = [c["v"] for c in r["c"]]
        if v[i_dev] == "Device":
            rows.append((v[i_tot], v[i_ty], v[i_op]))
    rows.sort(reverse=True)
    total = sum(r[0] for r in rows)
    out = [f"total device self time: {total:.3f}"]
    for tm, ty, op in rows[:n]:
        out.append(f"{tm:10.3f}  {100 * tm / max(total, 1e-12):5.1f}%  "
                   f"{ty:18s} {op[:90]}")
    return "\n".join(out)


if __name__ == "__main__":
    d = sys.argv[1] if len(sys.argv) > 1 else "/tmp/trace"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    print(top_ops(d, n))
