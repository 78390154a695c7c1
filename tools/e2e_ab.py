"""One-config composed-forward A/B probe (fresh process per config).

jit trace caches do NOT key on env vars (PARITY r4 methodology note), so
every env-knob A/B must run one config per PROCESS. This tool measures the
all-outputs-live in-jit K-repeat of the full forward (bench.phase_breakdown
harness) for the ambient env and prints one line; drive sweeps from bash.

Usage: WM_FLASH_MIN_N=1024 WM_FLASH_BLOCK=256 python tools/e2e_ab.py \
           [--views 4] [--img 518] [--k 4] [--no-render] [--label x]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=4)
    ap.add_argument("--img", type=int, default=518)
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--no-render", action="store_true")
    ap.add_argument("--label", default="")
    args = ap.parse_args()

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

    t = bench._timed_repeat(e2e_fn, perturb_views, (params, views), args.k,
                            floor, iters=2)
    knobs = {k: v for k, v in os.environ.items() if k.startswith("WM_")}
    print(f"e2e_ab {args.label or knobs}: {1e3 * t:.1f} ms/forward "
          f"({args.views / t:.2f} f/s)  S={args.views} img={args.img} "
          f"render={render}", flush=True)


if __name__ == "__main__":
    main()
