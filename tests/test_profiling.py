"""Profiling harness sanity (SURVEY.md §5.1 — greenfield)."""

import jax.numpy as jnp
import numpy as np

from hunyuanworld_mirror_tpu.utils import profiling


def test_phase_timer_and_time_fn():
    timer = profiling.PhaseTimer()
    x = jnp.ones((8, 8))
    with timer.phase("square", sync_value=x):
        y = x * x
    timer.record("fixed", 0.01)
    s = timer.summary()
    assert "square" in s and "fixed" in s

    t = profiling.time_fn(lambda a: a @ a, x, iters=2)
    assert t > 0


def test_roofline_bounds():
    # 1 TFLOP of pure compute on a 459 TFLOP/s chip -> ~2.18 ms SoL
    r = profiling.roofline(1e12, 0.0, seconds=4.36e-3)
    assert r["bound"] == "compute"
    assert abs(r["t_sol_ms"] - 2.18) < 0.05
    assert abs(r["sol_fraction"] - 0.5) < 0.01
    # memory-bound case
    r2 = profiling.roofline(1e9, 2765e9 * 1e-3, seconds=2e-3)
    assert r2["bound"] == "memory"
    assert abs(r2["t_sol_ms"] - 1.0) < 0.01


def test_vgt_flops_scaling():
    base = profiling.vgt_flops(1, 2, 1376, 1024, 24)
    # global attention is quadratic in S at fixed P
    bigger = profiling.vgt_flops(1, 8, 1376, 1024, 24)
    assert bigger > 4 * base  # superlinear in views
    assert base > 1e12  # ViT-L trunk at 2 views is TFLOP-scale
