"""Attention-kernel A/B at the trunk's global shape (in-jit repeat, one
process per run is NOT needed — no env-keyed trace caches, impls selected
by argument).

Usage: python tools/attn_kernel_ab.py [--n 5496] [--b 1] [--h 16] [--d 64]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=5496)
    ap.add_argument("--b", type=int, default=1)
    ap.add_argument("--h", type=int, default=16)
    ap.add_argument("--d", type=int, default=64)
    ap.add_argument("--k", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import bench
    from hunyuanworld_mirror_tpu.models import block as block_lib

    B, H, N, D = args.b, args.h, args.n, args.d
    key = jax.random.PRNGKey(0)
    q, k, v = (jax.random.normal(kk, (B, N, H, D), jnp.bfloat16)
               for kk in jax.random.split(key, 3))
    scale = D ** -0.5
    floor = bench.measure_floor()

    def perturb(args_, acc, i):
        return (args_[0] + acc + i * 1e-9,) + tuple(args_[1:])

    def run(name, fn):
        try:
            t = bench._timed_repeat(fn, perturb, (q, k, v), args.k, floor)
            flops = 4.0 * B * H * N * N * D
            print(f"{name:16s}: {1e3 * t:7.2f} ms  "
                  f"({flops / t / 1e12:6.1f} TF/s)", flush=True)
        except Exception as e:
            print(f"{name:16s}: FAILED {type(e).__name__}: {e}"[:200],
                  flush=True)

    def einsum_attn(q, k, v):
        logits = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k)
        w = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(q.dtype)
        return jnp.einsum("bhnm,bmhd->bnhd", w, v)

    run("einsum", einsum_attn)
    run("flash_b512", lambda q, k, v: block_lib._flash_core(q, k, v, scale))

    os.environ["WM_FLASH_BLOCK"] = "1024"
    run("flash_b1024", lambda q, k, v: block_lib._flash_core(q, k, v, scale))
    os.environ.pop("WM_FLASH_BLOCK")

    # splash attention (newer TPU kernel, no segment ids -> pad K with -inf
    # effect via zero-length... here: pad tokens attend freely but padded
    # KEYS are masked by restricting the mask; simplest honest variant pads
    # N to a 128 multiple and masks padded keys with a NumpyMask)
    try:
        import numpy as np
        from jax.experimental.pallas.ops.tpu.splash_attention import (
            splash_attention_kernel as sk, splash_attention_mask as sm)

        npad = -(-N // 512) * 512
        mask_np = np.zeros((npad, npad), dtype=bool)
        mask_np[:N, :N] = True
        mha_mask = sm.MultiHeadMask([sm.NumpyMask(mask_np)] * H)
        kernel = sk.make_splash_mha_single_device(mha_mask)

        def splash(q, k, v):
            pad = npad - N
            cfgp = ((0, 0), (0, 0), (0, pad), (0, 0))
            qt = jnp.pad(jnp.transpose(q, (0, 2, 1, 3)), cfgp) * scale
            kt = jnp.pad(jnp.transpose(k, (0, 2, 1, 3)), cfgp)
            vt = jnp.pad(jnp.transpose(v, (0, 2, 1, 3)), cfgp)
            out = jax.vmap(kernel)(qt, kt, vt)
            return jnp.transpose(out[:, :, :N], (0, 2, 1, 3))

        run("splash", splash)
    except Exception as e:
        print(f"splash setup failed: {type(e).__name__}: {e}"[:300])

    from hunyuanworld_mirror_tpu.ops.attn_onepass import onepass_attention
    run("onepass", lambda q, k, v: onepass_attention(q, k, v, scale))

    # correctness spot-check vs einsum oracle
    import numpy as np
    ref = np.asarray(einsum_attn(q, k, v), np.float32)
    fl = np.asarray(block_lib._flash_core(q, k, v, scale), np.float32)
    print(f"flash max|d| vs einsum: {np.abs(ref - fl).max():.2e}")
    op = np.asarray(onepass_attention(q, k, v, scale), np.float32)
    print(f"onepass max|d| vs einsum: {np.abs(ref - op).max():.2e}")


if __name__ == "__main__":
    main()
