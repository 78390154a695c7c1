"""Per-stage profile of ONE DPT head on the real chip (in-jit repeat).

The single-forward xprof trace (round 4) shows conv_general_dilated at
51.7 ms/forward and the resize matmul at 11.8 ms — this tool splits a head
into token-projection / scratch+fusion / full-res output stages so the
optimization lands where the time is, and A/Bs compute dtypes honestly
(the round-3 per-call A/B was floor-dominated).

Usage: python tools/heads_profile.py [--views 4] [--img 518] [--k 8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def readback(x):
    return float(jnp.asarray(jax.tree.leaves(x)[0]).reshape(-1)[0])


def time_once(fn, *args, iters=2, warmup=1):
    for _ in range(warmup):
        readback(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        readback(fn(*args))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=4)
    ap.add_argument("--img", type=int, default=518)
    ap.add_argument("--k", type=int, default=8)
    args = ap.parse_args()

    from hunyuanworld_mirror_tpu.models import (aggregator, camera_head, dpt,
                                                nn, worldmirror)
    from hunyuanworld_mirror_tpu.ops.interpolate import resize_bilinear

    S, IMG, K = args.views, args.img, args.k
    cfg = worldmirror.WorldMirrorConfig(img_size=IMG)
    params = worldmirror.init(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                          if x.dtype == jnp.float32 else x, params)
    views = {"img": jnp.ones((1, S, IMG, IMG, 3), jnp.float32) * 0.5}
    imgs = views["img"]
    B, _, H, W, _ = imgs.shape

    token_list = jax.jit(lambda p, im: aggregator.forward(p, cfg.vgt, im)[0])(
        params["vgt"], imgs)
    token_list = jax.tree.map(lambda x: x, token_list)
    start = cfg.vgt.patch_start_idx

    floor = time_once(jax.jit(lambda x: x + 1.0), jnp.ones((8, 128)), iters=4)
    print(f"floor {1e3 * floor:.1f} ms")

    def repeat(fn, k):
        def rep(*a):
            acc = 0.0
            out = None
            for i in range(k):
                out = fn(a[0], jax.tree.map(
                    lambda t: t + acc + i * 1e-9
                    if t.dtype in (jnp.float32, jnp.bfloat16) else t, a[1]),
                    *a[2:])
                acc = jnp.asarray(jax.tree.leaves(out)[0]).reshape(-1)[0] \
                    * 1e-12
            return out
        return jax.jit(rep)

    # ---- full head at each dtype ----
    for dt in ("float32", "bfloat16"):
        hcfg = cfg._dpt(4, "inv_log+expp1")
        hcfg = type(hcfg)(**{**hcfg.__dict__, "compute_dtype": dt})

        def head_fn(p, toks, im, hcfg=hcfg):
            return dpt.forward(p["pts_head"], hcfg, toks, im, start)

        r = repeat(head_fn, K)
        t = (time_once(r, params, token_list, imgs) - floor) / K
        print(f"pts_head full ({dt:8s}): {1e3 * t:7.1f} ms", flush=True)

    # ---- stage split (fp32, the production dtype) ----
    hcfg = cfg._dpt(4, "inv_log+expp1")
    ph, pw = H // 14, W // 14
    p = params["pts_head"]

    def stage_tokens(p, toks, im):
        feats = []
        resizers = [
            lambda t: nn.conv_transpose(p["resize0"], t, 4),
            lambda t: nn.conv_transpose(p["resize1"], t, 2),
            lambda t: t,
            lambda t: nn.conv(p["resize3"], t, stride=2, padding=1),
        ]
        for lvl in range(4):
            tokens = token_list[lvl][:, :, start:].astype(jnp.float32)
            tokens = tokens.reshape(B * S, ph * pw, tokens.shape[-1])
            tokens = nn.layer_norm(p["norm"], tokens, eps=1e-5)
            feat = tokens.reshape(B * S, ph, pw, tokens.shape[-1])
            feat = nn.conv(p["projects"][lvl], feat)
            feat = dpt._apply_pos_embed(feat, W, H)
            feats.append(resizers[lvl](feat))
        return feats

    def stage_fusion(p, feats):
        l1 = nn.conv(p["layer_rn"][0], feats[0], padding=1)
        l2 = nn.conv(p["layer_rn"][1], feats[1], padding=1)
        l3 = nn.conv(p["layer_rn"][2], feats[2], padding=1)
        l4 = nn.conv(p["layer_rn"][3], feats[3], padding=1)
        out = dpt._fusion_block(p["refine4"], l4, size=l3.shape[-3:-1])
        out = dpt._fusion_block(p["refine3"], out, l3, size=l2.shape[-3:-1])
        out = dpt._fusion_block(p["refine2"], out, l2, size=l1.shape[-3:-1])
        out = dpt._fusion_block(p["refine1"], out, l1)
        return nn.conv(p["output_conv1"], out, padding=1)

    def stage_fullres(p, out):
        fused = resize_bilinear(out, (H, W), align_corners=True)
        fused = dpt._apply_pos_embed(fused, W, H)
        head = nn.conv(p["output_conv2"]["conv1"], fused, padding=1)
        head = nn.conv(p["output_conv2"]["conv2"], jax.nn.relu(head))
        return dpt.activate_head(head.astype(jnp.float32), hcfg.activation)[0]

    feats = jax.jit(lambda p, tl, im: stage_tokens(p, tl, im))(
        p, token_list, imgs)
    feats = jax.tree.map(lambda x: x, feats)
    out1 = jax.jit(stage_fusion)(p, feats)
    out1 = jax.tree.map(lambda x: x, out1)

    r = repeat(lambda p, toks, im: stage_tokens(p, toks, im), K)
    t_tok = (time_once(r, p, token_list, imgs) - floor) / K
    r = repeat(stage_fusion, K)
    t_fus = (time_once(r, p, feats) - floor) / K
    r = repeat(stage_fullres, K)
    t_out = (time_once(r, p, out1) - floor) / K
    print(f"tokens+proj+resize : {1e3 * t_tok:7.1f} ms")
    print(f"scratch+fusion     : {1e3 * t_fus:7.1f} ms")
    print(f"fullres out convs  : {1e3 * t_out:7.1f} ms")


if __name__ == "__main__":
    main()
