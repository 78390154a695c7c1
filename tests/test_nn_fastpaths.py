"""Round-4 structural fast paths must stay bit-equivalent to the XLA
reference lowerings they replace (nn.conv space-to-depth patchify,
nn.conv_transpose pixel-shuffle deconv, the fused pts+norm head decode, and
the gs-param-fused head chunking)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from hunyuanworld_mirror_tpu.models import nn, worldmirror


def test_patchify_conv_matches_lax(rng):
    x = jnp.asarray(rng.normal(size=(2, 28, 42, 3)), jnp.float32)
    p = nn.conv_init(jax.random.PRNGKey(1), 3, 32, 14)
    ref = lax.conv_general_dilated(
        x, p["w"], window_strides=(14, 14), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["b"]
    got = nn.conv(p, x, stride=14, padding="VALID")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-6, rtol=1e-6)


def test_conv_transpose_matches_lax(rng):
    for k, st in ((4, 4), (2, 2), (3, 2)):  # fast path, fast path, general
        x = jnp.asarray(rng.normal(size=(2, 7, 9, 16)), jnp.float32)
        p = nn.conv_transpose_init(jax.random.PRNGKey(1), 16, 12, k)
        ref = lax.conv_transpose(
            x, p["w"], strides=(st, st), padding="VALID",
            dimension_numbers=("NHWC", "HWOI", "NHWC")) + p["b"]
        got = nn.conv_transpose(p, x, st)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-6, rtol=1e-6, err_msg=f"k={k}")


_TINY = dict(img_size=56, patch_size=14, embed_dim=64, gs_dim=32,
             patch_embed="conv", trunk_depth=2, trunk_heads=4,
             intermediate_idxs=(0, 0, 1, 1))


def test_fused_parallel_heads_equivalent():
    cfg0 = worldmirror.WorldMirrorConfig(**_TINY)
    cfg1 = worldmirror.WorldMirrorConfig(fuse_parallel_heads=True, **_TINY)
    params = worldmirror.init(jax.random.PRNGKey(0), cfg0)
    views = {"img": jnp.ones((1, 3, 56, 56, 3), jnp.float32) * 0.5}
    a = jax.jit(lambda p, v: worldmirror.forward(
        p, cfg0, v, render=False))(params, views)
    b = jax.jit(lambda p, v: worldmirror.forward(
        p, cfg1, v, render=False))(params, views)
    for k in ("pts3d", "pts3d_conf", "normals", "normals_conf", "depth"):
        np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                   atol=1e-5, err_msg=k)


def test_gs_chunked_raw_params_bit_match_unchunked_path():
    """The head-chunked gs path reduces each chunk's fused map to raw splat
    params in-loop (S=64 memory fix); its raw output must match running the
    gs-head conv on the whole chunked fused map (the pre-round-4 path)."""
    from hunyuanworld_mirror_tpu.models import aggregator, dpt, gaussians

    cfg = worldmirror.WorldMirrorConfig(head_chunk=2, **_TINY)
    params = worldmirror.init(jax.random.PRNGKey(0), cfg)
    imgs = jnp.ones((1, 4, 56, 56, 3), jnp.float32) * 0.5
    B, S, H, W, _ = imgs.shape
    token_list, start = aggregator.forward(params["vgt"], cfg.vgt, imgs)

    ck, n = 2, 2

    def split(x):
        return x.reshape(B, n, ck, *x.shape[2:]).swapaxes(0, 1)

    toks = tuple(split(t) for t in token_list)
    ims = split(imgs)

    def one(args):
        ts, im = args
        fused, gd, gdc = dpt.forward(params["gs_head"], cfg.gs_head,
                                     list(ts), im, start)
        raw = gaussians._gs_head_apply(
            params["gs_renderer"],
            fused.reshape(B * ck, H, W, fused.shape[-1]))
        return raw.reshape(B, ck, H, W, -1)

    raw_fused = jax.lax.map(one, (toks, ims))
    raw_fused = raw_fused.swapaxes(0, 1).reshape(B * S, H, W, -1)

    outs = jax.lax.map(
        lambda a: dpt.forward(params["gs_head"], cfg.gs_head, list(a[0]),
                              a[1], start), (toks, ims))
    fused_whole = outs[0].swapaxes(0, 1).reshape(B, S, H, W, -1)
    raw_whole = gaussians._gs_head_apply(
        params["gs_renderer"], fused_whole.reshape(B * S, H, W, -1))

    np.testing.assert_array_equal(np.asarray(raw_fused),
                                  np.asarray(raw_whole))
