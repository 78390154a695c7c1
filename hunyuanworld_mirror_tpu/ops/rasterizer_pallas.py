"""Pallas TPU tile rasterizer: the hand-scheduled form of rasterizer.py.

Replaces gsplat's CUDA RasterizeToPixels3DGSFwd.cu (reference: each 16x16
tile = one thread block, shared-memory splat staging, sequential per-splat
transmittance loop with early exit). The TPU formulation keeps the identical
numerics but restructures the loop for the VPU/MXU:

  grid = (n_tiles, n_chunks): chunk axis iterates sequentially, so per-pixel
  carries (log-transmittance, stop flag) live in VMEM scratch across chunks.

  per chunk of K splats (K x P arrays, P = tile_size^2 pixels in lanes):
    sigma/alpha          elementwise (VPU)
    prefix log(1-alpha)  flat kernels: one (P, K) @ (K, K) inclusive-
                         triangular MXU matmul (the 9-pass roll scan was
                         >half the per-chunk VPU time); the dense kernel
                         below keeps the Hillis-Steele roll scan
    early-stop mask      NONE needed in the flat kernels: T is monotone
                         non-increasing, so liveness is each entry's own
                         T_after > T_EPS
    color accumulation   w^T @ colors on the MXU
    carry update         T *= chunk's total (1-alpha) product

Gradients: the flagship `rasterize_flat_pallas` path wears a custom VJP
whose backward is the hand-written in-kernel `_kernel_flat_bwd` (two
front-to-back Pallas sweeps over the re-binned flat list; TPU grads
validated in tests/test_rasterizer_pallas.py and tools/tpu_bwd_check.py).
Only the dense-bin variant `rasterize_binned_pallas` still backprops by
replaying the mathematically identical JAX formulation (rasterizer.py)
through jax.vjp.
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import tiles

ALPHA_THRESHOLD = 1.0 / 255.0
T_EPS = 1e-4
NEG_INF_GUARD = -30.0  # log-space floor; exp(-30) ~ 1e-13 << T_EPS


def _scan_sub(chunk: int) -> int:
    """Transmittance-scan sub-block width (WM_RASTER_SCAN_SUB, default 128).

    The triangular-matmul prefix scan costs P*W MACs per intersection at
    width W; scanning in SUB-wide sub-blocks with an additive carry cuts MXU
    work by chunk/SUB (512->128 = 4x) at identical math (the log-space sums
    merely reassociate). SUB=chunk recovers the single-dot form."""
    import os
    sub = int(os.environ.get("WM_RASTER_SCAN_SUB", "128"))
    sub = max(128, min(chunk, (sub // 128) * 128))
    # clamp to the largest 128-multiple DIVISOR of chunk: a non-divisor
    # (e.g. 256 with chunk 384) would drop trailing columns (advisor r4)
    while chunk % sub:
        sub -= 128
    return sub


def _mxu_cumsum_incl(x, chunk: int, carry0=None):
    """Inclusive lane-prefix-sum of (P, chunk) via (SUB, SUB) triangular MXU
    dots with an additive carry across sub-blocks (see _scan_sub).
    carry0 (P, 1) is added to every prefix (cross-chunk carry)."""
    SUB = _scan_sub(chunk)
    _r = lax.broadcasted_iota(jnp.int32, (SUB, SUB), 0)
    _c = lax.broadcasted_iota(jnp.int32, (SUB, SUB), 1)
    tri = (_r <= _c).astype(jnp.float32)
    P = x.shape[0]
    carry = (jnp.zeros((P, 1), jnp.float32) if carry0 is None else carry0)
    parts = []
    for sb in range(chunk // SUB):
        cum_sb = lax.dot_general(
            x[:, sb * SUB:(sb + 1) * SUB], tri,
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32) + carry
        parts.append(cum_sb)
        carry = cum_sb[:, SUB - 1:SUB]
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)


def _use_mxu_sigma() -> bool:
    """WM_RASTER_MXU_SIGMA=1 evaluates sigma via _sigma_mxu (A/B knob; NB
    any in-process A/B must clear _rasterize_jit's cache — env vars are not
    trace-cache keys). Default OFF: the cache-cleared round-4 A/B at
    S=4/518px G=1 measured direct elementwise sigma FASTER (102.9 vs
    113.0 ms with SUB=128; 134.7 vs 146.4 with SUB=512) — the coefficient
    builds + K=6 dot cost more than the dx/dy elementwise they replace."""
    import os
    return os.environ.get("WM_RASTER_MXU_SIGMA", "0") == "1"


def _sigma_mxu(feat, mx, my, ca, cb, cc, cx, cy):
    """sigma(p) = 0.5*ca*dx^2 + 0.5*cc*dy^2 + cb*dx*dy for every (pixel,
    entry) pair as ONE (P, 6) @ (6, CH) MXU dot over tile-relative coords
    (cancellation-free; global 518px coords would lose ~3e-2 absolute).
    Coefficient rows are (1, CH) — O(CH) VPU work instead of O(P*CH).
    The expanded quadratic carries ~1e-6 reassociation noise, so the strict
    sigma >= 0 validity test would drop a splat's CENTER pixel (exact
    sigma == 0); small negatives are clamped to 0 so the test stays about
    invalid conics only, like the CUDA `sigma < 0` skip."""
    mxr = mx - cx
    myr = my - cy
    A = 0.5 * ca
    Bq = 0.5 * cc
    D = -(ca * mxr + cb * myr)
    E = -(cc * myr + cb * mxr)
    F = A * mxr * mxr + Bq * myr * myr + cb * mxr * myr
    coef = jnp.concatenate([A, Bq, cb, D, E, F], axis=0)   # (6, CH)
    sigma = lax.dot_general(
        feat, coef, dimension_numbers=(((1,), (0,)), ((), ())),
        precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)                # (P, CH)
    return jnp.maximum(sigma, jnp.where(sigma >= -1e-3, 0.0, sigma))


def _prefix_scan_add(x, exclusive: bool):
    """Prefix sum along axis 0 (sublanes) of a (K, P) block via log-step
    shifted adds. K must be a power of two."""
    K = x.shape[0]
    row = lax.broadcasted_iota(jnp.int32, x.shape, 0)
    if exclusive:
        shifted = pltpu.roll(x, 1, axis=0)
        x = jnp.where(row >= 1, shifted, 0.0)
    d = 1
    while d < K:
        shifted = pltpu.roll(x, d, axis=0)
        x = x + jnp.where(row >= d, shifted, 0.0)
        d *= 2
    return x


def _kernel(counts_ref, packed_ref,
            out_ref, alpha_ref, logt_ref, stop_ref, *,
            tile_size: int, tw: int, chunk: int, n_chunks: int, d_col: int):
    t = pl.program_id(0)
    j = pl.program_id(1)
    P = tile_size * tile_size

    @pl.when(j == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)
        alpha_ref[...] = jnp.zeros_like(alpha_ref)
        logt_ref[...] = jnp.zeros_like(logt_ref)
        stop_ref[...] = jnp.zeros_like(stop_ref)

    count = counts_ref[t]  # full counts vector resident in SMEM

    # Early termination, the TPU analogue of the CUDA kernel's per-tile break:
    # skip whole chunks once past this tile's splat count or once every pixel's
    # transmittance tripped.
    beyond_count = j * chunk >= count
    all_stopped = jnp.min(stop_ref[0, :]) >= 0.5

    @pl.when(jnp.logical_not(beyond_count | all_stopped))
    def _body():
        # Global pixel centers for this tile: P pixels along lanes.
        origin_x = (t % tw) * tile_size
        origin_y = (t // tw) * tile_size
        pix = lax.broadcasted_iota(jnp.int32, (1, P), 1)
        px = (origin_x + pix % tile_size).astype(jnp.float32) + 0.5
        py = (origin_y + pix // tile_size).astype(jnp.float32) + 0.5

        # packed rows: [mx, my, ca, cb, cc, op, color...]
        mx = packed_ref[0, :, 0:1]         # (K, 1)
        my = packed_ref[0, :, 1:2]
        ca = packed_ref[0, :, 2:3]
        cb = packed_ref[0, :, 3:4]
        cc = packed_ref[0, :, 4:5]
        op = packed_ref[0, :, 5:6]

        dx = px - mx                        # (K, P)
        dy = py - my
        sigma = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
        alpha = jnp.minimum(0.999, op * jnp.exp(-sigma))

        slot = j * chunk + lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
        keep = (sigma >= 0) & (alpha >= ALPHA_THRESHOLD) & (slot < count)
        alpha = jnp.where(keep, alpha, 0.0)

        lg = jnp.log1p(-alpha)              # 0 for masked splats
        cum_excl = _prefix_scan_add(lg, exclusive=True)

        log_t_carry = logt_ref[0:1, :]      # (1, P)
        log_T_before = jnp.maximum(log_t_carry + cum_excl, NEG_INF_GUARD)
        T_before = jnp.exp(log_T_before)
        T_after = T_before * (1.0 - alpha)

        tripped = ((T_after <= T_EPS) & (alpha > 0)).astype(jnp.float32)
        stopped_incl = _prefix_scan_add(tripped, exclusive=False)
        dead = jnp.maximum(stop_ref[0:1, :], jnp.minimum(stopped_incl, 1.0))

        w = alpha * T_before * (1.0 - dead)  # (K, P)

        col = packed_ref[0, :, 6:6 + d_col]  # (K, D)
        out_ref[0, :, :] = out_ref[0, :, :] + jax.lax.dot_general(
            w, col, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)         # (P, D)
        alpha_ref[0, :, 0] = alpha_ref[0, :, 0] + jnp.sum(w, axis=0)

        logt_ref[0:1, :] = log_t_carry + jnp.sum(lg, axis=0, keepdims=True)
        stop_ref[0:1, :] = jnp.maximum(stop_ref[0:1, :],
                                       jnp.minimum(jnp.sum(tripped, axis=0,
                                                           keepdims=True), 1.0))


def _forward_pallas(means2d, conics, colors, opacities, gauss_ids, counts,
                    width: int, height: int, tile_size: int,
                    chunk: int = 512, interpret: bool = False):
    tw = (width + tile_size - 1) // tile_size
    th = (height + tile_size - 1) // tile_size
    n_tiles = tw * th
    P = tile_size * tile_size
    D = colors.shape[-1]
    MPT = gauss_ids.shape[1]
    assert MPT % chunk == 0, f"max_per_tile {MPT} must be a multiple of {chunk}"
    n_chunks = MPT // chunk

    # Stage per-tile splat data as ONE packed (T, MPT, 6+D) gather: a single
    # wide-row gather is ~4x faster on TPU than four narrow-row gathers, and
    # XLA's gather beats per-row DMA from inside the kernel by orders of
    # magnitude.
    table = jnp.concatenate([means2d, conics, opacities[:, None], colors], axis=-1)
    g_packed = table[gauss_ids]         # (T, MPT, 6+D)

    kernel = functools.partial(_kernel, tile_size=tile_size, tw=tw,
                               chunk=chunk, n_chunks=n_chunks, d_col=D)

    out, alpha = pl.pallas_call(
        kernel,
        grid=(n_tiles, n_chunks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # counts: whole (T,) vector
            pl.BlockSpec((1, chunk, 6 + D), lambda t, j: (t, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, P, D), lambda t, j: (t, 0, 0)),
            pl.BlockSpec((1, P, 1), lambda t, j: (t, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, P, D), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, P, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, P), jnp.float32),   # log transmittance carry
            pltpu.VMEM((1, P), jnp.float32),   # stop flag carry
        ],
        interpret=interpret,
    )(counts, g_packed)

    img = out.reshape(th, tw, tile_size, tile_size, D)
    img = img.transpose(0, 2, 1, 3, 4).reshape(th * tile_size, tw * tile_size, D)
    a = alpha.reshape(th, tw, tile_size, tile_size)
    a = a.transpose(0, 2, 1, 3).reshape(th * tile_size, tw * tile_size)
    return img[:height, :width], a[:height, :width, None]


# ---------------------------------------------------------------------------
# Flat-sorted-list kernel: no dense per-tile staging gathers
# ---------------------------------------------------------------------------
#
# The dense path above needs two XLA gathers per camera (sorted ids -> dense
# (T, MPT) layout, then table[gauss_ids]); at ~4M intersections those cost
# 30-100ms each on v5e while the sort itself is ~6ms. This kernel instead
# consumes the *globally sorted* component-major intersection list from
# tiles.bin_gaussians_packed directly: per tile it double-buffer-DMAs
# chunk-aligned slices of the flat list from HBM and masks entries outside
# [start, start+count). Orientation flips vs the dense kernel: pixels ride
# sublanes, splat entries ride lanes, so the per-chunk payload block (V, CH)
# needs no transpose — (1, CH) component rows broadcast against (P, CH)
# pixel math, and the color contraction is dot((P,CH), (D,CH)^T) on the MXU.


# --- f16-packed payload (inference fast path) ------------------------------
#
# The isect sort's cost is ~linear in operand count (measured 18.4 ms at 12
# operands vs 8.4 ms at 7, 2.15M rows, v5e). The inference path packs the 8
# precision-tolerant payload planes (conics, opacity, rgb, depth) into 4 i32
# planes of f16 pairs; means2d stays f32 (f16 would cost 0.25-0.5 px at
# 518px). Mosaic has no f16 vregs, so the kernel decodes f16 bits manually:
# f32 bits = sign<<31 | (e+112)<<23 | m<<13 (subnormals flushed — payload
# magnitudes are >= 6e-5 where it matters), then one same-width i32->f32
# bitcast. Training paths keep the exact f32 payload.

def pack_f16_pairs(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Two f32 planes -> one f32 plane whose BITS are (f16(a) << 16)|f16(b)."""
    ah = a.astype(jnp.float16).view(jnp.uint16).astype(jnp.uint32)
    bh = b.astype(jnp.float16).view(jnp.uint16).astype(jnp.uint32)
    return ((ah << 16) | bh).view(jnp.float32)


def _f16_bits_to_f32(h):
    """(u32 with f16 bits in the low 16) -> f32 value, flush-subnormal."""
    s = (h & jnp.uint32(0x8000)) << jnp.uint32(16)
    e = (h >> jnp.uint32(10)) & jnp.uint32(0x1F)
    m = h & jnp.uint32(0x3FF)
    mag = jnp.where(e == 0, jnp.uint32(0),
                    ((e + jnp.uint32(112)) << jnp.uint32(23))
                    | (m << jnp.uint32(13)))
    return lax.bitcast_convert_type((s | mag).astype(jnp.int32), jnp.float32)


def _unpack_f16_row(row_f32):
    """One packed (1, CH) f32 row -> two (1, CH) f32 rows (hi, lo)."""
    u = lax.bitcast_convert_type(row_f32, jnp.int32).astype(jnp.uint32)
    hi = _f16_bits_to_f32(u >> jnp.uint32(16))
    lo = _f16_bits_to_f32(u & jnp.uint32(0xFFFF))
    return hi, lo


def _payload_rows(b, d_col: int, f16: bool):
    """Decode one staged payload block (V, CH) into its component rows.

    f32 layout: [mx, my, ca, cb, cc, op, col_0..col_{D-1}]
    f16 layout: [mx, my, ca|cb, cc|op, col pairs...] (pack_f16_pairs)
    Returns (mx, my, ca, cb, cc, op, col_t (D, CH)).
    """
    if not f16:
        return (b[0:1, :], b[1:2, :], b[2:3, :], b[3:4, :], b[4:5, :],
                b[5:6, :], b[6:6 + d_col, :])
    mx, my = b[0:1, :], b[1:2, :]
    ca, cb = _unpack_f16_row(b[2:3, :])
    cc, op = _unpack_f16_row(b[3:4, :])
    cols = []
    for j in range(-(-d_col // 2)):
        hi, lo = _unpack_f16_row(b[4 + j:5 + j, :])
        cols.extend((hi, lo))
    col_t = jnp.concatenate(cols[:d_col], axis=0)
    return mx, my, ca, cb, cc, op, col_t


def _kernel_flat(starts_ref, counts_ref, packed_hbm,
                 out_ref, alpha_ref, buf, sem, *,
                 tile_size: int, tw: int, chunk: int, max_chunks: int,
                 d_col: int, M: int, n_tiles: int = 0,
                 f16_payload: bool = False):
    t = pl.program_id(0)
    P = tile_size * tile_size

    out_ref[...] = jnp.zeros_like(out_ref)
    alpha_ref[...] = jnp.zeros_like(alpha_ref)

    start = starts_ref[t]
    count = counts_ref[t]
    n_blocks = M // chunk  # M is a chunk multiple (padded by _forward_flat)
    b0 = jnp.minimum(start // chunk, n_blocks - 1)
    a0 = b0 * chunk
    total = (start - a0) + count
    nch = jnp.minimum((total + chunk - 1) // chunk, max_chunks)

    # camera-batched grids run C*n_tiles programs over one packed list; the
    # pixel origin depends only on the within-camera tile index
    tl = t if n_tiles == 0 else t - (t // n_tiles) * n_tiles
    origin_x = (tl % tw) * tile_size
    origin_y = (tl // tw) * tile_size
    pix = lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    px = (origin_x + pix % tile_size).astype(jnp.float32) + 0.5   # (P, 1)
    py = (origin_y + pix // tile_size).astype(jnp.float32) + 0.5

    # MXU-sigma pixel features: sigma is a fixed quadratic in (px, py), so
    # all P*CH evaluations collapse to ONE (P, 6) @ (6, CH) MXU dot per
    # chunk — the VPU was the kernel's critical path (round-4: the dx/dy/
    # sigma elementwise was ~9 of ~25 P*CH passes; the tri-matmul cut
    # measured flat because the MXU idles while the VPU works). Coordinates
    # are TILE-RELATIVE (|p| <= tile_size/2 + 0.5) so the expanded quadratic
    # stays cancellation-free in fp32 (global 518px coords would lose ~3e-2
    # absolute in sigma to cancellation).
    cx = origin_x + tile_size * 0.5
    cy = origin_y + tile_size * 0.5
    pxr = px - cx                                                 # (P, 1)
    pyr = py - cy
    ones_p = jnp.ones((P, 1), jnp.float32)
    feat = jnp.concatenate(
        [pxr * pxr, pyr * pyr, pxr * pyr, pxr, pyr, ones_p], axis=1)  # (P, 6)

    def dma(slot, j):
        # packed is CHUNK-MAJOR (n_blocks, V, chunk): one chunk's every
        # component row is contiguous in HBM, so this is a single ~V*chunk*4B
        # contiguous copy. The old (V, M) layout made each chunk V strided
        # ~2 KB transfers whose DMA latency (~11 us, longer than the chunk's
        # ~5 us of compute) was the kernel's real bound — round-4: both the
        # tri-matmul cut and the MXU-sigma cut measured flat because the
        # loop sat in dma.wait().
        blk = jnp.minimum(b0 + j, n_blocks - 1)
        return pltpu.make_async_copy(
            packed_hbm.at[blk], buf.at[slot], sem.at[slot])

    @pl.when(nch > 0)
    def _run():
        dma(0, 0).start()

        def body(carry):
            j, tcar = carry
            slot = lax.rem(j, 2)
            dma(slot, j).wait()

            @pl.when(j + 1 < nch)
            def _prefetch():
                dma(1 - slot, j + 1).start()

            b = buf[slot]                     # (V, CH)
            mx, my, ca, cb, cc, op, col_t = _payload_rows(
                b, d_col, f16_payload)

            if _use_mxu_sigma():
                sigma = _sigma_mxu(feat, mx, my, ca, cb, cc, cx, cy)
            else:
                dx = px - mx                  # (P, CH)
                dy = py - my
                sigma = (0.5 * (ca * dx * dx + cc * dy * dy)
                         + cb * dx * dy)
            alpha = jnp.minimum(0.999, op * jnp.exp(-sigma))

            off = jnp.minimum(b0 + j, n_blocks - 1) * chunk
            g = off + lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
            keep = ((sigma >= 0) & (alpha >= ALPHA_THRESHOLD)
                    & (g >= start) & (g < start + count))
            alpha = jnp.where(keep, alpha, 0.0)

            # transmittance via MXU-cumsum: the lane prefix sum of
            # log1p(-alpha) is an inclusive-triangular matmul per SUB-wide
            # sub-block (_mxu_cumsum_incl) — MXU dots replace the 9-pass
            # Hillis-Steele roll scan (the scans were >half the per-chunk
            # VPU time). Early stop needs NO second scan: T is monotone
            # non-increasing, so "some earlier entry tripped (T_after <=
            # T_EPS)" collapses to this entry's own T_after <= T_EPS — the
            # tripping entry itself is excluded exactly like the CUDA
            # kernel's break-before-blend (RasterizeToPixels3DGSFwd.cu).
            one_m = 1.0 - alpha
            lg = jnp.log(one_m)
            cum_incl = _mxu_cumsum_incl(lg, chunk)         # (P, CH)
            prod_incl = jnp.exp(cum_incl)
            T_after = tcar * prod_incl
            T_before = T_after / one_m
            w = alpha * T_before * (T_after > T_EPS)   # (P, CH)

            out_ref[0, :, :] = out_ref[0, :, :] + lax.dot_general(
                w, col_t, dimension_numbers=(((1,), (1,)), ((), ())),
                precision=lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)      # (P, D)
            alpha_ref[0, :, 0] = alpha_ref[0, :, 0] + jnp.sum(w, axis=1)

            tcar = tcar * prod_incl[:, chunk - 1:chunk]
            return j + 1, tcar

        def cond(carry):
            j, tcar = carry
            return (j < nch) & (jnp.max(tcar) > T_EPS)

        jf, _ = lax.while_loop(cond, body, (jnp.int32(0),
                                            jnp.ones((P, 1), jnp.float32)))

        # Drain: if the loop exited early (all pixels stopped) right after
        # prefetching chunk jf, that DMA is still in flight — wait it here so
        # its semaphore credit can't mispair with a later copy into the same
        # slot (scratch persists across grid steps).
        @pl.when(jf < nch)
        def _drain():
            dma(lax.rem(jf, 2), jf).wait()


def _kernel_flat_grouped(starts_ref, counts_ref, wbase_ref, packed_hbm,
                         out_ref, alpha_ref, buf, sem, *,
                         tile_size: int, tw: int, chunk: int, G: int,
                         Wc: int, d_col: int, M: int, n_groups: int,
                         f16_payload: bool = False):
    """G tiles per grid step, ONE windowed DMA per step.

    Round-3 measurement: the single-tile flat kernel runs ~35 us per tile
    program at full load (~9 us grid-step machinery + ~11 us DMA-latency per
    512-entry chunk that the double buffer cannot hide because chunk compute
    is shorter than DMA latency). Grouping G consecutive tiles amortizes the
    step overhead AND replaces ~G*2.3 small chunk copies with one Wc*chunk
    window copy (consecutive tiles are CONTIGUOUS in the sorted flat list),
    double-buffered across grid steps so the copy overlaps the previous
    group's compute. Window overflow (pathological tile saturation) is
    pre-clamped host-side by _group_windows into counts + n_dropped.
    """
    q = pl.program_id(0)
    P = tile_size * tile_size
    W = Wc * chunk

    def dma(slot, grp):
        g = jnp.minimum(grp, n_groups - 1)
        return pltpu.make_async_copy(
            packed_hbm.at[:, pl.ds(wbase_ref[g] // chunk * chunk, W)],
            buf.at[slot], sem.at[slot])

    @pl.when(q == 0)
    def _first():
        dma(0, 0).start()

    slot = lax.rem(q, 2)
    dma(slot, q).wait()

    @pl.when(q + 1 < n_groups)
    def _prefetch():
        dma(1 - slot, q + 1).start()

    out_ref[...] = jnp.zeros_like(out_ref)
    alpha_ref[...] = jnp.zeros_like(alpha_ref)

    base = wbase_ref[q]

    pix = lax.broadcasted_iota(jnp.int32, (P, 1), 0)

    for g in range(G):                                # python-unrolled
        t = q * G + g
        start = starts_ref[t]
        count = counts_ref[t]                         # window-clamped
        off = start - base                            # in [0, W)
        j0 = off // chunk
        nch = jnp.minimum((off - j0 * chunk + count + chunk - 1) // chunk,
                          Wc)

        origin_x = (t % tw) * tile_size
        origin_y = (t // tw) * tile_size
        px = (origin_x + pix % tile_size).astype(jnp.float32) + 0.5
        py = (origin_y + pix // tile_size).astype(jnp.float32) + 0.5
        # MXU-sigma pixel features in tile-relative coords (see _kernel_flat)
        cx = origin_x + tile_size * 0.5
        cy = origin_y + tile_size * 0.5
        pxr = px - cx
        pyr = py - cy
        ones_p = jnp.ones((P, 1), jnp.float32)
        feat = jnp.concatenate(
            [pxr * pxr, pyr * pyr, pxr * pyr, pxr, pyr, ones_p], axis=1)

        def body(carry, g=g, start=start, count=count, j0=j0,
                 px=px, py=py, cx=cx, cy=cy, feat=feat):
            j, tcar = carry
            blk = jnp.minimum(j0 + j, Wc - 1)
            b = buf[slot, :, pl.ds(blk * chunk, chunk)]  # (V, CH) VMEM slice
            mx, my, ca, cb, cc, op, col_t = _payload_rows(
                b, d_col, f16_payload)

            if _use_mxu_sigma():
                sigma = _sigma_mxu(feat, mx, my, ca, cb, cc, cx, cy)
            else:
                dx = px - mx
                dy = py - my
                sigma = (0.5 * (ca * dx * dx + cc * dy * dy)
                         + cb * dx * dy)
            alpha = jnp.minimum(0.999, op * jnp.exp(-sigma))

            e = base + blk * chunk + lax.broadcasted_iota(
                jnp.int32, (1, chunk), 1)
            keep = ((sigma >= 0) & (alpha >= ALPHA_THRESHOLD)
                    & (e >= start) & (e < start + count))
            alpha = jnp.where(keep, alpha, 0.0)

            one_m = 1.0 - alpha
            lg = jnp.log(one_m)
            cum_incl = _mxu_cumsum_incl(lg, chunk)
            prod_incl = jnp.exp(cum_incl)
            T_after = tcar * prod_incl
            T_before = T_after / one_m
            w = alpha * T_before * (T_after > T_EPS)

            out_ref[g, :, :] = out_ref[g, :, :] + lax.dot_general(
                w, col_t, dimension_numbers=(((1,), (1,)), ((), ())),
                precision=lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
            alpha_ref[g, :, 0] = alpha_ref[g, :, 0] + jnp.sum(w, axis=1)
            tcar = tcar * prod_incl[:, chunk - 1:chunk]
            return j + 1, tcar

        def cond(carry, nch=nch):
            j, tcar = carry
            return (j < nch) & (jnp.max(tcar) > T_EPS)

        lax.while_loop(cond, body, (jnp.int32(0),
                                    jnp.ones((P, 1), jnp.float32)))


def _group_windows(starts, counts, n_tiles: int, G: int, chunk: int, Wc: int,
                   M: int):
    """Host-side window layout for the grouped kernel.

    Pads starts/counts to a G multiple, computes each group's chunk-aligned
    window base, and clamps counts so no tile reads past its group's static
    window (overflow only under pathological saturation; the clamped tail
    is the furthest splats of the saturated tiles — same semantics as the
    max_per_tile cap). Returns (starts_p, counts_p, wbase, extra_dropped).
    """
    n_groups = -(-n_tiles // G)
    pad = n_groups * G - n_tiles
    if pad:
        starts = jnp.concatenate(
            [starts, jnp.full((pad,), M, jnp.int32)])
        counts = jnp.concatenate([counts, jnp.zeros((pad,), jnp.int32)])
    wbase = (starts[::G] // chunk) * chunk             # (n_groups,)
    wbase = jnp.minimum(wbase, max(M - Wc * chunk, 0))
    wend = wbase + Wc * chunk
    wend_t = jnp.repeat(wend, G)
    counts_w = jnp.clip(wend_t - starts, 0, counts)
    # tiles starting beyond their window (only after an overflow) read base
    starts_p = jnp.clip(starts, jnp.repeat(wbase, G), wend_t)
    extra_dropped = jnp.sum(counts - counts_w)
    return starts_p, counts_w, wbase, extra_dropped.astype(jnp.int32)


def _forward_flat_grouped(packed, starts, counts, width: int, height: int,
                          tile_size: int, d_col: int, max_per_tile: int,
                          chunk: int = 512, G: int = 4,
                          interpret: bool = False,
                          f16_payload: bool = False):
    """Grouped-window forward over the flat sorted list (see kernel note)."""
    tw = (width + tile_size - 1) // tile_size
    th = (height + tile_size - 1) // tile_size
    n_tiles = tw * th
    n_groups = -(-n_tiles // G)
    P = tile_size * tile_size
    V, M = packed.shape
    pad_v = (-V) % 8
    # window spans G tiles' caps + alignment slack
    Wc = G * (-(-max_per_tile // chunk)) + 1
    pad_m = (-M) % chunk + max(0, Wc * chunk - M)
    if pad_v or pad_m:
        packed = jnp.pad(packed, ((0, pad_v), (0, pad_m)))
        V, M = packed.shape

    starts_p, counts_w, wbase, extra_dropped = _group_windows(
        starts, counts, n_tiles, G, chunk, Wc, M)

    kernel = functools.partial(
        _kernel_flat_grouped, tile_size=tile_size, tw=tw, chunk=chunk,
        G=G, Wc=Wc, d_col=d_col, M=M, n_groups=n_groups,
        f16_payload=f16_payload)

    out, alpha = pl.pallas_call(
        kernel,
        grid=(n_groups,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # starts
            pl.BlockSpec(memory_space=pltpu.SMEM),   # counts (clamped)
            pl.BlockSpec(memory_space=pltpu.SMEM),   # window bases
            pl.BlockSpec(memory_space=pl.ANY),       # packed in HBM
        ],
        out_specs=[
            pl.BlockSpec((G, P, d_col), lambda q: (q, 0, 0)),
            pl.BlockSpec((G, P, 1), lambda q: (q, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_groups * G, P, d_col), jnp.float32),
            jax.ShapeDtypeStruct((n_groups * G, P, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, V, Wc * chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(starts_p, counts_w, wbase, packed)

    out = out[:n_tiles]
    alpha = alpha[:n_tiles]
    img = out.reshape(th, tw, tile_size, tile_size, d_col)
    img = img.transpose(0, 2, 1, 3, 4).reshape(
        th * tile_size, tw * tile_size, d_col)
    a = alpha.reshape(th, tw, tile_size, tile_size)
    a = a.transpose(0, 2, 1, 3).reshape(th * tile_size, tw * tile_size)
    return img[:height, :width], a[:height, :width, None], extra_dropped


def _raster_chunk(default: int = 512) -> int:
    """Blend-kernel chunk width (entries per VMEM block). WM_RASTER_CHUNK
    overrides (multiple of 128). Smaller chunks waste fewer lanes on the
    ceil(count/chunk) granularity of sparsely-populated tiles at the cost
    of more DMA trips; sweep with tools/raster_chunk_ab.py."""
    import os
    c = int(os.environ.get("WM_RASTER_CHUNK", str(default)))
    return max(128, (c // 128) * 128)


def _forward_flat(packed, starts, counts, width: int, height: int,
                  tile_size: int, d_col: int, max_per_tile: int,
                  chunk: int = 512, interpret: bool = False,
                  f16_payload: bool = False):
    """Rasterize one camera from the flat sorted intersection list.

    Args:
      packed: (V, M) component-major sorted payload, rows
        [mx, my, ca, cb, cc, op, col_0..col_{D-1}].
      starts/counts: (T,) int32 per-tile segment bounds (counts pre-clamped
        to max_per_tile by the binning).
    """
    tw = (width + tile_size - 1) // tile_size
    th = (height + tile_size - 1) // tile_size
    n_tiles = tw * th
    P = tile_size * tile_size
    V, M = packed.shape
    # Mosaic alignment: slice dim 0 must be 8-sublane aligned; dynamic lane
    # offsets must be chunk (=128k) aligned, so M is padded to a chunk multiple
    pad_v = (-V) % 8
    pad_m = (-M) % chunk
    if pad_v or pad_m:
        packed = jnp.pad(packed, ((0, pad_v), (0, pad_m)))
        V, M = packed.shape
    # +1 chunk of slack: a tile's segment start is rarely chunk-aligned
    max_chunks = -(-max_per_tile // chunk) + 1
    # chunk-major relayout (n_blocks, V, chunk): see _kernel_flat.dma
    packed = packed.reshape(V, M // chunk, chunk).swapaxes(0, 1)

    kernel = functools.partial(
        _kernel_flat, tile_size=tile_size, tw=tw, chunk=chunk,
        max_chunks=max_chunks, d_col=d_col, M=M, f16_payload=f16_payload)

    out, alpha = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # starts
            pl.BlockSpec(memory_space=pltpu.SMEM),   # counts
            pl.BlockSpec(memory_space=pl.ANY),       # packed stays in HBM
        ],
        out_specs=[
            pl.BlockSpec((1, P, d_col), lambda t: (t, 0, 0)),
            pl.BlockSpec((1, P, 1), lambda t: (t, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, P, d_col), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, P, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, V, chunk), jnp.float32),  # double-buffered payload
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(starts, counts, packed)

    img = out.reshape(th, tw, tile_size, tile_size, d_col)
    img = img.transpose(0, 2, 1, 3, 4).reshape(th * tile_size, tw * tile_size, d_col)
    a = alpha.reshape(th, tw, tile_size, tile_size)
    a = a.transpose(0, 2, 1, 3).reshape(th * tile_size, tw * tile_size)
    return img[:height, :width], a[:height, :width, None]


def _forward_flat_multi(packed, starts, counts, n_cams: int, width: int,
                        height: int, tile_size: int, d_col: int,
                        max_per_tile: int, chunk: int = 512,
                        interpret: bool = False):
    """Camera-batched _forward_flat: one kernel launch over C*n_tiles tiles
    reading ONE globally sorted packed list (tiles.bin_gaussians_packed_multi
    layout — camera-major starts/counts). Returns (C, H, W, D), (C, H, W, 1).

    Forward-only (inference): the training path keeps the per-camera custom
    VJP (rasterize_flat_pallas)."""
    tw = (width + tile_size - 1) // tile_size
    th = (height + tile_size - 1) // tile_size
    n_tiles = tw * th
    P = tile_size * tile_size
    V, M = packed.shape
    pad_v = (-V) % 8
    pad_m = (-M) % chunk
    if pad_v or pad_m:
        packed = jnp.pad(packed, ((0, pad_v), (0, pad_m)))
        V, M = packed.shape
    max_chunks = -(-max_per_tile // chunk) + 1
    # chunk-major relayout (n_blocks, V, chunk): see _kernel_flat.dma
    packed = packed.reshape(V, M // chunk, chunk).swapaxes(0, 1)

    kernel = functools.partial(
        _kernel_flat, tile_size=tile_size, tw=tw, chunk=chunk,
        max_chunks=max_chunks, d_col=d_col, M=M, n_tiles=n_tiles)

    out, alpha = pl.pallas_call(
        kernel,
        grid=(n_cams * n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, P, d_col), lambda t: (t, 0, 0)),
            pl.BlockSpec((1, P, 1), lambda t: (t, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_cams * n_tiles, P, d_col), jnp.float32),
            jax.ShapeDtypeStruct((n_cams * n_tiles, P, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, V, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(starts, counts, packed)

    img = out.reshape(n_cams, th, tw, tile_size, tile_size, d_col)
    img = img.transpose(0, 1, 3, 2, 4, 5).reshape(
        n_cams, th * tile_size, tw * tile_size, d_col)
    a = alpha.reshape(n_cams, th, tw, tile_size, tile_size)
    a = a.transpose(0, 1, 3, 2, 4).reshape(
        n_cams, th * tile_size, tw * tile_size)
    return img[:, :height, :width], a[:, :height, :width, None]


def rasterize_flat_pallas_multi(means2d, conics, colors, opacities, radii,
                                depths, width: int, height: int,
                                tile_size: int, max_tiles_per_gauss: int,
                                max_per_tile: int, interpret: bool = False,
                                exact_test: bool = True):
    """Camera-batched flat path: ONE isect sort + ONE kernel launch for all
    C cameras (means2d/conics/colors/depths: (C, N, ...); opacities (C, N)).

    Motivation (tools/sort_ab.py, v5e): lax.sort time is flat in row count
    (39-49 ms from 1M to 4.2M rows), so C per-camera sorts cost ~C x one
    batched sort. At S=4/518px this cuts binning from ~128 ms to ~35 ms.
    Forward-only — no custom VJP; training uses the per-camera path.
    """
    from . import tiles

    tw = (width + tile_size - 1) // tile_size
    th = (height + tile_size - 1) // tile_size
    C, N, D = colors.shape

    values = (means2d[..., 0], means2d[..., 1], conics[..., 0],
              conics[..., 1], conics[..., 2], opacities) + tuple(
        colors[..., j] for j in range(D))
    fl = tiles.bin_gaussians_packed_multi(
        means2d, radii, depths, values, tile_size, tw, th,
        max_tiles_per_gauss, max_per_tile,
        conic_test=(tiles.conic_test_planes(conics, opacities)
                    if exact_test else None))
    out, alpha = _forward_flat_multi(
        fl.packed, fl.starts, fl.counts, C, width, height, tile_size,
        D, max_per_tile, interpret=interpret)
    return out, alpha, fl.n_dropped


# ---------------------------------------------------------------------------
# Hand-written backward kernel for the flat path
# ---------------------------------------------------------------------------
#
# Gradient of front-to-back blending (out = sum_i w_i c_i, w_i = a_i T_i,
# T_i = prod_{j<i}(1-a_j); per pixel, g_i := <v_out, c_i> + v_alpha):
#
#   dL/dc_i = w_i v_out
#   dL/da_k = T_k g_k - S_k / (1 - a_k),   S_k := sum_{j>k} w_j g_j
#
# The CUDA backward (RasterizeToPixels3DGSBwd.cu) replays splats
# back-to-front, accumulating S in registers. The TPU kernel instead makes
# two front-to-back sweeps over the tile's chunk list: sweep A accumulates
# total = sum_j w_j g_j per pixel, sweep B recomputes T/w and forms
# S_k = total - incl_prefix_k(w g) with the same lane-scan as the forward,
# then chains dL/da through a = min(.999, op e^{-sigma}) to per-entry grads
# for (means2d, conic, opacity) plus the |dL/dmeans2d| accumulation that
# gsplat exposes as `absgrad` (AbsGS, used by the densification strategy).
# Per-entry grads accumulate IN-KERNEL into a flat (g_rows, M) HBM array via
# read-modify-write DMA (safe: the TPU grid runs tiles sequentially, pinned
# by dimension_semantics="arbitrary"); adjacent tiles sharing a boundary
# chunk add into the same lanes, with non-owner lanes contributing exact
# zeros via the segment mask. This replaces a (tiles, chunks, rows, chunk)
# staging array (~0.8 GB at 1080p) + a 12M-index XLA scatter with one
# M-lane array. XLA then scatters per-entry -> per-splat grads via the
# sorted entry->gaussian id map riding the isect sort
# (tiles.bin_gaussians_packed(with_ids=True)).


def _kernel_flat_bwd(starts_ref, counts_ref, packed_hbm, vout_ref, va_ref,
                     zeros_ref, grad_ref, buf, accbuf, sem, gsem, *,
                     tile_size: int, tw: int, chunk: int, max_chunks: int,
                     d_col: int, M: int, g_rows: int):
    del zeros_ref  # aliased to grad_ref (zero-initialized accumulator)
    t = pl.program_id(0)
    P = tile_size * tile_size

    start = starts_ref[t]
    count = counts_ref[t]
    n_blocks = M // chunk
    b0 = jnp.minimum(start // chunk, n_blocks - 1)
    total_span = (start - b0 * chunk) + count
    nch = jnp.minimum((total_span + chunk - 1) // chunk, max_chunks)

    origin_x = (t % tw) * tile_size
    origin_y = (t // tw) * tile_size
    pix = lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    px = (origin_x + pix % tile_size).astype(jnp.float32) + 0.5
    py = (origin_y + pix // tile_size).astype(jnp.float32) + 0.5

    vout = vout_ref[0]      # (P, D)
    va = va_ref[0]          # (P, 1)


    def dma(slot, j):
        # chunk-major packed (n_blocks, V, chunk): one contiguous copy per
        # chunk (see _kernel_flat.dma)
        blk = jnp.minimum(b0 + j, n_blocks - 1)
        return pltpu.make_async_copy(
            packed_hbm.at[blk], buf.at[slot], sem.at[slot])

    def chunk_math(j, tcar, slot):
        """Shared forward replay for one chunk: returns the per-entry
        quantities both sweeps need. Must match _kernel_flat numerics
        (MXU-cumsum transmittance — see _kernel_flat)."""
        b = buf[slot]                     # (V, CH)
        mx, my = b[0:1, :], b[1:2, :]
        ca, cb, cc = b[2:3, :], b[3:4, :], b[4:5, :]
        op = b[5:6, :]
        dx = px - mx                      # (P, CH)
        dy = py - my
        sigma = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
        alpha = jnp.minimum(0.999, op * jnp.exp(-sigma))
        off = jnp.minimum(b0 + j, n_blocks - 1) * chunk
        g_idx = off + lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
        keep = ((sigma >= 0) & (alpha >= ALPHA_THRESHOLD)
                & (g_idx >= start) & (g_idx < start + count))
        alpha = jnp.where(keep, alpha, 0.0)
        # MXU-cumsum transmittance + monotone-T early stop: must match
        # _kernel_flat numerics exactly (see its note)
        one_m = 1.0 - alpha
        lg = jnp.log(one_m)
        cum_incl = _mxu_cumsum_incl(lg, chunk)
        prod_incl = jnp.exp(cum_incl)
        T_after_all = tcar * prod_incl
        T_before = T_after_all / one_m
        carry_fac = prod_incl[:, chunk - 1:chunk]
        live_t = (T_after_all > T_EPS).astype(jnp.float32)
        col_t = b[6:6 + d_col, :]         # (D, CH)
        g = lax.dot_general(vout, col_t,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            precision=lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32) + va  # (P, CH)
        return (b, dx, dy, sigma, alpha, keep, carry_fac, T_before, live_t,
                g, col_t)

    @pl.when(nch > 0)
    def _run():
        # ---- sweep A: per-pixel total = sum_j w_j g_j ----
        dma(0, 0).start()

        def condA(c):
            j, tcar, _ = c
            return (j < nch) & (jnp.max(tcar) > T_EPS)

        def bodyA(c):
            j, tcar, total = c
            slot = lax.rem(j, 2)
            dma(slot, j).wait()

            @pl.when(j + 1 < nch)
            def _pf():
                dma(1 - slot, j + 1).start()

            (_, _, _, _, alpha, _, carry_fac, T_before, live_t, g,
             _) = chunk_math(j, tcar, slot)
            w = alpha * T_before * live_t
            total = total + jnp.sum(w * g, axis=1, keepdims=True)
            tcar = tcar * carry_fac
            return j + 1, tcar, total

        z = jnp.zeros((P, 1), jnp.float32)
        one = jnp.ones((P, 1), jnp.float32)
        jfA, _, total = lax.while_loop(condA, bodyA, (jnp.int32(0), one, z))

        # Drain sweep A's in-flight prefetch before sweep B reuses the same
        # buffer slots / semaphores (see the matching drain in _kernel_flat).
        @pl.when(jfA < nch)
        def _drainA():
            dma(lax.rem(jfA, 2), jfA).wait()

        # ---- sweep B: per-entry grads ----
        dma(0, 0).start()

        def condB(c):
            j, tcar, _ = c
            return (j < nch) & (jnp.max(tcar) > T_EPS)

        def bodyB(c):
            j, tcar, cum = c
            slot = lax.rem(j, 2)
            dma(slot, j).wait()

            @pl.when(j + 1 < nch)
            def _pf():
                dma(1 - slot, j + 1).start()

            (b, dx, dy, sigma, alpha, keep, carry_fac, T_before, live_t, g,
             _) = chunk_math(j, tcar, slot)
            live = jnp.where(keep, live_t, 0.0)         # (P, CH)
            w = alpha * T_before * live

            wg = w * g
            incl = _mxu_cumsum_incl(wg, chunk, carry0=cum)  # MXU prefix sum
            S_after = total - incl
            # 1 - alpha >= 1e-3 by the 0.999 clamp
            dalpha = (T_before * g - S_after / jnp.maximum(1.0 - alpha, 1e-3)
                      ) * live
            not_cl = (alpha < 0.999).astype(jnp.float32)
            dsig = -dalpha * alpha * not_cl
            # d(op): alpha = op e^{-sigma}; sigma >= 0 on kept entries, the
            # max() guards exp overflow on masked (dalpha = 0) lanes
            dop_pp = dalpha * jnp.exp(-jnp.maximum(sigma, 0.0)) * not_cl

            gxc = b[2:3, :] * dx + b[3:4, :] * dy       # ca dx + cb dy
            gyc = b[4:5, :] * dy + b[3:4, :] * dx       # cc dy + cb dx
            dmx_pp = -dsig * gxc
            dmy_pp = -dsig * gyc

            rows = [
                jnp.sum(dmx_pp, axis=0, keepdims=True),
                jnp.sum(dmy_pp, axis=0, keepdims=True),
                jnp.sum(dsig * 0.5 * dx * dx, axis=0, keepdims=True),
                jnp.sum(dsig * dx * dy, axis=0, keepdims=True),
                jnp.sum(dsig * 0.5 * dy * dy, axis=0, keepdims=True),
                jnp.sum(dop_pp, axis=0, keepdims=True),
                lax.dot_general(vout, w,
                                dimension_numbers=(((0,), (0,)), ((), ())),
                                precision=lax.Precision.HIGHEST,
                                preferred_element_type=jnp.float32),  # (D, CH)
                jnp.sum(jnp.abs(dmx_pp), axis=0, keepdims=True),
                jnp.sum(jnp.abs(dmy_pp), axis=0, keepdims=True),
            ]
            grads = jnp.concatenate(rows, axis=0)       # (8 + D, CH)
            pad = g_rows - (8 + d_col)
            if pad:
                grads = jnp.concatenate(
                    [grads, jnp.zeros((pad, chunk), jnp.float32)], axis=0)
            # RMW-accumulate into the flat grad array: read the block's
            # current lanes, add, write back. Grid steps are sequential, and
            # both copies are waited before the next chunk, so the only
            # concurrent writer hazard (adjacent tiles sharing a boundary
            # chunk) cannot occur.
            blk = jnp.minimum(b0 + j, n_blocks - 1)
            rd = pltpu.make_async_copy(
                grad_ref.at[:, pl.ds(blk * chunk, chunk)], accbuf, gsem)
            rd.start()
            rd.wait()
            accbuf[...] = accbuf[...] + grads
            wr = pltpu.make_async_copy(
                accbuf, grad_ref.at[:, pl.ds(blk * chunk, chunk)], gsem)
            wr.start()
            wr.wait()

            cum = incl[:, -1:]
            tcar = tcar * carry_fac
            return j + 1, tcar, cum

        jfB, _, _ = lax.while_loop(condB, bodyB, (jnp.int32(0), one, z))

        @pl.when(jfB < nch)
        def _drainB():
            dma(lax.rem(jfB, 2), jfB).wait()


def _backward_flat(packed, starts, counts, ids, v_img, v_alpha,
                   width: int, height: int, tile_size: int, d_col: int,
                   max_per_tile: int, n_gauss: int,
                   chunk: int = 512, interpret: bool = False):
    """Run the backward kernel and scatter per-entry grads back to splats.

    Returns (d_means2d (N,2), d_conics (N,3), d_colors (N,D), d_opacities (N,),
    absgrad (N,2))."""
    tw = (width + tile_size - 1) // tile_size
    th = (height + tile_size - 1) // tile_size
    n_tiles = tw * th
    P = tile_size * tile_size
    V, M = packed.shape
    pad_v = (-V) % 8
    pad_m = (-M) % chunk
    m_entries = M
    if pad_v or pad_m:
        packed = jnp.pad(packed, ((0, pad_v), (0, pad_m)))
        V, M = packed.shape
    max_chunks = -(-max_per_tile // chunk) + 1
    # chunk-major relayout (n_blocks, V, chunk): see _kernel_flat.dma
    packed = packed.reshape(V, M // chunk, chunk).swapaxes(0, 1)
    g_rows = -(-(8 + d_col) // 8) * 8

    # cotangent images -> tile-major blocks (zero on the cropped pad)
    Hp, Wp = th * tile_size, tw * tile_size
    def to_tiles(img, d):
        img = jnp.pad(img.astype(jnp.float32),
                      ((0, Hp - height), (0, Wp - width), (0, 0)))
        img = img.reshape(th, tile_size, tw, tile_size, d)
        return img.transpose(0, 2, 1, 3, 4).reshape(n_tiles, P, d)

    vout = to_tiles(v_img, d_col)
    va = to_tiles(v_alpha, 1)

    kernel = functools.partial(
        _kernel_flat_bwd, tile_size=tile_size, tw=tw, chunk=chunk,
        max_chunks=max_chunks, d_col=d_col, M=M, g_rows=g_rows)

    flat_g = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # starts
            pl.BlockSpec(memory_space=pltpu.SMEM),   # counts
            pl.BlockSpec(memory_space=pl.ANY),       # packed stays in HBM
            pl.BlockSpec((1, P, d_col), lambda t: (t, 0, 0)),
            pl.BlockSpec((1, P, 1), lambda t: (t, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),       # zeros -> aliased output
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((g_rows, M), jnp.float32),
        input_output_aliases={5: 0},
        scratch_shapes=[
            pltpu.VMEM((2, V, chunk), jnp.float32),
            pltpu.VMEM((g_rows, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),  # RMW needs sequential tiles
        interpret=interpret,
    )(starts, counts, packed, vout, va,
      jnp.zeros((g_rows, M), jnp.float32))

    # per-entry -> per-splat via the sorted id map (invalid/padded entries
    # route to a trash row)
    ids_p = jnp.full((M,), n_gauss, jnp.int32).at[:m_entries].set(ids)
    acc = jnp.zeros((g_rows, n_gauss + 1)).at[:, ids_p].add(flat_g)
    acc = acc[:, :n_gauss]

    d_means2d = jnp.stack([acc[0], acc[1]], axis=-1)
    d_conics = jnp.stack([acc[2], acc[3], acc[4]], axis=-1)
    d_colors = jnp.moveaxis(acc[6:6 + d_col], 0, -1)
    d_op = acc[5]
    absgrad = jnp.stack([acc[6 + d_col], acc[7 + d_col]], axis=-1)
    return d_means2d, d_conics, d_colors, d_op, absgrad


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(7, 8, 9, 10, 11, 12, 13, 14, 15))
def rasterize_flat_pallas(means2d, conics, colors, opacities, radii, depths,
                          abs_tap,
                          width: int, height: int, tile_size: int,
                          max_tiles_per_gauss: int, max_per_tile: int,
                          interpret: bool = False,
                          payload_f16: bool = False,
                          slot_fracs=None,
                          exact_test: bool = True):
    """Bin + rasterize one camera via the flat sorted-list kernel.

    Binning (tiles.bin_gaussians_packed) lives inside the custom VJP: the
    payload rides the isect sort, so no dense per-tile gather exists on the
    forward path. Backward is the hand-written _kernel_flat_bwd (two
    front-to-back sweeps; see its header note).

    `abs_tap` is a zeros-(N, 2) gradient tap: it does not affect the forward,
    but its cotangent is the per-splat screen-space ABSOLUTE gradient
    sum_pixels |dL/d means2d| — gsplat's `absgrad` (AbsGS), the densification
    signal. Differentiate w.r.t. it to read the signal out.

    Returns (img (H, W, D), alpha (H, W, 1), n_dropped ()).
    """
    out, _ = _flat_fwd(means2d, conics, colors, opacities, radii, depths,
                       abs_tap, width, height, tile_size, max_tiles_per_gauss,
                       max_per_tile, interpret, payload_f16, slot_fracs,
                       exact_test)
    return out


def _flat_fwd(means2d, conics, colors, opacities, radii, depths, abs_tap,
              width, height, tile_size, max_tiles_per_gauss, max_per_tile,
              interpret, payload_f16=False, slot_fracs=None,
              exact_test=True):
    tw = (width + tile_size - 1) // tile_size
    th = (height + tile_size - 1) // tile_size
    # payload as (N,) planes: a concatenated (N, 10) matrix would lane-pad
    # to (N, 128) on TPU (12.8x HBM traffic) before the transpose
    if payload_f16:
        # sort-operand cost is ~linear in plane count (18.4 -> 8.4 ms going
        # 12 -> 7 operands at 2.15M rows, v5e): pack the precision-tolerant
        # planes as f16 pairs; means2d stays f32 (subpixel accuracy)
        d = colors.shape[-1]
        cols = [colors[:, i] for i in range(d)]
        if d % 2:
            cols.append(jnp.zeros_like(cols[0]))
        values = ((means2d[:, 0], means2d[:, 1],
                   pack_f16_pairs(conics[:, 0], conics[:, 1]),
                   pack_f16_pairs(conics[:, 2], opacities))
                  + tuple(pack_f16_pairs(cols[j], cols[j + 1])
                          for j in range(0, len(cols), 2)))
    else:
        values = ((means2d[:, 0], means2d[:, 1], conics[:, 0], conics[:, 1],
                   conics[:, 2], opacities)
                  + tuple(colors[:, i] for i in range(colors.shape[-1])))
    conic_test = (tiles.conic_test_planes(conics, opacities)
                  if exact_test else None)
    if slot_fracs is not None:
        flat = tiles.bin_gaussians_packed_prefix(
            means2d, radii, depths, values, tile_size, tw, th,
            max_tiles_per_gauss, max_per_tile, slot_fracs=slot_fracs,
            conic_test=conic_test)
    else:
        flat = tiles.bin_gaussians_packed(
            means2d, radii, depths, values, tile_size, tw, th,
            max_tiles_per_gauss, max_per_tile, conic_test=conic_test)
    import os
    # default G=1 (plain flat kernel): with the chunk-major packed relayout
    # the windowed grouping lost its DMA advantage — round-4 cache-cleared
    # sweep at S=4/518px: G=1 112.2 ms vs G=4 116.1 / G=8 115.9 / G=16
    # 118.7; chunk 1024 regressed (129-134 ms). (The round-3 "grouped no
    # gain" sweep was invalid: rasterize's module-level jit trace cache
    # doesn't key on env vars, so every config re-timed the first one.)
    G = int(os.environ.get("WM_RASTER_GROUP", "1"))
    if G > 1:
        img, alpha, extra = _forward_flat_grouped(
            flat.packed, flat.starts, flat.counts, width, height, tile_size,
            colors.shape[-1], max_per_tile, chunk=_raster_chunk(), G=G,
            interpret=interpret, f16_payload=payload_f16)
        out = (img, alpha, flat.n_dropped + extra)
    else:
        img, alpha = _forward_flat(flat.packed, flat.starts, flat.counts,
                                   width, height, tile_size, colors.shape[-1],
                                   max_per_tile, chunk=_raster_chunk(),
                                   interpret=interpret,
                                   f16_payload=payload_f16)
        out = (img, alpha, flat.n_dropped)
    return out, (means2d, conics, colors, opacities, radii, depths)


def _flat_bwd(width, height, tile_size, max_tiles_per_gauss, max_per_tile,
              interpret, payload_f16, slot_fracs, exact_test, residuals,
              cotangents):
    # slot_fracs intentionally ignored: like payload_f16, the backward
    # replays the exact full binning (the prefix path is an inference-side
    # forward approximation; its drops are reported via n_dropped).
    # exact_test IS honored: the ellipse-masked entries contribute zero to
    # both the forward and every gradient, but masking must match the
    # forward so max_per_tile cap truncation falls on identical entries.
    del slot_fracs
    means2d, conics, colors, opacities, radii, depths = residuals
    tw = (width + tile_size - 1) // tile_size
    th = (height + tile_size - 1) // tile_size
    # Rebuild the flat list with the entry->gaussian id map. The binning sort
    # carries a unique per-entry tiebreak key (tiles.bin_gaussians_packed), so
    # this re-bin replays the exact forward blending order, including
    # quantized-depth ties.
    values = ((means2d[:, 0], means2d[:, 1], conics[:, 0], conics[:, 1],
               conics[:, 2], opacities)
              + tuple(colors[:, i] for i in range(colors.shape[-1])))
    flat = tiles.bin_gaussians_packed(
        means2d, radii, depths, values, tile_size, tw, th,
        max_tiles_per_gauss, max_per_tile, with_ids=True,
        conic_test=(tiles.conic_test_planes(conics, opacities)
                    if exact_test else None))
    v_img, v_alpha, _ = cotangents
    gm, gc, gcol, gop, gabs = _backward_flat(
        flat.packed, flat.starts, flat.counts, flat.gauss_ids,
        v_img, v_alpha, width, height, tile_size, colors.shape[-1],
        max_per_tile, means2d.shape[0], interpret=interpret)
    return gm, gc, gcol, gop, None, None, gabs


rasterize_flat_pallas.defvjp(_flat_fwd, _flat_bwd)


def _tpu_compat_check():  # pragma: no cover
    """Mosaic tiling rules honored here: every input/output block's trailing
    two dims are (multiple-of-8, equal-to-array-dim) or (any, multiple-of-128);
    SMEM counts is an unblocked full vector."""


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def rasterize_binned_pallas(means2d, conics, colors, opacities, bins,
                            width: int, height: int, tile_size: int,
                            interpret: bool = False):
    """Rasterize one camera from dense tile bins with the Pallas kernel.

    Signature-compatible with rasterizer.rasterize_binned_jax.
    """
    return _forward_pallas(means2d, conics, colors, opacities,
                           bins.gauss_ids, bins.counts,
                           width, height, tile_size, interpret=interpret)


def _fwd(means2d, conics, colors, opacities, bins, width, height, tile_size,
         interpret=False):
    out = _forward_pallas(means2d, conics, colors, opacities,
                          bins.gauss_ids, bins.counts,
                          width, height, tile_size, interpret=interpret)
    return out, (means2d, conics, colors, opacities, bins)


def _bwd(width, height, tile_size, interpret, residuals, cotangents):
    from .rasterizer import rasterize_binned_jax
    means2d, conics, colors, opacities, bins = residuals

    def f(m, c, col, op):
        return rasterize_binned_jax(m, c, col, op, bins, width, height, tile_size)

    _, vjp = jax.vjp(f, means2d, conics, colors, opacities)
    gm, gc, gcol, gop = vjp(cotangents)
    return gm, gc, gcol, gop, None


rasterize_binned_pallas.defvjp(_fwd, _bwd)
