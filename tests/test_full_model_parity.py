"""Assembled full-model parity: reference torch WorldMirror vs our JAX model.

Module-level parity (test_torch_parity.py) can't catch composition bugs —
token ordering, patch_start_idx, autocast boundaries
(reference src/models/models/worldmirror.py:146), camera-head chunk order
(camera_head.py:88), GS-head wiring (dense_head.py:84-95,239-244). This test
runs the ENTIRE reference pipeline (worldmirror.py:120-216) at small scale on
CPU — with gsplat's CUDA rasterization replaced by a pure-torch tile blender
built on gsplat/cuda/_torch_impl.py ops — converts the random-init state dict
through tools/convert_weights.convert_worldmirror, runs our model on identical
inputs, and compares the full prediction dict: camera params/poses/intrs,
depth, pts3d, normals, gs_depth, voxel-merged splats, and rendered RGB+ED
views.
"""

import math
import sys

import numpy as np
import jax.numpy as jnp
import pytest

sys.path.insert(0, "/root/repo")

from conftest import torch_reference


# ---------------------------------------------------------------------------
# pure-torch gsplat.rasterization substitute (CPU oracle)
# ---------------------------------------------------------------------------

def _make_torch_rasterization(torch, impl):
    """Replicates gsplat.rendering.rasterization's RGB+ED path on CPU:
    projection + isect binning from _torch_impl, front-to-back tile blending
    per RasterizeToPixels3DGSFwd.cu semantics (alpha clamp 0.999, 1/255
    threshold, 1e-4 transmittance early stop, tripping splat excluded)."""

    SH_C0 = 0.28209479177387814

    def rasterization(means, quats, scales, opacities, colors, viewmats, Ks,
                      width, height, sh_degree=None, render_mode="RGB+ED",
                      tile_size=16, **_ignored):
        N = means.shape[0]
        C = viewmats.shape[0]
        covars, _ = impl._quat_scale_to_covar_preci(
            quats / quats.norm(dim=-1, keepdim=True), scales,
            compute_covar=True, compute_preci=False, triu=False)
        radii, means2d, depths, conics, _ = impl._fully_fused_projection(
            means, covars, viewmats, Ks, width, height)

        if sh_degree is not None:
            assert sh_degree == 0, "test oracle supports sh_degree 0 only"
            cols = SH_C0 * colors[:, 0, :]                 # (N, 3)
            cols = torch.clamp_min(cols + 0.5, 0.0)
            cols = cols.expand(C, N, 3).clone()
        else:
            cols = colors.expand(C, *colors.shape).clone()
        if render_mode in ("RGB+D", "RGB+ED"):
            cols = torch.cat([cols, depths[..., None]], dim=-1)
        D = cols.shape[-1]

        tw = math.ceil(width / tile_size)
        th = math.ceil(height / tile_size)
        _, isect_ids, flatten_ids = impl._isect_tiles(
            means2d, radii, depths, tile_size, tw, th)
        offsets = impl._isect_offset_encode(isect_ids, C, tw, th)
        offs = torch.cat([offsets.flatten().long(),
                          torch.tensor([len(flatten_ids)])])

        img = torch.zeros(C, height, width, D)
        acc = torch.zeros(C, height, width, 1)
        for c in range(C):
            for ty in range(th):
                for tx in range(tw):
                    fi = (c * th + ty) * tw + tx
                    o0, o1 = int(offs[fi]), int(offs[fi + 1])
                    if o1 <= o0:
                        continue
                    g = flatten_ids[o0:o1] % N
                    y0, x0 = ty * tile_size, tx * tile_size
                    ys = torch.arange(y0, min(y0 + tile_size, height))
                    xs = torch.arange(x0, min(x0 + tile_size, width))
                    py, px = torch.meshgrid(ys.float() + 0.5,
                                            xs.float() + 0.5, indexing="ij")
                    dx = px.reshape(-1)[None, :] - means2d[c, g, 0:1]
                    dy = py.reshape(-1)[None, :] - means2d[c, g, 1:2]
                    ca, cb, cc2 = (conics[c, g, 0:1], conics[c, g, 1:2],
                                   conics[c, g, 2:3])
                    sigma = 0.5 * (ca * dx * dx + cc2 * dy * dy) + cb * dx * dy
                    alpha = torch.clamp_max(
                        opacities[g][:, None] * torch.exp(-sigma), 0.999)
                    keep = (sigma >= 0) & (alpha >= 1.0 / 255.0)
                    alpha = torch.where(keep, alpha, torch.zeros(()))
                    one_m = 1.0 - alpha
                    T_before = torch.cumprod(one_m, dim=0) / one_m
                    tripped = (T_before * one_m <= 1e-4) & (alpha > 0)
                    stopped = torch.cumsum(tripped.float(), dim=0) > 0
                    w = alpha * T_before * (~stopped).float()    # (K, P)
                    tile_img = (w.T @ cols[c, g]).reshape(len(ys), len(xs), D)
                    img[c, y0:y0 + len(ys), x0:x0 + len(xs)] += tile_img
                    acc[c, y0:y0 + len(ys), x0:x0 + len(xs), 0] += \
                        w.sum(dim=0).reshape(len(ys), len(xs))

        if render_mode in ("ED", "RGB+ED"):
            img = torch.cat([img[..., :-1],
                             img[..., -1:] / acc.clamp_min(1e-10)], dim=-1)
        return img, acc, {}

    return rasterization


# ---------------------------------------------------------------------------
# reference model at small scale
# ---------------------------------------------------------------------------

IMG, PATCH, EMBED, GSD = 56, 14, 64, 64
B, S = 1, 2
# shrunken DPT decoder widths (reference defaults are features 256 /
# out_channels [256,512,1024,1024] — ~400 MB of params at ANY model scale,
# which would make the golden fixtures uncommittable); applied to BOTH models
DPT_F, DPT_OC = 32, (32, 48, 64, 64)


def make_ref_model():
    """Build the patched small-scale reference model + CPU raster oracle.

    Returns (torch, model, captured, cleanup). Shared by the live parity
    test below and tools/make_golden_fixtures.py (which bakes the outputs
    into torch-free regression fixtures)."""
    torch = torch_reference()
    if "/root/reference/submodules/gsplat" not in sys.path:
        sys.path.insert(0, "/root/reference/submodules/gsplat")
    import importlib
    impl = importlib.import_module("gsplat.cuda._torch_impl")

    import src.models.models.rasterization as ref_raster
    import src.models.models.worldmirror as ref_wm
    from src.models.models.visual_transformer import VisualGeometryTransformer

    # ctor quirk (SURVEY.md §2.1): WorldMirror passes enable_interpolation /
    # max_resolution to a VGT __init__ that doesn't declare them
    orig_init = VisualGeometryTransformer.__init__
    def patched_init(self, *a, **kw):
        kw.pop("enable_interpolation", None)
        kw.pop("max_resolution", None)
        orig_init(self, *a, **kw)
    VisualGeometryTransformer.__init__ = patched_init

    # shrink the DPT decoders (see DPT_F/DPT_OC note above)
    from src.models.heads.dense_head import DPTHead
    orig_dpt_init = DPTHead.__init__
    def dpt_init(self, *a, **kw):
        kw["out_channels"] = list(DPT_OC)
        if not kw.get("is_gsdpt"):
            kw["features"] = DPT_F
        orig_dpt_init(self, *a, **kw)
    DPTHead.__init__ = dpt_init

    # the reference hardcodes GaussianSplatRenderer(feature_dim=256)
    # (worldmirror.py:111-118 never forwards gs_dim), so a small-scale build
    # needs the renderer told the test's gs_dim explicitly
    orig_gsr_init = ref_raster.GaussianSplatRenderer.__init__
    def gsr_init(self, *a, **kw):
        kw["feature_dim"] = GSD
        orig_gsr_init(self, *a, **kw)
    ref_raster.GaussianSplatRenderer.__init__ = gsr_init

    # CPU rasterization oracle in place of the CUDA gsplat entry
    torch_raster = _make_torch_rasterization(torch, impl)
    orig_raster = ref_raster.rasterization
    ref_raster.rasterization = torch_raster

    # the reference render() computes rendered views then DISCARDS them
    # (rasterization.py:218-246 only stores splats); capture them here
    captured = {}
    orig_batches = ref_raster.Rasterizer.rasterize_batches
    def capturing_batches(self, *a, **kw):
        out = orig_batches(self, *a, **kw)
        captured.setdefault("colors", []).append(out[0])
        captured.setdefault("depths", []).append(out[1])
        captured.setdefault("alphas", []).append(out[2])
        return out
    ref_raster.Rasterizer.rasterize_batches = capturing_batches

    torch.manual_seed(0)
    model = ref_wm.WorldMirror(img_size=IMG, patch_size=PATCH, embed_dim=EMBED,
                               gs_dim=GSD, patch_embed="conv").eval()
    # random init can emit relu-activated fov == 0 (degenerate inf-focal
    # camera, which a trained checkpoint never produces and where the
    # reference NaNs out); bias the fov channels positive so the test runs
    # the non-degenerate path
    with torch.no_grad():
        model.cam_head.param_predictor.fc2.bias[7:] += 0.4

    def cleanup():
        VisualGeometryTransformer.__init__ = orig_init
        DPTHead.__init__ = orig_dpt_init
        ref_raster.GaussianSplatRenderer.__init__ = orig_gsr_init
        ref_raster.rasterization = orig_raster
        ref_raster.Rasterizer.rasterize_batches = orig_batches

    return torch, model, captured, cleanup


@pytest.fixture(scope="module")
def ref_bundle():
    torch, model, captured, cleanup = make_ref_model()
    try:
        yield torch, model, captured
    finally:
        cleanup()


def make_views(rng, cond):
    """Deterministic test inputs shared with the golden-fixture generator."""
    views = {"img": rng.uniform(size=(B, S, 3, IMG, IMG)).astype(np.float32)}
    if sum(cond):
        # plausible c2w poses + pinhole intrinsics + positive depth priors
        poses = np.tile(np.eye(4, dtype=np.float32), (B, S, 1, 1))
        poses[:, 1, :3, 3] = [0.2, -0.1, 0.15]
        views["camera_pose"] = poses
        K = np.array([[60.0, 0, IMG / 2], [0, 60.0, IMG / 2], [0, 0, 1]],
                     np.float32)
        views["camera_intrinsics"] = np.tile(K, (B, S, 1, 1))
        views["depthmap"] = (1.0 + rng.uniform(size=(B, S, IMG, IMG))
                             ).astype(np.float32)
    return views


def _run_reference(torch, model, captured, views_np, cond_flags):
    views_t = {k: torch.from_numpy(v) for k, v in views_np.items()}
    captured.clear()
    with torch.no_grad():
        preds = model(views_t, cond_flags=list(cond_flags))
    out = {}
    for k, v in preds.items():
        if k == "splats":
            out[k] = {sk: [t.numpy() for t in sv] if isinstance(sv, list)
                      else sv.numpy() for sk, sv in v.items()}
        else:
            out[k] = v.numpy()
    out["rendered_colors"] = torch.cat(captured["colors"], dim=1).numpy()
    out["rendered_depths"] = torch.cat(captured["depths"], dim=1).numpy()
    out["rendered_alphas"] = torch.cat(captured["alphas"], dim=1).numpy()
    return out


def run_ours_from_params(params, views_np, cond_flags, camera_params=None):
    """Run our JAX model from an already-converted param pytree (torch-free).

    camera_params: optional (B, S, 9) override fed to worldmirror.forward —
    the golden-fixture test uses the REFERENCE's predicted cameras here so
    the splat/render comparison decouples from fp16-fixture camera noise."""
    from hunyuanworld_mirror_tpu.models import worldmirror

    cfg = worldmirror.WorldMirrorConfig(
        img_size=IMG, patch_size=PATCH, embed_dim=EMBED, gs_dim=GSD,
        patch_embed="conv", gs_compact=False,
        dpt_features=DPT_F, dpt_out_channels=DPT_OC)
    views = {}
    for k, v in views_np.items():
        if k == "img":
            views[k] = jnp.asarray(v.transpose(0, 1, 3, 4, 2))
        else:
            views[k] = jnp.asarray(v)
    # fp32 trunk: CPU torch disables the reference's bf16 autocast
    return worldmirror.forward(params, cfg, views, cond_flags=cond_flags,
                               render=True, trunk_dtype=jnp.float32,
                               camera_params=camera_params)


def _run_ours(model_torch, views_np, cond_flags):
    from tools import convert_weights as cw
    sd = {k: v.detach().numpy() for k, v in model_torch.state_dict().items()}
    return run_ours_from_params(cw.convert_worldmirror(sd), views_np,
                                cond_flags)


def _splat_table(means, quats, scales, opac, sh):
    """Canonical row table sorted by means for order-free set comparison."""
    # quats are sign-ambiguous after weighted averaging only via normalization
    # of the same weighted sum -> deterministic, no sign fix needed
    tab = np.concatenate([means, quats, scales, opac[:, None],
                          sh.reshape(len(means), -1)], axis=-1)
    order = np.lexsort((means[:, 2], means[:, 1], means[:, 0]))
    return tab[order]


@pytest.mark.parametrize("cond", [(0, 0, 0), (1, 1, 1)],
                         ids=["no_priors", "all_priors"])
def test_full_model(ref_bundle, rng, cond):
    torch, model, captured = ref_bundle
    views = make_views(rng, cond)
    ref = _run_reference(torch, model, captured, views, cond)
    ours = _run_ours(model, views, cond)
    compare_full(ours, ref)


def compare_full(ours, ref, fixture_mode=False):
    """Full prediction-dict comparison; also the golden-fixture contract.

    fixture_mode=True: the committed fixtures store weights/inputs rounded
    to fp16 (tools/make_golden_fixtures.py), and at that operating point the
    4-step iterative camera head amplifies jax-vs-torch implementation noise
    to ~1.4e-2 on camera params (recalibrated round 5 — it was ~2.6e-3 in
    the round-4 environment; the amplification is host/codegen dependent).
    That error shifts EVERY splat mean by camera-error x depth (~2.5e-2
    bulk cloud displacement), swamping any nearest-neighbor splat pairing —
    so in fixture mode this function checks cameras (honest wide band) and
    head outputs (tight band, measured deltas ~2e-6) only, and the caller
    (tests/test_golden_fixture.py) re-runs the GS stage with the REFERENCE
    cameras substituted (worldmirror.forward(camera_params=...)) and holds
    splats + renders to the TIGHT bands via compare_geometry. The LIVE
    parity test (fp32 weights) keeps every tight band in one pass.
    """
    compare_cameras(ours, ref, atol=2e-2 if fixture_mode else 2e-3)
    compare_heads(ours, ref)
    if not fixture_mode:
        compare_geometry(ours, ref)


def compare_cameras(ours, ref, atol):
    np.testing.assert_allclose(np.asarray(ours["camera_params"]),
                               ref["camera_params"], atol=atol)
    np.testing.assert_allclose(np.asarray(ours["camera_poses"]),
                               ref["camera_poses"], atol=1.5 * atol)
    # focal = (w/2)/tan(fov/2) amplifies fov error by ~focal/fov, and the
    # reference emits inf at relu-activated fov == 0 where we deliberately
    # clamp (utils/camera.py): compare finite entries with a relative band
    r_i = ref["camera_intrs"]
    o_i = np.asarray(ours["camera_intrs"])
    finite = np.isfinite(r_i) & (np.abs(r_i) < 1e6)
    np.testing.assert_allclose(o_i[finite], r_i[finite], rtol=0.05, atol=0.5)


def compare_heads(ours, ref):
    # dense heads: exp-type activations amplify trunk noise; compare with a
    # relative + absolute band (measured fixture deltas ~2e-6)
    for k in ("depth", "depth_conf", "pts3d", "pts3d_conf", "normals",
              "normals_conf", "gs_depth", "gs_depth_conf"):
        r, o = ref[k], np.asarray(ours[k])
        assert o.shape == r.shape, k
        np.testing.assert_allclose(o, r, atol=5e-3, rtol=5e-3, err_msg=k)


def compare_geometry(ours, ref, nn_tol=1e-4, row_tol=5e-3, row_med=1e-4):
    """Splats + rendered views. In the golden-fixture flow `ours` comes from
    a forward with the reference's cameras substituted, so these bands stay
    TIGHT at the fp16 fixture operating point (advisor r4: bands must sit
    near the measured deltas, not an order of magnitude above)."""
    # ---- splats: ours is static-shape with dead slots; ref is per-batch
    # ragged voxel-merged lists ----
    sp_o, sp_r = ours["splats"], ref["splats"]
    for b in range(B):
        alive = np.asarray(sp_o["weights"][b]) > 0
        k_ref = len(sp_r["means"][b])
        # fp-level mean differences can flip a floor() at a voxel boundary,
        # so a handful of voxels may split/merge differently; require the
        # populations to agree to 0.1% and compare greedily-matched rows
        assert abs(int(alive.sum()) - k_ref) <= max(2, k_ref // 100), \
            (int(alive.sum()), k_ref)
        tab_o = _splat_table(np.asarray(sp_o["means"][b])[alive],
                             np.asarray(sp_o["quats"][b])[alive],
                             np.asarray(sp_o["scales"][b])[alive],
                             np.asarray(sp_o["opacities"][b])[alive],
                             np.asarray(sp_o["sh"][b])[alive])
        tab_r = _splat_table(sp_r["means"][b], sp_r["quats"][b],
                             sp_r["scales"][b], sp_r["opacities"][b],
                             sp_r["sh"][b])
        # nearest-neighbor pairing on means: boundary-flip rows (a splat
        # crossing a voxel edge merges into a different neighbor) have no
        # close partner and are skipped, bounded by the population check
        from scipy.spatial import cKDTree
        dist, idx = cKDTree(tab_o[:, :3]).query(tab_r[:, :3])
        hit = dist < nn_tol
        assert hit.mean() > 0.95, hit.mean()
        diff = np.abs(tab_o[idx[hit]] - tab_r[hit])
        rel = diff / (1.0 + np.abs(tab_r[hit]))
        # rows whose voxel lost/gained a boundary-flipped member have shifted
        # merged averages; their count is bounded by the same flip budget
        bad = rel.max(axis=1) > row_tol
        assert int(bad.sum()) <= max(4, int(0.03 * k_ref)), int(bad.sum())
        assert float(np.median(rel.max(axis=1))) < row_med

    # ---- rendered views (RGB+ED through the full pipeline) ----
    # a small fraction of splats differ by voxel-boundary flips (see above),
    # so renders disagree locally around those splats: bound the outlier
    # fraction instead of the max. A wiring bug (channel order, missing SH
    # DC, transposed layout) fails these by orders of magnitude.
    def _mostly_close(a, b, atol, frac, name=""):
        d = np.abs(np.asarray(a) - np.asarray(b))
        assert float(np.median(d)) < atol / 10, (name, float(np.median(d)))
        assert float((d > atol).mean()) < frac, (name, float((d > atol).mean()))

    _mostly_close(ours["rendered_colors"], ref["rendered_colors"], 5e-2, 0.05,
                  name="rendered_colors")
    _mostly_close(ours["rendered_alphas"], ref["rendered_alphas"], 5e-2, 0.05,
                  name="rendered_alphas")
    # ED depth is alpha-normalized; compare only where something rendered
    r_a = ref["rendered_alphas"]
    mask = r_a[..., 0] > 1e-3
    dd = np.abs(np.asarray(ours["rendered_depths"]) - ref["rendered_depths"])
    assert float((dd[mask] > 5e-2).mean()) < 0.05
