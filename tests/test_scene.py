"""GLB export, edge masks, sky mask, splat effects.

Parity targets: src/utils/geometry.py:374-531 (edges), visual_util.py:208-470
(GLB scene), gs_effects.py (effects). GLB output is validated structurally
(header, chunk layout, JSON schema) since no glTF viewer runs in CI."""

import json
import struct

import numpy as np
import pytest

from hunyuanworld_mirror_tpu.io import effects as fx
from hunyuanworld_mirror_tpu.io import scene


def parse_glb(data: bytes):
    magic, version, total = struct.unpack_from("<III", data, 0)
    assert magic == 0x46546C67 and version == 2 and total == len(data)
    jlen, jtype = struct.unpack_from("<II", data, 12)
    assert jtype == 0x4E4F534A
    js = json.loads(data[20:20 + jlen])
    blen, btype = struct.unpack_from("<II", data, 20 + jlen)
    assert btype == 0x004E4942
    return js, data[28 + jlen:28 + jlen + blen]


def test_depth_edge_detects_discontinuity():
    d = np.ones((32, 32), np.float32)
    d[:, 16:] = 2.0
    e = scene.depth_edge(d, rtol=0.1)
    assert e[:, 15:17].all()
    assert not e[:, :14].any() and not e[:, 19:].any()


def test_depth_edge_atol_and_batch():
    d = np.ones((2, 16, 16), np.float32)
    d[1, 8:, :] = 1.5
    e = scene.depth_edge(d, atol=0.2)
    assert not e[0].any()
    assert e[1, 7:9].all()


def test_normals_edge_detects_crease():
    n = np.zeros((16, 16, 3), np.float32)
    n[:, :8] = [0, 0, 1]
    n[:, 8:] = [1, 0, 0]  # 90-degree crease at x=8
    e = scene.normals_edge(n, tol=30.0)
    assert e[:, 6:10].all()
    assert not e[:, :4].any() and not e[:, 12:].any()


def test_sky_mask_heuristic_top_region():
    img = np.zeros((32, 32, 3), np.float32)
    img[:10] = [0.6, 0.75, 0.95]   # bright blue sky at top
    img[10:] = [0.25, 0.2, 0.15]   # dark ground
    m = scene.sky_mask(img)
    assert m[:10].mean() > 0.9
    assert not m[12:].any()


def test_build_glb_points_structure(rng):
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (100, 3)).astype(np.float32)
    c2w = np.broadcast_to(np.eye(4, dtype=np.float32), (3, 4, 4))
    data = scene.build_glb(pts, cols, c2w=c2w)
    js, buf = parse_glb(data)
    assert js["asset"]["version"] == "2.0"
    modes = [m["primitives"][0]["mode"] for m in js["meshes"]]
    assert 0 in modes and 1 in modes  # POINTS + LINES (cameras)
    pos_acc = js["accessors"][js["meshes"][0]["primitives"][0]["attributes"]["POSITION"]]
    assert pos_acc["count"] == 100 and pos_acc["type"] == "VEC3"
    # positions roundtrip through the binary buffer
    view = js["bufferViews"][pos_acc["bufferView"]]
    got = np.frombuffer(buf[view["byteOffset"]:view["byteOffset"] + view["byteLength"]],
                        np.float32).reshape(-1, 3)
    np.testing.assert_allclose(got, pts)


def test_build_glb_mesh_triangulation(rng):
    H = W = 8
    gx, gy = np.meshgrid(np.arange(W), np.arange(H), indexing="xy")
    pts = np.stack([gx, gy, np.zeros((H, W))], -1).astype(np.float32)
    cols = rng.uniform(0, 1, (H, W, 3)).astype(np.float32)
    valid = np.ones((H, W), bool)
    valid[0, 0] = False  # kill one corner -> 2 fewer triangles
    data = scene.build_glb(pts, cols, valid=valid, as_mesh=True)
    js, _ = parse_glb(data)
    prim = js["meshes"][0]["primitives"][0]
    assert prim["mode"] == 4
    n_idx = js["accessors"][prim["indices"]]["count"]
    assert n_idx == ((H - 1) * (W - 1) - 1) * 2 * 3


def test_predictions_to_glb_pipeline(tmp_path, rng):
    S, H, W = 2, 16, 16
    preds = {
        "pts3d": rng.normal(size=(1, S, H, W, 3)).astype(np.float32),
        "pts3d_conf": rng.uniform(1, 2, (1, S, H, W)).astype(np.float32),
        # smooth depth: edge masking would otherwise drop every pixel
        "depth": np.full((1, S, H, W, 1), 2.0, np.float32),
        "camera_poses": np.broadcast_to(np.eye(4, dtype=np.float32), (1, S, 4, 4)),
        "images": rng.uniform(0, 1, (1, S, H, W, 3)).astype(np.float32),
    }
    p = scene.predictions_to_glb(preds, str(tmp_path / "s.glb"))
    js, _ = parse_glb(open(p, "rb").read())
    assert len(js["meshes"]) >= 1
    p2 = scene.predictions_to_glb(preds, str(tmp_path / "m.glb"), as_mesh=True)
    js2, _ = parse_glb(open(p2, "rb").read())
    assert any(m["primitives"][0]["mode"] == 4 for m in js2["meshes"])


def _toy_splats(rng, n=64):
    return {
        "means": rng.normal(size=(n, 3)).astype(np.float32),
        "quats": np.tile([1.0, 0, 0, 0], (n, 1)).astype(np.float32),
        "scales": rng.uniform(0.001, 0.1, (n, 3)).astype(np.float32),
        "opacities": rng.uniform(0.2, 0.9, n).astype(np.float32),
    }


@pytest.mark.parametrize("effect", ["twister", "rain", "spread"])
def test_effects_finite_and_time_varying(rng, effect):
    splats = _toy_splats(rng)
    if effect == "spread":
        splats["colors"] = rng.uniform(0, 1, (64, 3)).astype(np.float32)
    out0 = fx.apply_effect(splats, 0.0, effect)
    out5 = fx.apply_effect(splats, 5.0, effect)
    for k in out0:
        assert np.isfinite(out0[k]).all() and np.isfinite(out5[k]).all()
    assert np.abs(out0["means"] - out5["means"]).max() > 1e-4
    # inputs not mutated
    np.testing.assert_array_equal(splats["opacities"],
                                  _toy_splats(np.random.default_rng(42))["opacities"])
