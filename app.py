"""WorldMirror-TPU interactive demo (reference app.py equivalent, no Gradio).

The reference ships an 1820-line Gradio app (upload/examples -> forward ->
GLB viewer, depth/normal galleries, splat downloads, rendered video). Gradio
is not in this image, so this is a dependency-free stdlib http.server app
with the same workflow:

  GET  /            example browser + upload form + options
  POST /run         run inference (example dir or uploaded images)
  GET  /out/...     result artifacts (PNGs, GLB, PLY, splat, mp4)

  python app.py [--port 7860] [--preset tiny] [--size 518] \
      [--examples /root/reference/examples] [--ckpt path]

The model loads once; each request reuses the jitted forward for its
(S, H, W) shape. Same postprocessing stack as the reference app
(app.py:79-245): pts3d recomputed from depth+camera, confidence percentile +
edge masks + optional sky mask, GLB scene, per-view galleries, GS downloads.
"""

import argparse
import html
import io
import json
import os
import re
import sys
import threading
import time
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

import numpy as np

STATE = {}


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--preset", choices=["large", "base", "small", "tiny"],
                   default="large")
    p.add_argument("--size", type=int, default=518)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--examples", default="/root/reference/examples")
    p.add_argument("--workdir", default="/tmp/wm_demo")
    p.add_argument("--rasterizer", choices=["jax", "pallas"], default="pallas")
    p.add_argument("--max-views", type=int, default=8)
    return p.parse_args()


def build_model(args):
    import jax
    import jax.numpy as jnp
    from hunyuanworld_mirror_tpu.models import worldmirror
    from hunyuanworld_mirror_tpu.training import checkpoint as ckpt_lib

    presets = {
        "large": {},
        "base": dict(embed_dim=768, patch_embed="dinov2_vitb14_reg"),
        "small": dict(embed_dim=384, patch_embed="dinov2_vits14_reg",
                      trunk_depth=12, trunk_heads=6,
                      intermediate_idxs=(2, 5, 8, 11)),
        "tiny": dict(embed_dim=64, patch_embed="conv", trunk_depth=4,
                     trunk_heads=4, gs_dim=32, intermediate_idxs=(0, 1, 2, 3)),
    }
    cfg = worldmirror.WorldMirrorConfig(
        img_size=args.size, rasterizer_impl=args.rasterizer,
        **presets[args.preset])
    if args.ckpt:
        params = ckpt_lib.load_params(args.ckpt)
    else:
        print("WARNING: random weights (pass --ckpt for real outputs)")
        params = worldmirror.init(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params)
    fwd = jax.jit(lambda p, v: worldmirror.forward(p, cfg, v))
    return cfg, params, fwd


def run_inference(image_paths, opts):
    import jax
    import jax.numpy as jnp
    from hunyuanworld_mirror_tpu.io import images as io_images
    from hunyuanworld_mirror_tpu.io import ply as io_ply
    from hunyuanworld_mirror_tpu.io import render as render_lib
    from hunyuanworld_mirror_tpu.io import scene as scene_lib
    from hunyuanworld_mirror_tpu.utils import geometry

    args = STATE["args"]
    cfg, params, fwd = STATE["model"]
    run_id = f"run_{int(time.time() * 1000):x}"
    out_dir = Path(args.workdir) / run_id
    out_dir.mkdir(parents=True, exist_ok=True)

    imgs = io_images.prepare_images(image_paths[:args.max_views],
                                    target_size=args.size)
    t0 = time.time()
    preds = fwd(params, {"img": jnp.asarray(imgs)})
    preds = jax.tree.map(np.asarray, preds)
    elapsed = time.time() - t0
    S, H, W = imgs.shape[1:4]

    # pts3d recomputed from predicted depth + cameras (reference app.py:148-151)
    c2w = preds["camera_poses"][0]
    K = preds["camera_intrs"][0]
    world, _, _ = geometry.depth_to_world_coords_points(
        jnp.asarray(preds["depth"][0, ..., 0]), jnp.asarray(c2w), jnp.asarray(K))
    preds["pts3d"] = np.asarray(world)[None]

    gallery = []
    for s in range(S):
        io_ply.save_depth_png(out_dir / f"depth_{s:02d}.png",
                              preds["depth"][0, s, ..., 0])
        gallery.append(f"depth_{s:02d}.png")
        if "normals" in preds:
            io_ply.save_normal_png(out_dir / f"normal_{s:02d}.png",
                                   preds["normals"][0, s])
            gallery.append(f"normal_{s:02d}.png")
        import PIL.Image
        PIL.Image.fromarray((imgs[0, s] * 255).astype(np.uint8)).save(
            out_dir / f"input_{s:02d}.png")

    scene_lib.predictions_to_glb(
        {**preds, "images": imgs}, str(out_dir / "scene.glb"),
        conf_percent=float(opts.get("conf", 20.0)),
        mask_sky=opts.get("mask_sky") == "on",
        as_mesh=opts.get("as_mesh") == "on")

    artifacts = {"glb": "scene.glb"}
    if "splats" in preds:
        sp = preds["splats"]
        alive = sp["opacities"][0] > 1e-4
        op = np.clip(sp["opacities"][0], 1e-6, 1 - 1e-6)
        io_ply.save_gs_ply(out_dir / "gaussians.ply",
                           sp["means"][0][alive], sp["scales"][0][alive],
                           sp["quats"][0][alive], sp["sh"][0][:, 0][alive],
                           np.log(op / (1 - op))[alive])
        io_ply.gs_ply_to_splat(out_dir / "gaussians.ply",
                               out_dir / "gaussians.splat")
        artifacts["ply"] = "gaussians.ply"
        artifacts["splat"] = "gaussians.splat"
        # cameras.json feeds the in-browser viewer's frusta overlay
        with open(out_dir / "cameras.json", "w") as f:
            json.dump([{"c2w": c2w[s].tolist(), "K": K[s].tolist(),
                        "width": W, "height": H} for s in range(S)], f)
        if opts.get("video") == "on":
            render_lib.render_interpolated_video(
                preds, W, H, str(out_dir / "rendered.mp4"),
                impl=args.rasterizer,
                effect=opts.get("effect") or None)
            artifacts["video"] = "rendered.mp4"

    return run_id, {"gallery": gallery, "artifacts": artifacts,
                    "views": S, "elapsed": elapsed,
                    "viewer": "splats" in preds}


def list_examples():
    root = STATE["args"].examples
    out = []
    if os.path.isdir(root):
        for cat in sorted(os.listdir(root)):
            cdir = os.path.join(root, cat)
            if os.path.isdir(cdir):
                for scene in sorted(os.listdir(cdir)):
                    if os.path.isdir(os.path.join(cdir, scene)):
                        out.append(f"{cat}/{scene}")
    return out


_PAGE = """<!doctype html><html><head><title>WorldMirror TPU</title>
<style>body{{font-family:sans-serif;max-width:960px;margin:2em auto}}
img{{max-width:220px;margin:4px;border:1px solid #ccc}}
.row{{display:flex;flex-wrap:wrap}}</style></head><body>
<h1>WorldMirror-TPU demo</h1>
<form method="post" action="/run" enctype="multipart/form-data">
<p>Example scene: <select name="example"><option value=""></option>{examples}
</select> &nbsp;or upload images: <input type="file" name="images" multiple></p>
<p>conf percentile <input name="conf" value="20" size="3">
<label><input type="checkbox" name="mask_sky"> mask sky</label>
<label><input type="checkbox" name="as_mesh"> GLB as mesh</label>
<label><input type="checkbox" name="video"> render video</label>
effect <select name="effect"><option value=""></option>
<option>twister</option><option>rain</option><option>spread</option></select>
</p><p><button type="submit">Reconstruct</button></p></form>
{result}</body></html>"""


def render_result(run_id, info):
    items = "".join(
        f'<img src="/out/{run_id}/{html.escape(f)}">' for f in info["gallery"])
    links = " | ".join(
        f'<a href="/out/{run_id}/{html.escape(v)}">{html.escape(k)}</a>'
        for k, v in info["artifacts"].items())
    vid = ""
    if "video" in info["artifacts"]:
        vid = (f'<video controls width="480" '
               f'src="/out/{run_id}/{info["artifacts"]["video"]}"></video>')
    viewer = ""
    if info.get("viewer"):
        # interactive WebGL viewer (io/viewer.html, self-contained):
        # splat mode + GLB scene mode (the reference demo's primary
        # artifact, app.py:860+, now viewable in-browser, not download-only)
        viewer = (f'<p><a href="/viewer?run={run_id}" target="_blank">'
                  f'open 3D viewer</a> · '
                  f'<a href="/viewer?run={run_id}&mode=glb" target="_blank">'
                  f'GLB scene view</a></p>'
                  f'<iframe src="/viewer?run={run_id}" width="100%" '
                  f'height="480" style="border:1px solid #888"></iframe>')
    return (f"<h2>Result ({info['views']} views, "
            f"{info['elapsed']:.1f}s forward)</h2>"
            f"<p>Downloads: {links}</p>{viewer}"
            f"<div class='row'>{items}</div>{vid}")


class Handler(BaseHTTPRequestHandler):
    def log_message(self, fmt, *a):
        pass

    def _send(self, body, ctype="text/html", code=200):
        data = body if isinstance(body, bytes) else body.encode()
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def do_GET(self):
        if self.path == "/" or self.path.startswith("/?"):
            opts = "".join(f'<option>{html.escape(e)}</option>'
                           for e in list_examples())
            self._send(_PAGE.format(examples=opts, result=""))
        elif self.path.startswith("/out/"):
            rel = urllib.parse.unquote(self.path[len("/out/"):])
            base = Path(STATE["args"].workdir).resolve()
            p = (base / rel).resolve()
            if not str(p).startswith(str(base)) or not p.is_file():
                self._send("not found", code=404)
                return
            ctypes_map = {".png": "image/png", ".glb": "model/gltf-binary",
                          ".mp4": "video/mp4", ".ply": "application/octet-stream",
                          ".splat": "application/octet-stream"}
            self._send(p.read_bytes(),
                       ctypes_map.get(p.suffix, "application/octet-stream"))
        elif self.path.startswith("/viewer"):
            vp = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "hunyuanworld_mirror_tpu", "io", "viewer.html")
            self._send(Path(vp).read_text())
        elif self.path == "/health":
            self._send(json.dumps({"ok": True, "model": STATE["args"].preset}),
                       "application/json")
        else:
            self._send("not found", code=404)

    def do_POST(self):
        if self.path != "/run":
            self._send("not found", code=404)
            return
        length = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(length)
        ctype = self.headers.get("Content-Type", "")
        m = re.search("boundary=([^;]+)", ctype)
        fields, files = _parse_multipart(body, m.group(1)) if m else ({}, [])

        image_paths = []
        if fields.get("example"):
            d = os.path.join(STATE["args"].examples, fields["example"])
            from hunyuanworld_mirror_tpu.io.images import IMAGE_EXTS
            import glob as globlib
            for ext in IMAGE_EXTS:
                image_paths.extend(globlib.glob(os.path.join(d, ext)))
            image_paths = sorted(set(image_paths))
        elif files:
            up = Path(STATE["args"].workdir) / f"upload_{int(time.time())}"
            up.mkdir(parents=True, exist_ok=True)
            for i, (name, data) in enumerate(files):
                p = up / f"{i:03d}_{os.path.basename(name)}"
                p.write_bytes(data)
                image_paths.append(str(p))

        if not image_paths:
            self._send("no images provided", code=400)
            return
        with STATE["lock"]:
            run_id, info = run_inference(image_paths, fields)
        opts = "".join(f'<option>{html.escape(e)}</option>'
                       for e in list_examples())
        self._send(_PAGE.format(examples=opts,
                                result=render_result(run_id, info)))


def _parse_multipart(body: bytes, boundary: str):
    """Tiny multipart/form-data parser (cgi module is gone in 3.13+)."""
    fields, files = {}, []
    delim = b"--" + boundary.encode()
    for part in body.split(delim):
        part = part.strip(b"\r\n")
        if not part or part == b"--":
            continue
        if b"\r\n\r\n" not in part:
            continue
        head, data = part.split(b"\r\n\r\n", 1)
        head = head.decode(errors="replace")
        name_m = re.search(r'name="([^"]*)"', head)
        file_m = re.search(r'filename="([^"]*)"', head)
        if not name_m:
            continue
        if file_m and file_m.group(1):
            if data:
                files.append((file_m.group(1), data))
        else:
            fields[name_m.group(1)] = data.decode(errors="replace")
    return fields, files


def main():
    args = parse_args()
    os.makedirs(args.workdir, exist_ok=True)
    STATE["args"] = args
    STATE["lock"] = threading.Lock()
    print(f"loading model (preset={args.preset}, size={args.size}) ...")
    STATE["model"] = build_model(args)
    srv = ThreadingHTTPServer((args.host, args.port), Handler)
    print(f"demo at http://{args.host}:{args.port}/")
    srv.serve_forever()


if __name__ == "__main__":
    main()
