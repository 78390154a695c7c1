"""LPIPS perceptual distance in JAX (AlexNet backbone + linear heads).

Behavioral parity: the `lpips` PyPI package's `LPIPS(net="alex")` (Zhang et
al., CVPR 2018), which the reference uses for NVS evaluation via torchmetrics
(reference submodules/gsplat/examples/simple_trainer_worldmirror.py:29-30,
README.md:248-251 reports PSNR/SSIM/LPIPS).

The published metric needs the pretrained AlexNet + calibrated linear-head
weights, which this image cannot download (zero egress). The gate:

  * `convert_torch_state(sd)` maps the lpips package's state dict
    (`net.slice{1..5}.*` + `lin{0..4}.model.1.weight`, merged with the
    torchvision AlexNet `features.*` weights) onto our param pytree — run it
    wherever those weights exist, save with `save_params`, and point
    `WM_LPIPS_WEIGHTS` at the .npz;
  * without converted weights, `init_random` gives a structurally identical
    net for tests/plumbing, and metric reports omit "lpips" rather than
    publishing an uncalibrated number.

Layout: NHWC, inputs in [0, 1] (converted internally to the [-1, 1] +
shift/scale normalization the torch net expects).
"""

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..models import nn

# (out_ch, kernel, stride, pad) of torchvision AlexNet `features` convs
_ALEX = [(64, 11, 4, 2), (192, 5, 1, 2), (384, 3, 1, 1),
         (256, 3, 1, 1), (256, 3, 1, 1)]
_CHANNELS = [64, 192, 384, 256, 256]

# lpips.ScalingLayer constants
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def init_random(key) -> Dict:
    """Random-init params with the exact production structure (testing only —
    NOT the calibrated LPIPS metric)."""
    params = {"convs": [], "lins": []}
    cin = 3
    for i, (cout, k, _, _) in enumerate(_ALEX):
        key, sub = jax.random.split(key)
        params["convs"].append(nn.conv_init(sub, cin, cout, k))
        cin = cout
    for c in _CHANNELS:
        key, sub = jax.random.split(key)
        w = jax.random.uniform(sub, (1, 1, c, 1), jnp.float32, 0.0, 0.1)
        params["lins"].append({"w": w})
    return params


def convert_torch_state(sd: Dict[str, np.ndarray]) -> Dict:
    """Map the `lpips` package state dict (plus AlexNet features) to params.

    Accepts either naming scheme:
      net.slice{i}.{j}.weight  (lpips package submodule slices)
      features.{j}.weight      (raw torchvision AlexNet)
    plus lin{i}.model.1.weight for the linear heads.
    """
    # feature-module indices of the five convs inside torchvision AlexNet
    feat_idx = [0, 3, 6, 8, 10]
    slice_local = {0: (1, 0), 1: (2, 1), 2: (3, 1), 3: (4, 0), 4: (5, 0)}

    def conv_w(i):
        for k in (f"features.{feat_idx[i]}.weight",
                  f"net.slice{slice_local[i][0]}.{feat_idx[i]}.weight"):
            if k in sd:
                return k
        raise KeyError(f"conv{i} weights not found in state dict")

    params = {"convs": [], "lins": []}
    for i in range(5):
        wk = conv_w(i)
        bk = wk.replace("weight", "bias")
        params["convs"].append({
            "w": np.asarray(sd[wk]).transpose(2, 3, 1, 0).copy(),
            "b": np.asarray(sd[bk]).copy(),
        })
    for i in range(5):
        w = np.asarray(sd[f"lin{i}.model.1.weight"])  # (1, C, 1, 1)
        params["lins"].append({"w": w.transpose(2, 3, 1, 0).copy()})
    return params


def _features(params, x: jnp.ndarray):
    """x (..., H, W, 3) in [0, 1] -> list of 5 relu feature maps."""
    x = 2.0 * x - 1.0
    x = (x - jnp.asarray(_SHIFT)) / jnp.asarray(_SCALE)
    feats = []
    for i, (cout, k, stride, pad) in enumerate(_ALEX):
        if i in (1, 2):  # maxpool k3 s2 precedes conv2 and conv3
            x = lax.reduce_window(x, -jnp.inf, lax.max, (1, 3, 3, 1),
                                  (1, 2, 2, 1), "VALID")
        x = jax.nn.relu(nn.conv(params["convs"][i], x, stride=stride,
                                padding=pad))
        feats.append(x)
    return feats


def distance(params, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """LPIPS distance per image pair; a, b (B, H, W, 3) in [0, 1]."""
    fa = _features(params, a)
    fb = _features(params, b)
    total = 0.0
    for xa, xb, lin in zip(fa, fb, params["lins"]):
        na = xa / jnp.maximum(
            jnp.linalg.norm(xa, axis=-1, keepdims=True), 1e-10)
        nb = xb / jnp.maximum(
            jnp.linalg.norm(xb, axis=-1, keepdims=True), 1e-10)
        d = (na - nb) ** 2
        w = jnp.maximum(jnp.asarray(lin["w"]), 0.0)  # heads are nonneg
        per_px = lax.conv_general_dilated(
            d, w.astype(d.dtype), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        total = total + jnp.mean(per_px, axis=(1, 2, 3))
    return total


def load_params(path: Optional[str] = None) -> Optional[Dict]:
    """Load converted weights from `path` or $WM_LPIPS_WEIGHTS; None if the
    gate is closed (no weights available in this environment)."""
    import os
    path = path or os.environ.get("WM_LPIPS_WEIGHTS")
    if not path or not os.path.exists(path):
        return None
    from ..training import checkpoint as ckpt
    return ckpt.load_params(path)
