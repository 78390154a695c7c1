"""Full-flagship weight-name contract (VERDICT r3 #5).

Meta-device-initializes the COMPLETE reference WorldMirror (ViT-L encoder,
24x2 trunk, all five heads — /root/reference/src/models/models/worldmirror.py
:16-118) so its full state_dict name/shape inventory exists without
allocating 1B+ real parameters, then asserts tools/convert_weights.py:

  1. READS every reference key (zero unmapped: no future reference tensor
     can silently fall through the converter), and
  2. produces exactly the param pytree our flagship init() builds (zero
     missing / zero extra leaves, matching shapes) — so on weights-day the
     full ViT-L name map is already proven, not run for the first time.

The earlier per-module parity tests exercise conversion VALUES at small
widths; this test pins the complete NAME/SHAPE map at flagship scale.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")
# NOTE: do NOT put tools/ itself on sys.path here — tools/model_profile.py would
# shadow the stdlib `profile` module for torch's cProfile import. The
# namespace-package import `from tools import convert_weights` is safe.

from conftest import torch_reference  # noqa: E402


class _TrackingSD(dict):
    """state_dict wrapper recording which keys the converter actually reads."""

    def __init__(self, base):
        super().__init__(base)
        self.read = set()

    def __getitem__(self, k):
        self.read.add(k)
        return super().__getitem__(k)

    def get(self, k, default=None):
        if super().__contains__(k):
            self.read.add(k)
        return super().get(k, default)


def _flat_shapes(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        it = tree.items()
    elif isinstance(tree, (list, tuple)):
        it = ((f"#{i}", v) for i, v in enumerate(tree))
    else:
        out[prefix.rstrip("/")] = tuple(tree.shape)
        return out
    for k, v in it:
        out.update(_flat_shapes(v, f"{prefix}{k}/"))
    return out


def _ref_flagship_state_dict(torch):
    """Full-scale reference WorldMirror state_dict on the meta device."""
    if "/root/reference/submodules/gsplat" not in sys.path:
        sys.path.insert(0, "/root/reference/submodules/gsplat")
    from src.models.models.visual_transformer import (
        VisualGeometryTransformer)

    # ctor quirk (SURVEY.md §2.1): WorldMirror passes enable_interpolation /
    # max_resolution to a VGT __init__ that doesn't declare them
    orig_init = VisualGeometryTransformer.__init__

    def patched_init(self, *a, **kw):
        kw.pop("enable_interpolation", None)
        kw.pop("max_resolution", None)
        orig_init(self, *a, **kw)

    # vision_transformer.py:114 calls .item() on a linspace during init —
    # route just that constructor to CPU so meta-device init survives
    orig_linspace = torch.linspace

    def cpu_linspace(*a, **kw):
        kw["device"] = "cpu"
        return orig_linspace(*a, **kw)

    VisualGeometryTransformer.__init__ = patched_init
    torch.linspace = cpu_linspace
    try:
        from src.models.models.worldmirror import WorldMirror
        with torch.device("meta"):
            model = WorldMirror()
        sd = model.state_dict()
    finally:
        VisualGeometryTransformer.__init__ = orig_init
        torch.linspace = orig_linspace
    return {k: v for k, v in sd.items()}


def test_flagship_weight_name_contract():
    torch = torch_reference()
    import jax

    from hunyuanworld_mirror_tpu.models import worldmirror
    from tools import convert_weights as cw

    sd_meta = _ref_flagship_state_dict(torch)
    assert len(sd_meta) > 500, f"suspiciously small state dict: {len(sd_meta)}"

    # zeros stand in for values: this test pins NAMES and SHAPES; value
    # correctness is covered by the small-width parity tests. fp16 keeps the
    # transient numpy copies (~1.3B params) at half size.
    sd = _TrackingSD({k: np.zeros(tuple(v.shape), np.float16)
                      for k, v in sd_meta.items()})
    params = cw.convert_worldmirror(sd)

    unread = set(sd) - sd.read
    assert not unread, (
        f"{len(unread)} reference tensors NOT consumed by the converter "
        f"(they would silently fall through on weights-day): "
        f"{sorted(unread)[:20]}")

    # converted tree must be exactly the flagship init() tree
    ours = jax.eval_shape(
        lambda k: worldmirror.init(k, worldmirror.WorldMirrorConfig()),
        jax.ShapeDtypeStruct((2,), np.uint32))
    want = _flat_shapes(jax.tree.map(lambda x: x, ours,
                                     is_leaf=lambda x: hasattr(x, "shape")))
    got = _flat_shapes(params)

    missing = set(want) - set(got)
    extra = set(got) - set(want)
    assert not missing, f"converter missing {len(missing)} params: " \
                        f"{sorted(missing)[:20]}"
    assert not extra, f"converter emits {len(extra)} unknown params: " \
                      f"{sorted(extra)[:20]}"
    bad = {k: (got[k], want[k]) for k in want if got[k] != want[k]}
    assert not bad, f"shape mismatches: {dict(list(bad.items())[:10])}"
