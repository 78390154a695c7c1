"""Device-mesh construction for multi-chip WorldMirror.

Axes (SURVEY.md §2.10, §5.7 — all greenfield, the reference has no
parallelism):
  * "data": batch sharding (DP).
  * "view": the S (multi-view / frame) axis — frame attention is
    embarrassingly parallel over views, so this is the framework's sequence-
    parallel axis; global attention is the only cross-view collective point.
  * "model": tensor parallelism over attention heads / MLP hidden dim.

Pipeline/expert axes are deliberately absent: the model is a 24-layer dense
trunk with no MoE, and view+tensor sharding saturate ICI long before PP would
pay for its bubbles at this depth.
"""

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
from jax.sharding import Mesh


AXES = ("data", "view", "model")


def make_mesh(data: int = 1, view: int = 1, model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, view, model) mesh from the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = data * view * model
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    arr = np.asarray(devices[:n]).reshape(data, view, model)
    return Mesh(arr, AXES)


def auto_mesh(n_devices: Optional[int] = None) -> Mesh:
    """Heuristic mesh: prefer the view axis (zero-comms frame attention),
    give leftovers to data."""
    n = n_devices if n_devices is not None else len(jax.devices())
    view = 1
    for cand in (8, 4, 2, 1):
        if n % cand == 0:
            view = cand
            break
    return make_mesh(data=n // view, view=view, model=1)
