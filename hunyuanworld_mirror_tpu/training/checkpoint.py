"""Checkpoint save/load with resume support.

The reference has no resume path at all (SURVEY.md §5.4: raw torch.save every
2 epochs, manual restart); here checkpoints carry params + optimizer state +
step and restore either. Two formats:
  * .npz: flat path->array archive (portable, dependency-free)
  * orbax: directory checkpoints for sharded/async multi-host saving
"""

import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]):
    root: Dict[str, Any] = {}
    for path, val in flat.items():
        keys = path.split("/")
        node = root
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = jnp.asarray(val)

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(re.fullmatch(r"\d+", k) for k in keys):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def save_params(path: str, params, step: Optional[int] = None,
                opt_state=None) -> str:
    """Save to a single .npz archive (path should end in .npz)."""
    flat = _flatten({"params": params})
    if opt_state is not None:
        flat.update(_flatten({"opt_state": jax.tree.map(np.asarray, opt_state)}))
    if step is not None:
        flat["step"] = np.asarray(step)
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    np.savez(path, **flat)
    return path


def load_params(path: str):
    """Load params from .npz (returns the params pytree only)."""
    with np.load(path, allow_pickle=False) as data:
        flat = {k: data[k] for k in data.files if k.startswith("params/")}
        tree = _unflatten({k[len("params/"):]: v for k, v in flat.items()})
    return tree


def load_train_state(path: str) -> Tuple[Any, Optional[int]]:
    """Load (params, step) for resume. opt_state trees need the optimizer's
    structure, so callers restore it with restore_opt_state."""
    with np.load(path, allow_pickle=False) as data:
        params = _unflatten({k[len("params/"):]: data[k]
                             for k in data.files if k.startswith("params/")})
        step = int(data["step"]) if "step" in data.files else None
    return params, step


def restore_opt_state(path: str, opt_state_like):
    """Restore optimizer state into the structure of `opt_state_like`."""
    with np.load(path, allow_pickle=False) as data:
        flat = {k[len("opt_state/"):]: data[k]
                for k in data.files if k.startswith("opt_state/")}
    if not flat:
        return None
    leaves_like, treedef = jax.tree.flatten(opt_state_like)
    tree = _unflatten(flat)
    leaves_new = jax.tree.leaves(tree)
    assert len(leaves_new) == len(leaves_like), \
        f"opt state leaf mismatch: {len(leaves_new)} vs {len(leaves_like)}"
    return jax.tree.unflatten(treedef, leaves_new)


def save_orbax(ckpt_dir: str, state, step: int) -> None:
    """Async-capable orbax checkpoint (multi-host safe)."""
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(os.path.abspath(ckpt_dir), f"step_{step}"), state)
    ckptr.wait_until_finished()


def load_orbax(ckpt_dir: str, step: int, state_like):
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.join(os.path.abspath(ckpt_dir), f"step_{step}"),
                         state_like)
