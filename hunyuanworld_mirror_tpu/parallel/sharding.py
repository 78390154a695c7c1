"""Sharding rules: param TP layouts + view/data activation shardings.

The stance (scaling-book recipe): pick the mesh, annotate param and input
shardings, and let XLA insert the collectives. The alternating-attention
structure gives a natural layout:

  * frame attention (B*S, N, C): tokens sharded over ("data", "view") on the
    batch-of-frames axis -> zero communication;
  * global attention (B, S*N, C): the S*N token axis carries the "view"
    sharding; XLA turns the head-sharded attention into all-gather-KV over
    ICI exactly where the reference's single SDPA call was the O((S·P)^2)
    bottleneck (SURVEY.md §5.7);
  * TP ("model"): qkv/fc1 column-parallel, proj/fc2 row-parallel — the
    Megatron layout, expressed purely as NamedSharding on the param pytree.
"""

import re
from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


# path-regex -> PartitionSpec for the weight's dimensions.
# Block params appear both stacked (leading layer axis, from lax.scan stacks)
# and unstacked; the rules below name the trailing dims.
TP_RULES = [
    (r"attn/qkv/w$", P(None, "model")),      # column parallel (out dim)
    (r"attn/proj/w$", P("model", None)),     # row parallel (in dim)
    (r"mlp/fc1/w$", P(None, "model")),
    (r"mlp/fc2/w$", P("model", None)),
    (r"patch_embed/.*blocks.*qkv/w$", P(None, "model")),
]


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def param_shardings(params, mesh: Mesh):
    """NamedSharding pytree for params: TP rules where they match (padding the
    spec with leading None for stacked layer axes), replicated otherwise."""

    def rule_for(path, leaf):
        s = _path_str(path)
        for pattern, spec in TP_RULES:
            if re.search(pattern, s):
                pad = leaf.ndim - len(spec)
                full = P(*([None] * pad + list(spec)))
                return NamedSharding(mesh, full)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule_for, params)


def view_sharding(mesh: Mesh, ndim: int, batch_axis: int = 0, view_axis: int = 1):
    """Shard (B, S, ...) arrays over ("data", "view")."""
    spec = [None] * ndim
    spec[batch_axis] = "data"
    spec[view_axis] = "view"
    return NamedSharding(mesh, P(*spec))


def views_shardings(views: Dict[str, Any], mesh: Mesh):
    return {k: view_sharding(mesh, v.ndim) for k, v in views.items()}


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
