"""Declarative parameter sharding (tensor parallelism) via GSPMD.

The reference has no TP (SURVEY.md 2.8); its scaling story is DDP only.  Here
tensor parallelism is a set of (param-path regex -> PartitionSpec) rules: large
kernels get their feature axes laid out over the mesh 'model' axis, the train
step is jit-compiled with those shardings, and XLA's SPMD partitioner inserts
the all-gathers/reduce-scatters — the "pick a mesh, annotate, let XLA insert
collectives" recipe.

Default rules follow the Megatron pattern: column-parallel for up-projections
(qkv, FF-in, GEGLU), row-parallel for down-projections (attention out, FF-out),
embeddings sharded over the feature axis.  Anything unmatched is replicated.
"""

from __future__ import annotations

import re
from typing import Any, List, Sequence, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["ShardingRules", "DEFAULT_TP_RULES", "infer_param_shardings", "apply_param_shardings"]

ShardingRules = Sequence[Tuple[str, P]]

# path regexes are matched against "a/b/c"-joined param paths
DEFAULT_TP_RULES: List[Tuple[str, P]] = [
    # attention projections: qkv column-parallel, out row-parallel
    (r"(query|key|value|to_q|to_k|to_v|q_proj|k_proj|v_proj)/kernel$", P(None, "model")),
    (r"(out|to_out|o_proj)/kernel$", P("model", None)),
    # feed-forward: in/gate column-parallel, out row-parallel
    (r"(ff_in|ff_proj|mlp_0|gate_proj|up_proj)/kernel$", P(None, "model")),
    (r"(ff_out|mlp_2|down_proj)/kernel$", P("model", None)),
    # conv kernels (k, in, out): shard output channels
    (r"(conv1|conv2|conv_in)/.*kernel$", P(None, None, "model")),
    # biases of column-parallel layers follow their outputs
    (r"(query|key|value|to_q|to_k|to_v|ff_in|ff_proj|mlp_0)/bias$", P("model")),
    # MoE expert banks (E, C, F)/(E, F, C): expert dim over the 'expert'
    # axis, hidden dim over 'model' (expert-parallel composes with TP);
    # the router gate stays replicated
    (r"moe/w_(gate|up)$", P("expert", None, "model")),
    (r"moe/w_down$", P("expert", "model", None)),
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


def infer_param_shardings(params: Any, mesh: Mesh, rules: ShardingRules = DEFAULT_TP_RULES) -> Any:
    """Build a NamedSharding pytree matching `params`; unmatched -> replicated.
    A rule only applies when the spec'd axes divide the param dims.  Mesh axes
    of size 1 are dropped from matched specs, so the same rule set serves
    tp-only, ep-only, and combined meshes."""
    mesh_shape = dict(mesh.shape)

    def choose(path, leaf):
        ps = _path_str(path)
        for pattern, spec in rules:
            if not (re.search(pattern, ps) and len(spec) <= leaf.ndim):
                continue
            # drop axes the mesh doesn't actually split over
            eff = [a if (a is None or mesh_shape.get(a, 1) > 1) else None for a in spec]
            if all(a is None for a in eff):
                continue
            if any(
                a is not None and leaf.shape[dim] % mesh_shape[a] != 0
                for dim, a in enumerate(eff)
            ):
                continue
            full = P(*(eff + [None] * (leaf.ndim - len(eff))))
            return NamedSharding(mesh, full)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(choose, params)


def apply_param_shardings(params: Any, shardings: Any) -> Any:
    """device_put the param tree onto its shardings."""
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
