"""LoRA: low-rank adaptation over any flax params tree.

Capability parity with the reference's LoRA-compatible layers
(`diffusion/unet1d/lora.py:21-123` — plain conv/linear unless a LoRA delta is
set).  Functional design: `lora_init` builds (A, B) factor pairs for every
kernel matching the target patterns; `lora_apply` returns the merged params
(W + scale * A @ B); training optimizes only the LoRA tree (the base params
stay frozen), e.g. `jax.grad(lambda l: loss(lora_apply(params, l)))`.

Works for Dense kernels (in, out) and 1-D conv kernels (k, in, out) — the conv
delta factors over (k*in, out).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp

__all__ = ["lora_init", "lora_apply", "lora_param_count"]

DEFAULT_TARGETS = (r"(to_q|to_k|to_v|to_out|query|key|value|out|ff_proj|ff_out|proj_in|proj_out)/kernel$",)


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)


def lora_init(
    params: Any,
    rng: jax.Array,
    rank: int = 8,
    targets: Sequence[str] = DEFAULT_TARGETS,
) -> Dict:
    """Build the LoRA tree: {path: {"a": (fan_in, r), "b": (r, fan_out)}}.
    `a` is gaussian-initialized, `b` zeros (delta starts at 0)."""
    flat = {}
    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    for i, (path, leaf) in enumerate(leaves):
        ps = _path_str(path)
        if leaf.ndim < 2 or not any(re.search(t, ps) for t in targets):
            continue
        fan_in = int(jnp.prod(jnp.asarray(leaf.shape[:-1])))
        fan_out = leaf.shape[-1]
        key = jax.random.fold_in(rng, i)
        flat[ps] = {
            "a": jax.random.normal(key, (fan_in, rank), jnp.float32) / jnp.sqrt(fan_in),
            "b": jnp.zeros((rank, fan_out), jnp.float32),
        }
    return flat


def lora_apply(params: Any, lora: Dict, scale: float = 1.0) -> Any:
    """Merged params: W + scale * reshape(A @ B). Differentiable wrt `lora`."""

    def merge(path, leaf):
        ps = _path_str(path)
        if ps not in lora:
            return leaf
        delta = (lora[ps]["a"] @ lora[ps]["b"]).reshape(leaf.shape)
        return leaf + scale * delta.astype(leaf.dtype)

    return jax.tree_util.tree_map_with_path(merge, params)


def lora_param_count(lora: Dict) -> int:
    return sum(int(v["a"].size + v["b"].size) for v in lora.values())
