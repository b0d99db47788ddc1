"""Mixture-of-Experts feed-forward with expert parallelism (GShard-style).

No reference equivalent — the reference stack has no MoE models and no
parallelism beyond DDP (SURVEY.md §2.8).  This module substantiates the
framework's expert-parallel story the TPU-first way: expert-stacked
parameters `(E, ...)` are sharded over the mesh ``expert`` axis
(`parallel/sharding.py` MOE rules), dispatch/combine are einsums against
one-hot routing tensors, and XLA's SPMD partitioner turns those einsums
into the all-to-alls — no hand-written collectives.

Routing follows the GShard/Switch recipe: softmax router, top-k expert
choice with renormalized gates, a static per-expert capacity
``ceil(k * S / E * capacity_factor)`` (shapes stay static under jit;
overflow tokens are dropped — their combine weight is zero so the residual
path carries them), and the Switch load-balancing auxiliary loss
``E * sum_e f_e * p_e``.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["MoEMLP", "AXIS_EXPERT"]

AXIS_EXPERT = "expert"


def _constrain_expert(x: jnp.ndarray, mesh: Optional[Mesh]) -> jnp.ndarray:
    """Shard the leading (expert) dim over the mesh 'expert' axis when one
    with size > 1 is ambient; no-op otherwise."""
    if mesh is None or dict(mesh.shape).get(AXIS_EXPERT, 1) <= 1:
        return x
    spec = P(AXIS_EXPERT, *([None] * (x.ndim - 1)))
    # inside a partially-manual shard_map body (e.g. the GPipe pipeline,
    # manual over 'pipe') a NamedSharding built from the outer all-Auto mesh
    # fails the context-mesh consistency check; a bare PartitionSpec resolves
    # against the context mesh where 'expert' is still an auto axis
    from jax.sharding import get_abstract_mesh

    if not get_abstract_mesh().empty:
        return jax.lax.with_sharding_constraint(x, spec)
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


class MoEMLP(nn.Module):
    """Token-routed SwiGLU expert bank, drop-in for a dense SwiGLU MLP.

    Input (B, T, C) -> (output (B, T, C), aux_loss scalar).  With
    ``num_experts=1, top_k=1`` and capacity >= tokens this is numerically a
    dense SwiGLU MLP (pinned in tests/test_moe.py).

    The auxiliary loss is also sown into the ``moe_losses`` collection so
    deep stacks can surface it through `Module.apply(..., mutable=...)`.
    """

    num_experts: int
    intermediate_size: int
    top_k: int = 2
    capacity_factor: float = 1.25
    dtype: Any = jnp.float32
    mesh: Optional[Mesh] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        B, T, C = x.shape
        E, F = self.num_experts, self.intermediate_size
        k = min(self.top_k, E)
        S = B * T
        xf = x.reshape(S, C)

        gate_w = self.param(
            "gate", nn.initializers.normal(0.02), (C, E), jnp.float32
        )
        # router math in f32 regardless of the compute dtype
        probs = jax.nn.softmax(xf.astype(jnp.float32) @ gate_w, axis=-1)  # (S, E)

        gate_vals, gate_idx = jax.lax.top_k(probs, k)  # (S, k)
        gate_vals = gate_vals / jnp.maximum(
            jnp.sum(gate_vals, axis=-1, keepdims=True), 1e-9
        )

        capacity = max(int(math.ceil(k * S / E * self.capacity_factor)), 1)
        capacity = min(capacity, k * S)

        # slot-major priority (GShard: every token's 1st choice outranks any
        # 2nd choice): flatten (k, S) with slot 0 first
        oh = jax.nn.one_hot(gate_idx, E, dtype=jnp.float32)  # (S, k, E)
        oh_flat = oh.transpose(1, 0, 2).reshape(k * S, E)
        pos = jnp.cumsum(oh_flat, axis=0) - oh_flat  # rank within expert
        pos_tok = jnp.sum(pos * oh_flat, axis=-1)  # (k*S,)
        keep = (pos_tok < capacity).astype(jnp.float32)
        dispatch_flat = (
            oh_flat * keep[:, None]
        )[:, :, None] * jax.nn.one_hot(pos_tok, capacity, dtype=jnp.float32)[:, None, :]
        gates_flat = gate_vals.transpose(1, 0).reshape(k * S)
        combine_flat = dispatch_flat * gates_flat[:, None, None]
        dispatch = dispatch_flat.reshape(k, S, E, capacity).sum(0)  # (S, E, cap)
        combine = combine_flat.reshape(k, S, E, capacity).sum(0)

        dtype = self.dtype
        expert_in = jnp.einsum(
            "sec,sm->ecm", dispatch.astype(dtype), xf.astype(dtype)
        )
        expert_in = _constrain_expert(expert_in, self.mesh)

        w_gate = self.param("w_gate", nn.initializers.normal(0.02), (E, C, F))
        w_up = self.param("w_up", nn.initializers.normal(0.02), (E, C, F))
        w_down = self.param("w_down", nn.initializers.normal(0.02), (E, F, C))
        h = nn.silu(
            jnp.einsum("ecm,emf->ecf", expert_in, w_gate.astype(dtype))
        ) * jnp.einsum("ecm,emf->ecf", expert_in, w_up.astype(dtype))
        out = jnp.einsum("ecf,efm->ecm", h, w_down.astype(dtype))
        out = _constrain_expert(out, self.mesh)

        y = jnp.einsum("sec,ecm->sm", combine.astype(dtype), out)

        # Switch aux loss: fraction of tokens whose TOP-1 pick is e, times the
        # mean router prob of e, summed and scaled by E (balanced -> 1.0)
        top1 = jax.nn.one_hot(gate_idx[:, 0], E, dtype=jnp.float32)
        f_e = jnp.mean(top1, axis=0)
        p_e = jnp.mean(probs, axis=0)
        aux = E * jnp.sum(f_e * p_e)
        self.sow("moe_losses", "aux", aux)
        # per-call routing stats (2, E): microbatched callers (the GPipe
        # pipeline) average these across microbatches to reconstruct the
        # exact full-batch aux — mean-of-means == full mean for equal sizes
        self.sow("moe_losses", "stats", jnp.stack([f_e, p_e]))
        return y.reshape(B, T, C), aux
