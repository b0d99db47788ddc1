"""Ring attention: sequence-parallel attention over the mesh 'seq' axis.

The reference has no sequence parallelism (SURVEY.md 2.8 — long audio is
handled algorithmically); this substantiates the mesh's reserved 'seq' axis
for contexts that outgrow one chip: q/k/v are sharded over the sequence
dimension, each device computes online-softmax partial attention against the
k/v block it currently holds, and blocks rotate around the ring with
`lax.ppermute` (ICI neighbor exchange) until every q block has seen every k/v
block.  FlashAttention-style (m, l, acc) accumulators make the result exact.

Works under `jit` via `shard_map`; supports causal masking at block granularity
with exact in-block masks.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.6
    from jax import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map_old

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map_old(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs)

__all__ = ["ring_attention"]

NEG_INF = -1e30


def _local_block_attention(q, k, v, m, l, acc, scale, q_off, k_off, is_causal, kv_mask=None):
    """One online-softmax update of local q against one k/v block.
    q (B, Tq, H, D), k/v (B, Tk, H, D); m/l (B, H, Tq, 1); acc like q (f32);
    kv_mask optional (B, Tk) bool — True = key is attendable."""
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    if is_causal:
        Tq, Tk = q.shape[1], k.shape[1]
        rows = q_off + jax.lax.broadcasted_iota(jnp.int32, (Tq, Tk), 0)
        cols = k_off + jax.lax.broadcasted_iota(jnp.int32, (Tq, Tk), 1)
        logits = jnp.where(rows[None, None] >= cols[None, None], logits, NEG_INF)
    if kv_mask is not None:
        logits = jnp.where(kv_mask[:, None, None, :], logits, NEG_INF)

    m_cur = jnp.max(logits, axis=-1, keepdims=True)
    m_new = jnp.maximum(m, m_cur)
    # guard the all-masked case: when every logit so far is NEG_INF,
    # exp(logits - m_new) would be exp(0) = 1 for masked entries
    p = jnp.where(logits > 0.5 * NEG_INF, jnp.exp(logits - m_new), 0.0)
    alpha = jnp.exp(m - m_new)
    l_new = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
    pv = jnp.einsum("bhqk,bkhd->bqhd", p, v.astype(jnp.float32))
    acc_new = acc * jnp.swapaxes(alpha, 1, 2) + pv
    return m_new, l_new, acc_new


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    axis: str = "seq",
    is_causal: bool = False,
    scale: Optional[float] = None,
    kv_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Exact attention with q/k/v sequence-sharded over `axis`.

    Inputs (B, T, H, D) with T divisible by the axis size; output sharded the
    same way. Inside jit, the per-step k/v rotation is a `ppermute` riding ICI.
    kv_mask: optional (B, T) bool key-padding mask (True = attendable), also
    sequence-sharded — the local mask block rotates around the ring with its
    k/v block.  Reverse-mode AD works (static trip count: the fori_loop lowers
    to a scan), so this op serves training as well as inference.
    """
    D = q.shape[-1]
    scale = scale if scale is not None else D**-0.5
    n = dict(mesh.shape)[axis]

    def local(q, k, v, mb):
        B, Tq, H, Dh = q.shape
        my = jax.lax.axis_index(axis)
        q_off = my * Tq

        # mark the accumulators as device-varying over the ring axis (shard_map
        # VMA typing: the loop carries become varying after the first update)
        m0 = jax.lax.pvary(jnp.full((B, H, Tq, 1), NEG_INF, jnp.float32), (axis,))
        l0 = jax.lax.pvary(jnp.zeros((B, H, Tq, 1), jnp.float32), (axis,))
        acc0 = jax.lax.pvary(jnp.zeros((B, Tq, H, Dh), jnp.float32), (axis,))

        def body(i, carry):
            m, l, acc, kb, vb, mbk = carry
            src = (my - i) % n  # which global block we currently hold
            m, l, acc = _local_block_attention(
                q, kb, vb, m, l, acc, scale, q_off, src * Tq, is_causal,
                kv_mask=mbk,
            )
            perm = [(j, (j + 1) % n) for j in range(n)]
            kb = jax.lax.ppermute(kb, axis, perm)
            vb = jax.lax.ppermute(vb, axis, perm)
            if mbk is not None:
                mbk = jax.lax.ppermute(mbk, axis, perm)
            return m, l, acc, kb, vb, mbk

        m, l, acc, _, _, _ = jax.lax.fori_loop(0, n, body, (m0, l0, acc0, k, v, mb))
        out = acc / jnp.maximum(jnp.swapaxes(l, 1, 2), 1e-30)
        return out.astype(q.dtype)

    spec = P(None, axis, None, None)
    if kv_mask is not None:
        mspec = P(None, axis)
        return shard_map(
            local, mesh, in_specs=(spec, spec, spec, mspec), out_specs=spec
        )(q, k, v, kv_mask)
    return shard_map(
        lambda q, k, v: local(q, k, v, None),
        mesh, in_specs=(spec, spec, spec), out_specs=spec,
    )(q, k, v)
