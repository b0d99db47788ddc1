"""Fused short-sequence attention (forward + backward) as Pallas TPU kernels.

STATUS: measured NEGATIVE result, kept as a tested opt-in
(`UNet1DConfig.attn_impl='fused'`).  Built when the round-3 train-step
decomposition showed the UNet's transformer blocks at 84% of forward wall
time (`benchmarks/TRAIN_DECOMPOSE.json`); the follow-up microbenchmarks
(`benchmarks/TRAIN_ATTN_AB.json`) establish that XLA's batched attention
CORE is already at its traffic floor at these shapes (0.18 ms at B=256,
T=88, 8 heads — reading q/k/v + writing out at full HBM rate; its fused
softmax never spills the 63 MB logits), while this kernel runs 4.7x slower
(per-head serial (96, 96) dots under-occupy the MXU and its five DMA streams
sustain less aggregate bandwidth than XLA's access pattern), costing +12%
on the full train step at B=256.  The block's remaining cost is spread
across norms/GEGLU/elementwise HBM traffic — attacked at the XLA level
instead (see `GegluFF` in `models/diffusion/unet1d.py`).  The reference's
equivalent surface is cuDNN SDPA (`diffusion/unet1d/attention_processor.py`
AttnProcessor2_0).

At these lengths the whole sequence fits one VMEM block, so this is
single-block flash attention — no online-softmax recurrence:

* forward: per (batch*head) slab, s = (q k^T) * scale, f32 row-softmax, out =
  p v; writes out (bf16) and the log-sum-exp rows (f32) for the backward.
  HBM traffic: read q,k,v, write out — the T x T matrix never leaves VMEM.
* backward: recomputes p from (q, k, lse) per slab, then
  dv = p^T do;  ds = p * (do v^T - rowsum(do * out));
  dq = ds k * scale;  dk = ds^T q * scale.

`fused_attention` wraps both in jax.custom_vjp behind the same (B, T, H, D)
signature as `ops.attention.dot_product_attention` (self-attention, no
bias/mask/dropout — the UNet case).  G heads are processed per grid step to
amortize DMA; sequences pad to the bf16 sublane tile (16) and pad columns are
masked inside the softmax.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ["fused_attention", "MAX_FUSED_T"]

NEG_INF = -1e30
# one (Tp, Tp) f32 score tile per head must fit VMEM comfortably alongside
# the slab inputs; 512 frames -> 1 MB scores — far beyond the UNet's T<=88
MAX_FUSED_T = 512


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, kv_len, g):
    for h in range(g):
        q = q_ref[h]                                   # (Tp, D) bf16
        s = jax.lax.dot_general(
            q, k_ref[h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                      # (Tp, Tp) f32
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        lse_ref[h] = (m + jnp.log(l))[:, 0]
        o_ref[h] = jax.lax.dot_general(
            (p / l).astype(q.dtype), v_ref[h], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref,
                dq_ref, dk_ref, dv_ref, *, scale, kv_len, g):
    for h in range(g):
        q = q_ref[h]
        k = k_ref[h]
        do = do_ref[h]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, NEG_INF)
        p = jnp.exp(s - lse_ref[h][:, None])           # (Tp, Tp) f32
        pb = p.astype(q.dtype)
        dv_ref[h] = jax.lax.dot_general(
            pb, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(dv_ref.dtype)
        dp = jax.lax.dot_general(
            do, v_ref[h], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )                                              # (Tp, Tp)
        delta = jnp.sum(
            do.astype(jnp.float32) * o_ref[h].astype(jnp.float32),
            axis=-1, keepdims=True,
        )
        ds = (p * (dp - delta) * scale).astype(q.dtype)
        dq_ref[h] = jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(dq_ref.dtype)
        dk_ref[h] = jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(dk_ref.dtype)


def _slab(x, B, H, Tp):
    """(B, T, H, D) -> (B*H, Tp, D), sequence padded to the sublane tile."""
    T = x.shape[1]
    x = jnp.swapaxes(x, 1, 2).reshape(B * H, T, x.shape[-1])
    return jnp.pad(x, ((0, 0), (0, Tp - T), (0, 0))) if Tp != T else x


def _unslab(x, B, H, T):
    return jnp.swapaxes(x[:, :T].reshape(B, H, T, -1), 1, 2)


def _pick_g(BH: int, g: int) -> int:
    while g > 1 and BH % g:
        g //= 2
    return g


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_attention(q, k, v, scale: Optional[float] = None, g: int = 16):
    out, _ = _fused_fwd(q, k, v, scale, g)
    return out


def _fused_fwd(q, k, v, scale, g):
    B, T, H, D = q.shape
    assert k.shape == q.shape and v.shape == q.shape, "self-attention only"
    scale = scale if scale is not None else D**-0.5
    Tp = max(-(-T // 16) * 16, 16)
    BH = B * H
    g = _pick_g(BH, g)
    qb, kb, vb = (_slab(x, B, H, Tp) for x in (q, k, v))
    spec = pl.BlockSpec((g, Tp, D), lambda i: (i, 0, 0))
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, kv_len=T, g=g),
        grid=(BH // g,),
        in_specs=[spec, spec, spec],
        out_specs=[spec, pl.BlockSpec((g, Tp), lambda i: (i, 0))],
        out_shape=[
            jax.ShapeDtypeStruct(qb.shape, q.dtype),
            jax.ShapeDtypeStruct((BH, Tp), jnp.float32),
        ],
    )(qb, kb, vb)
    return _unslab(out, B, H, T), (qb, kb, vb, out, lse, (B, T, H, D))


def _fused_bwd(scale, g, res, dout):
    qb, kb, vb, out, lse, (B, T, H, D) = res
    scale = scale if scale is not None else D**-0.5
    Tp = qb.shape[1]
    BH = B * H
    g = _pick_g(BH, g)
    dob = _slab(dout, B, H, Tp)
    spec = pl.BlockSpec((g, Tp, D), lambda i: (i, 0, 0))
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, kv_len=T, g=g),
        grid=(BH // g,),
        in_specs=[spec, spec, spec, spec, spec,
                  pl.BlockSpec((g, Tp), lambda i: (i, 0))],
        out_specs=[spec, spec, spec],
        out_shape=[jax.ShapeDtypeStruct(qb.shape, qb.dtype)] * 3,
    )(qb, kb, vb, out, dob, lse)
    return tuple(_unslab(x, B, H, T) for x in (dq, dk, dv))


fused_attention.defvjp(_fused_fwd, _fused_bwd)
