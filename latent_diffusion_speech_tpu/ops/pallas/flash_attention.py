"""Flash attention as a Pallas TPU kernel.

Tiled online-softmax attention: for each (batch*head, q-block) grid cell the
kernel streams k/v blocks through VMEM, maintaining running max / normalizer /
accumulator in f32 scratch — the standard FlashAttention-2 recurrence, mapped
to MXU matmuls.  This is the TPU-native stand-in for the flash-attn CUDA
kernels the reference patches into its RoFormer (`roformer_flash_attn.py`).

Interface mirrors `ops.attention.dot_product_attention`; inputs (B, T, H, D).
Sequence lengths are padded to block multiples (masked out in-softmax).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention"]

NEG_INF = -1e30


def _attn_kernel(
    q_ref, k_ref, v_ref, o_ref,
    m_scratch, l_scratch, acc_scratch,
    *, scale: float, is_causal: bool, block_q: int, block_k: int, kv_len: int,
):
    """Grid: (BH, num_q_blocks, num_k_blocks); k innermost for the recurrence."""
    qi = pl.program_id(1)
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, NEG_INF)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    q = q_ref[0].astype(jnp.float32) * scale           # (block_q, D)
    k = k_ref[0].astype(jnp.float32)                   # (block_k, D)
    v = v_ref[0].astype(jnp.float32)                   # (block_k, D)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (block_q, block_k)

    # mask out-of-range kv columns (padding) and causal region
    col = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    mask = col < kv_len
    if is_causal:
        row = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        mask = mask & (col <= row)
    s = jnp.where(mask, s, NEG_INF)

    m_prev = m_scratch[:]                              # (block_q, 1)
    l_prev = l_scratch[:]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)                             # (block_q, block_k)
    alpha = jnp.exp(m_prev - m_new)
    l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)

    acc_scratch[:] = acc_scratch[:] * alpha + jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    m_scratch[:] = m_new
    l_scratch[:] = l_new

    @pl.when(ki == pl.num_programs(2) - 1)
    def _finish():
        o_ref[0] = (acc_scratch[:] / jnp.maximum(l_scratch[:], 1e-30)).astype(o_ref.dtype)


def _pad_to(x, axis, multiple):
    n = x.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=("is_causal", "scale", "block_q", "block_k"))
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
    is_causal: bool = False,
    scale: Optional[float] = None,
    block_q: int = 128,
    block_k: int = 128,
) -> jnp.ndarray:
    """(B, T, H, D) attention. bias/mask unsupported in the kernel path —
    callers needing them fall back to the XLA implementation."""
    if bias is not None or mask is not None:
        from latent_diffusion_speech_tpu.ops.attention import dot_product_attention

        return dot_product_attention(q, k, v, bias=bias, mask=mask, is_causal=is_causal, scale=scale)

    B, Tq, H, D = q.shape
    Tkv = k.shape[1]
    scale = scale if scale is not None else D**-0.5

    # (BH, T, D) layout, padded to block multiples
    def to_bh(x, T):
        return jnp.swapaxes(x, 1, 2).reshape(B * H, T, x.shape[-1])

    qb = _pad_to(to_bh(q, Tq), 1, block_q)
    kb = _pad_to(to_bh(k, Tkv), 1, block_k)
    vb = _pad_to(to_bh(v, Tkv), 1, block_k)
    Tq_p, Tkv_p = qb.shape[1], kb.shape[1]

    grid = (B * H, Tq_p // block_q, Tkv_p // block_k)
    out = pl.pallas_call(
        functools.partial(
            _attn_kernel, scale=scale, is_causal=is_causal,
            block_q=block_q, block_k=block_k, kv_len=Tkv,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, qi, ki: (b, ki, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda b, qi, ki: (b, qi, 0)),
        out_shape=jax.ShapeDtypeStruct(qb.shape, q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, D), jnp.float32),
        ],
    )(qb, kb, vb)

    out = out[:, :Tq].reshape(B, H, Tq, D)
    return jnp.swapaxes(out, 1, 2)
