"""Shared multi-head attention op.

One attention implementation feeds every model in the framework (whisper
encoder, UNet transformer blocks, RoFormer/Llama LMs) — where the reference
used three different stacks (manual qkv `whisper/model.py:70-83`, diffusers
`attention_processor.py` SDPA, and flash-attn CUDA kernels
`roformer_flash_attn.py`).

The default path is XLA SDPA-style einsum attention with f32 softmax (bf16-in,
bf16-out, f32 accumulate — the TPU-native mixed precision).  A Pallas
flash-attention kernel (ops/pallas/flash_attention.py) plugs in behind the same
signature for long sequences; for the frame counts this stack sees (~100-3000)
XLA's fused softmax is already near roofline, so the Pallas path is opt-in.
"""

from __future__ import annotations

import contextlib
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = [
    "dot_product_attention",
    "rotate_half",
    "apply_rotary",
    "sequence_parallel",
]

# Active sequence-parallel contexts (a stack of (mesh, axis)).  When set,
# eligible self-attention calls route to the exact ring-attention op with
# q/k/v sharded over the mesh axis (ppermute k/v rotation over ICI).  The
# context must be active at TRACE time — wrap the jit call, not just the
# module construction.
_seq_parallel: list = []


@contextlib.contextmanager
def sequence_parallel(mesh, axis: str = "seq"):
    """Route self-attention inside this context through ring attention.

    Self-attention with at most a key-padding mask qualifies (no bias, no
    attention dropout, q and k the same length divisible by the axis size;
    causal and (B, 1, 1, T) key-padding masks are handled exactly — the mask
    block rotates around the ring with its k/v block); anything else falls
    back to the XLA path unchanged.  Convolutional models (the UNet) are not
    sequence-shardable this way — their convs would need halo exchange — so
    this is wired for the pure-transformer stacks (RoFormer/BERT encoders).
    Works for training too: the ring is reverse-mode differentiable
    (tests/test_ring_attention.py pins gradient parity)."""
    _seq_parallel.append((mesh, axis))
    try:
        yield
    finally:
        _seq_parallel.pop()


def _ring_eligible(q, k, bias, mask, dropout_rate, dropout_rng):
    if not _seq_parallel or bias is not None:
        return None
    if dropout_rate > 0.0 and dropout_rng is not None:
        return None
    if q.shape[1] != k.shape[1]:
        return None
    kv_mask = None
    if mask is not None:
        # only pure key-padding masks qualify: (B, 1, 1, T_kv) — the block
        # rotates around the ring with its k/v block; full (T_q, T_kv)
        # attention matrices fall back to the XLA path
        if mask.ndim != 4 or mask.shape[1] != 1 or mask.shape[2] != 1:
            return None
        if mask.shape[-1] != k.shape[1]:
            return None
        kv_mask = mask[:, 0, 0, :].astype(bool)
    mesh, axis = _seq_parallel[-1]
    n = dict(mesh.shape)[axis]
    if n <= 1 or q.shape[1] % n != 0:
        return None
    return mesh, axis, kv_mask


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
    is_causal: bool = False,
    scale: Optional[float] = None,
    impl: str = "xla",
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Attention over (B, T, H, D) tensors (q: T_q, k/v: T_kv).

    mask: broadcastable boolean (True = attend) of shape (..., T_q, T_kv).
    bias: additive float bias, same broadcast rules.
    dropout on the attention probabilities (HF attention_probs_dropout) when
    dropout_rate > 0 and a dropout_rng is given.
    Softmax is computed in float32 regardless of input dtype.
    """
    orig_dtype = q.dtype
    d = q.shape[-1]
    scale = scale if scale is not None else d**-0.5

    ring = _ring_eligible(q, k, bias, mask, dropout_rate, dropout_rng)
    if ring is not None and impl == "xla":
        from latent_diffusion_speech_tpu.ops.ring_attention import ring_attention

        mesh, axis, kv_mask = ring
        return ring_attention(
            q, k, v, mesh, axis=axis, is_causal=is_causal, scale=scale,
            kv_mask=kv_mask,
        )

    if impl == "pallas":
        from latent_diffusion_speech_tpu.ops.pallas.flash_attention import flash_attention

        return flash_attention(q, k, v, bias=bias, mask=mask, is_causal=is_causal, scale=scale)

    if impl == "fused":
        # single-block fused attention with a Pallas backward — for short
        # self-attention (the UNet transformer blocks), where the unfused
        # path is bound by (B, H, T, T) f32 logits traffic in HBM
        from latent_diffusion_speech_tpu.ops.pallas.fused_attention import (
            MAX_FUSED_T,
            fused_attention,
        )

        if (
            jax.default_backend() == "tpu"  # CPU (tests/quickstart): XLA path
            and bias is None and mask is None and not is_causal
            and not (dropout_rate > 0.0 and dropout_rng is not None)
            and q.shape == k.shape == v.shape
            and q.shape[1] <= MAX_FUSED_T
        ):
            return fused_attention(q, k, v, scale)
        # anything else: fall through to the XLA path below

    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    if is_causal:
        t_q, t_kv = logits.shape[-2], logits.shape[-1]
        causal = jnp.tril(jnp.ones((t_q, t_kv), dtype=bool), k=t_kv - t_q)
        logits = jnp.where(causal, logits, jnp.finfo(jnp.float32).min)
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    weights = jax.nn.softmax(logits, axis=-1).astype(orig_dtype)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, weights.shape)
        weights = jnp.where(keep, weights / (1.0 - dropout_rate), 0.0)
    return jnp.einsum("bhqk,bkhd->bqhd", weights, v)


def rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    """(…, 2d) -> rotate pairs: HF RoFormer convention (interleaved pairs)."""
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    return jnp.stack([-x2, x1], axis=-1).reshape(x.shape)


def apply_rotary(x: jnp.ndarray, sin: jnp.ndarray, cos: jnp.ndarray) -> jnp.ndarray:
    """Rotary position embedding, HF RoFormer convention: sin/cos of shape
    (T, D) with values repeated pairwise ([s0,s0,s1,s1,...])."""
    return x * cos + rotate_half(x) * sin
