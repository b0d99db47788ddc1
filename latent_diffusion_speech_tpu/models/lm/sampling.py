"""Scan-based autoregressive sampling (HF `generate` semantics, jittable).

Re-expresses the generation pipeline the reference drives through HF
(`roformer.py:220-242`, `llama.py:157-180`) as pure functions + one `lax.scan`:

processor order (HF convention): repetition penalty -> bad-words ban ->
end-gate (force EOS when p(EOS) > threshold, the custom processor at
`roformer.py:49-57`) -> temperature -> top-k -> top-p -> categorical sample.

Static shapes throughout: the scan runs `max_new_tokens` steps; sequences that
hit EOS keep emitting PAD and the host trims after the fact.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["SamplingConfig", "process_logits", "sample_token", "ar_generate"]


@dataclass(frozen=True)
class SamplingConfig:
    max_new_tokens: int = 1024
    do_sample: bool = True
    temperature: float = 1.0
    top_k: int = 5
    top_p: float = 0.8
    repetition_penalty: float = 1.2
    end_gate_threshold: Optional[float] = None
    eos_token_id: int = 0
    pad_token_id: int = 0
    bos_token_id: int = 0
    ban_until: int = 0  # ban token ids < ban_until (llama bad_words_ids)
    # decode-scan unroll: compiles N step bodies per loop iteration, letting
    # XLA fuse across steps and amortize loop bookkeeping (measured on v5e:
    # 56 -> 50 us/token at unroll 4 for the flagship RoFormer decoder)
    scan_unroll: int = 4


def _top_k_vals(logits: jnp.ndarray, k: int) -> jnp.ndarray:
    """Top-k VALUES (descending) of (B, V) logits.

    `lax.top_k` lowers to a full-vocab sort on TPU — profiled at ~58% of the
    whole AR decode step at V=4099.  For the small k used in sampling, k
    rounds of (max, mask) are k cheap VPU reductions instead.  Exact except
    that exactly-tied values collapse into one slot (measure-zero for real
    logits; the effect is a slightly more permissive nucleus threshold)."""
    if k > 16:
        return jax.lax.top_k(logits, k)[0]
    vals = []
    x = logits
    for _ in range(k):
        m = jnp.max(x, axis=-1)
        vals.append(m)
        x = jnp.where(x >= m[:, None], -jnp.inf, x)
    return jnp.stack(vals, axis=-1)


def process_logits(
    logits: jnp.ndarray,
    generated_mask: jnp.ndarray,
    cfg: SamplingConfig,
) -> jnp.ndarray:
    """Apply processors to (B, V) logits. generated_mask (B, V): True where the
    token id already appeared in the sequence (for repetition penalty)."""
    logits = logits.astype(jnp.float32)

    if cfg.repetition_penalty != 1.0:
        penalized = jnp.where(
            logits > 0, logits / cfg.repetition_penalty, logits * cfg.repetition_penalty
        )
        logits = jnp.where(generated_mask, penalized, logits)

    if cfg.ban_until > 0:
        v_ids = jnp.arange(logits.shape[-1])
        logits = jnp.where(v_ids[None, :] < cfg.ban_until, -jnp.inf, logits)

    if cfg.end_gate_threshold is not None:
        p_eos = jax.nn.softmax(logits, axis=-1)[:, cfg.eos_token_id]
        gate = p_eos > cfg.end_gate_threshold
        v_ids = jnp.arange(logits.shape[-1])
        forced = jnp.where(v_ids[None, :] == cfg.eos_token_id, 0.0, -jnp.inf)
        logits = jnp.where(gate[:, None], forced, logits)

    if cfg.do_sample and cfg.temperature != 1.0:
        logits = logits / cfg.temperature

    if cfg.do_sample and cfg.top_k > 0 and cfg.top_p < 1.0:
        # fused top-k + top-p: the k survivors come out already ordered, so
        # the nucleus cutoff needs no full-vocab sort — the HF processor
        # order (k then p) does two O(V log V) sorts per step
        k = min(cfg.top_k, logits.shape[-1])
        top_vals = _top_k_vals(logits, k)  # (B, k), descending
        kth = top_vals[:, -1][:, None]
        probs = jax.nn.softmax(top_vals, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        cutoff = cum - probs > cfg.top_p  # True = dropped (keep first always)
        # nucleus threshold = smallest kept logit among the top-k
        thresh = jnp.min(jnp.where(cutoff, jnp.inf, top_vals), axis=-1, keepdims=True)
        logits = jnp.where(logits < jnp.maximum(thresh, kth), -jnp.inf, logits)
    elif cfg.do_sample and cfg.top_k > 0:
        k = min(cfg.top_k, logits.shape[-1])
        top_vals = _top_k_vals(logits, k)
        logits = jnp.where(logits < top_vals[:, -1][:, None], -jnp.inf, logits)
    elif cfg.do_sample and cfg.top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        cutoff_mask = cum - probs > cfg.top_p
        sorted_logits = jnp.where(cutoff_mask, -jnp.inf, sorted_logits)
        thresh = jnp.min(jnp.where(cutoff_mask, jnp.inf, sorted_logits), axis=-1, keepdims=True)
        logits = jnp.where(logits < thresh, -jnp.inf, logits)

    return logits


def sample_token(logits: jnp.ndarray, rng: jax.Array, do_sample: bool) -> jnp.ndarray:
    if do_sample:
        return jax.random.categorical(rng, logits, axis=-1)
    return jnp.argmax(logits, axis=-1)


def ar_generate(
    step_fn: Callable,
    init_carry,
    first_token: jnp.ndarray,
    vocab_size: int,
    cfg: SamplingConfig,
    rng: jax.Array,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Generic AR loop.

    step_fn(carry, token (B,), pos (scalar)) -> (carry, logits (B, V)) must run
    the model for one token (using its KV cache inside carry).
    Returns (tokens (B, max_new_tokens), lengths (B,)): tokens after the first;
    PAD after EOS; lengths include the EOS token when generated.
    """
    B = first_token.shape[0]

    def scan_step(state, step_rng_and_idx):
        carry, token, finished, rep_mask = state
        step_rng, idx = step_rng_and_idx
        carry, logits = step_fn(carry, token, idx)
        logits = process_logits(logits, rep_mask, cfg)
        next_token = sample_token(logits, step_rng, cfg.do_sample)
        next_token = jnp.where(finished, cfg.pad_token_id, next_token)
        now_finished = finished | (next_token == cfg.eos_token_id)
        rep_mask = rep_mask | jax.nn.one_hot(next_token, vocab_size, dtype=bool)
        was_active = ~finished
        return (carry, next_token, now_finished, rep_mask), (next_token, was_active)

    rep_mask = jax.nn.one_hot(first_token, vocab_size, dtype=bool)
    rngs = jax.random.split(rng, cfg.max_new_tokens)
    idxs = jnp.arange(cfg.max_new_tokens)
    init = (init_carry, first_token, jnp.zeros((B,), bool), rep_mask)
    _, (tokens, was_active) = jax.lax.scan(
        scan_step, init, (rngs, idxs), unroll=max(1, cfg.scan_unroll)
    )

    tokens = tokens.T  # (B, max_new_tokens)
    lengths = jnp.sum(was_active.T.astype(jnp.int32), axis=-1)
    return tokens, lengths
