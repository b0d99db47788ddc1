"""Llama decoder-only text->semantic LM in flax.

Parity with the reference single-stream alternative
(`text2semantic/llama/llama.py:23-184`): one token stream
`[BOS, phones, EOS, sem_BOS, semantic..., sem_EOS]` with semantic ids shifted
by the phone vocab size; generation bans text tokens via bad_words
(`llama.py:170`) and un-shifts the output (`llama.py:182`).

Architecture = HF Llama: RMSNorm (pre-norm), rotary with the half-split
convention, SwiGLU MLP, biasless projections.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from latent_diffusion_speech_tpu.models.lm.sampling import SamplingConfig, ar_generate
from latent_diffusion_speech_tpu.ops.attention import dot_product_attention
from latent_diffusion_speech_tpu.text.symbols import symbols

__all__ = ["LlamaConfig", "Llama", "LlamaSystem"]


@dataclass(frozen=True)
class LlamaConfig:
    hidden_size: int = 768
    num_attention_heads: int = 4
    num_hidden_layers: int = 4
    intermediate_size: int = 512
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    mode: str = "phone"
    semantic_kmeans_num: int = 4096
    text_vocab_size: Optional[int] = None
    # MoE FFN (0 = dense).  No reference equivalent; routed SwiGLU experts
    # sharded over the mesh 'expert' axis (ops/moe.py).
    moe_experts: int = 0
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25
    moe_aux_weight: float = 0.01

    @property
    def token_shift(self) -> int:
        if "phone" in self.mode:
            return len(symbols)
        assert self.text_vocab_size is not None
        return self.text_vocab_size

    @property
    def phone_bos(self) -> int:
        return len(symbols)

    @property
    def phone_eos(self) -> int:
        return len(symbols) + 1

    @property
    def vocab_size(self) -> int:
        return self.token_shift + self.semantic_kmeans_num + 3

    @property
    def bos_token_id(self) -> int:  # semantic BOS in the shifted space
        return self.token_shift + self.semantic_kmeans_num

    @property
    def eos_token_id(self) -> int:
        return self.token_shift + self.semantic_kmeans_num + 1

    @property
    def pad_token_id(self) -> int:
        return self.token_shift + self.semantic_kmeans_num + 2


def rotary_half(x: jnp.ndarray, positions: jnp.ndarray, theta: float) -> jnp.ndarray:
    """HF Llama rotary: half-split convention. x (B, T, H, D)."""
    D = x.shape[-1]
    inv_freq = 1.0 / (theta ** (jnp.arange(0, D, 2, dtype=jnp.float32) / D))
    angles = positions.astype(jnp.float32)[..., None] * inv_freq  # (T, D/2)
    cos = jnp.concatenate([jnp.cos(angles), jnp.cos(angles)], axis=-1)[None, :, None, :].astype(x.dtype)
    sin = jnp.concatenate([jnp.sin(angles), jnp.sin(angles)], axis=-1)[None, :, None, :].astype(x.dtype)
    x1, x2 = x[..., : D // 2], x[..., D // 2 :]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return x * cos + rotated * sin


class RMSNorm(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        var = jnp.mean(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
        return (x * jax.lax.rsqrt(var + self.eps)).astype(x.dtype) * scale


class LlamaBlock(nn.Module):
    cfg: LlamaConfig
    dtype: jnp.dtype = jnp.float32
    mesh: Optional[object] = None  # jax.sharding.Mesh for MoE expert sharding

    @nn.compact
    def __call__(self, x, positions, mask=None, is_causal=True, cache=None, cache_index=None):
        cfg = self.cfg
        C, H = cfg.hidden_size, cfg.num_attention_heads
        D = C // H
        h = RMSNorm(cfg.rms_norm_eps, name="input_ln")(x)
        q = nn.Dense(C, use_bias=False, dtype=self.dtype, name="q_proj")(h).reshape(*h.shape[:2], H, D)
        k = nn.Dense(C, use_bias=False, dtype=self.dtype, name="k_proj")(h).reshape(*h.shape[:2], H, D)
        v = nn.Dense(C, use_bias=False, dtype=self.dtype, name="v_proj")(h).reshape(*h.shape[:2], H, D)
        q = rotary_half(q, positions, cfg.rope_theta)
        k = rotary_half(k, positions, cfg.rope_theta)

        new_cache = None
        if cache is not None:
            k_cache = jax.lax.dynamic_update_slice(cache["k"], k, (0, cache_index, 0, 0))
            v_cache = jax.lax.dynamic_update_slice(cache["v"], v, (0, cache_index, 0, 0))
            new_cache = {"k": k_cache, "v": v_cache}
            k, v = k_cache, v_cache
            valid = jnp.arange(k.shape[1])[None, None, None, :] <= cache_index
            mask = valid if mask is None else (mask & valid)
            is_causal = False

        attn = dot_product_attention(q, k, v, mask=mask, is_causal=is_causal)
        attn = attn.reshape(*h.shape[:2], C)
        x = x + nn.Dense(C, use_bias=False, dtype=self.dtype, name="o_proj")(attn)

        h = RMSNorm(cfg.rms_norm_eps, name="post_ln")(x)
        if cfg.moe_experts > 0:
            from latent_diffusion_speech_tpu.ops.moe import MoEMLP

            y, _ = MoEMLP(
                num_experts=cfg.moe_experts,
                intermediate_size=cfg.intermediate_size,
                top_k=cfg.moe_top_k,
                capacity_factor=cfg.moe_capacity_factor,
                dtype=self.dtype,
                mesh=self.mesh,
                name="moe",
            )(h)
            x = x + y
        else:
            gate = nn.Dense(cfg.intermediate_size, use_bias=False, dtype=self.dtype, name="gate_proj")(h)
            up = nn.Dense(cfg.intermediate_size, use_bias=False, dtype=self.dtype, name="up_proj")(h)
            x = x + nn.Dense(C, use_bias=False, dtype=self.dtype, name="down_proj")(nn.silu(gate) * up)
        return x, new_cache


class Llama(nn.Module):
    cfg: LlamaConfig
    dtype: jnp.dtype = jnp.float32
    mesh: Optional[object] = None  # jax.sharding.Mesh for MoE expert sharding

    def setup(self):
        cfg = self.cfg
        self.embed_tokens = nn.Embed(cfg.vocab_size, cfg.hidden_size, name="embed_tokens")
        self.blocks = [
            LlamaBlock(cfg, dtype=self.dtype, mesh=self.mesh, name=f"block_{i}")
            for i in range(cfg.num_hidden_layers)
        ]
        self.final_ln = RMSNorm(cfg.rms_norm_eps, name="final_ln")
        self.lm_head = nn.Dense(cfg.vocab_size, use_bias=False, dtype=self.dtype, name="lm_head")

    def __call__(self, input_ids, attention_mask=None):
        """(B, T) -> logits (B, T, V), causal."""
        x = self.embed_tokens(input_ids)
        positions = jnp.arange(input_ids.shape[1])
        mask = attention_mask[:, None, None, :].astype(bool) if attention_mask is not None else None
        for block in self.blocks:
            x, _ = block(x, positions, mask=mask, is_causal=True)
        return self.lm_head(self.final_ln(x))

    def decode_step(self, token, pos, caches):
        x = self.embed_tokens(token[:, None])
        positions = jnp.asarray([pos])
        new_caches = []
        for block, cache in zip(self.blocks, caches):
            x, nc = block(x, positions, cache=cache, cache_index=pos)
            new_caches.append(nc)
        return self.lm_head(self.final_ln(x))[:, 0], new_caches

    def init_cache(self, batch: int, max_len: int):
        cfg = self.cfg
        H = cfg.num_attention_heads
        D = cfg.hidden_size // H
        return [
            {
                "k": jnp.zeros((batch, max_len, H, D), self.dtype),
                "v": jnp.zeros((batch, max_len, H, D), self.dtype),
            }
            for _ in range(cfg.num_hidden_layers)
        ]


class LlamaSystem:
    def __init__(self, cfg: LlamaConfig, params=None, dtype=jnp.float32, seed: int = 0,
                 codebook: Optional[np.ndarray] = None, mesh=None):
        self.cfg = cfg
        self.module = Llama(cfg, dtype=dtype, mesh=mesh)
        if params is None:
            probe = jnp.zeros((1, 4), jnp.int32)
            # jitted init: one compiled program instead of per-param dispatch
            params = jax.jit(self.module.init)(jax.random.PRNGKey(seed), probe)["params"]
            if codebook is not None and codebook.shape[1] == cfg.hidden_size:
                emb = np.asarray(params["embed_tokens"]["embedding"])
                # reference warm-start slice (llama.py:69)
                lo = len(symbols) - 1
                emb[lo : lo + cfg.semantic_kmeans_num] = codebook
                params = dict(params)
                params["embed_tokens"] = {"embedding": jnp.asarray(emb)}
        self.params = params

    def build_input_ids(self, phone: jnp.ndarray, semantic: jnp.ndarray) -> jnp.ndarray:
        """[BOS, phones, EOS, sem_BOS, semantic+shift, sem_EOS] (llama.py:91-101)."""
        cfg = self.cfg
        B = phone.shape[0]
        col = lambda v: jnp.full((B, 1), v, phone.dtype)
        if cfg.mode == "phone":
            phone = jnp.concatenate([col(cfg.phone_bos), phone, col(cfg.phone_eos)], axis=1)
        sem = semantic + cfg.token_shift
        sem = jnp.concatenate([col(cfg.bos_token_id), sem, col(cfg.eos_token_id)], axis=1)
        return jnp.concatenate([phone, sem], axis=1)

    @staticmethod
    def _ce(logits, labels):
        """Shifted next-token CE over valid (!= -100) positions."""
        logits = logits[:, :-1]
        targets = labels[:, 1:]
        valid = targets != -100
        safe = jnp.where(valid, targets, 0)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        return jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1)

    def loss(self, params, input_ids, labels, attention_mask=None):
        if self.cfg.moe_experts > 0:
            # surface the per-layer Switch aux losses sown by MoEMLP
            # (select the 'aux' scalars; 'stats' arrays are for the pipeline)
            logits, muts = self.module.apply(
                {"params": params}, input_ids, attention_mask, mutable=["moe_losses"]
            )
            aux_leaves = [
                leaf
                for path, leaf in jax.tree_util.tree_flatten_with_path(
                    muts.get("moe_losses", {})
                )[0]
                if any(getattr(k, "key", None) == "aux" for k in path)
            ]
            aux = sum(jnp.mean(jnp.asarray(a)) for a in aux_leaves) / max(len(aux_leaves), 1)
            return self._ce(logits, labels) + self.cfg.moe_aux_weight * aux
        logits = self.module.apply({"params": params}, input_ids, attention_mask)
        return self._ce(logits, labels)

    def loss_pp(
        self,
        params,
        input_ids,
        labels,
        mesh,
        attention_mask=None,
        *,
        microbatches: int = 4,
        batch_axis: Optional[str] = None,
        remat: bool = False,
    ):
        """Pipeline-parallel loss: the homogeneous block stack runs
        GPipe-microbatched over the mesh 'pipe' axis (parallel/pipeline.py);
        the embedding, final norm and LM head are small and stay replicated.
        Numerically identical to `loss` (same ops, same dtypes).

        Composes with expert parallelism (pp x ep): MoE blocks run inside the
        pipeline stages — the expert banks keep their 'expert'-axis GSPMD
        sharding (the pipeline's shard_map is manual over 'pipe' only), and
        each layer's Switch routing stats (mean top-1 fraction, mean router
        prob per expert) ride the activation pytree out of the pipeline, so
        the full-batch aux loss is reconstructed exactly (mean of equal-size
        microbatch means == full mean).  Note expert capacity is per
        MICROBATCH under pp — identical outputs to `loss` whenever no tokens
        overflow capacity.

        No reference equivalent — the reference is DP-only (SURVEY.md §2.8);
        this is the framework's pipeline-parallel training path.
        """
        from latent_diffusion_speech_tpu.parallel.pipeline import (
            pipeline_apply,
            stack_stage_params,
        )

        cfg = self.cfg
        moe = cfg.moe_experts > 0
        S = dict(mesh.shape).get("pipe", 1)
        L = cfg.num_hidden_layers
        if L % max(S, 1) != 0:
            raise ValueError(f"loss_pp: {L} layers not divisible by pipe={S}")
        per = L // max(S, 1)
        blocks = [params[f"block_{i}"] for i in range(L)]
        # (S, per, ...): stage-major stacking of per-layer params
        stacked = stack_stage_params(
            [stack_stage_params(blocks[s * per : (s + 1) * per]) for s in range(S)]
        )
        stage_params = {
            "layers": stacked,
            "layer_idx": jnp.arange(L, dtype=jnp.int32).reshape(S, per),
        }

        B, T = input_ids.shape
        M = microbatches
        if B % M != 0:
            raise ValueError(f"loss_pp: batch {B} not divisible by microbatches {M}")
        x = nn.Embed(cfg.vocab_size, cfg.hidden_size).apply(
            {"params": params["embed_tokens"]}, input_ids
        )
        if attention_mask is not None:
            mask = attention_mask[:, None, None, :].astype(bool)
        else:
            mask = jnp.ones((B, 1, 1, T), bool)
        positions = jnp.arange(T)
        blk = LlamaBlock(cfg, dtype=self.module.dtype, mesh=self.module.mesh)

        def stage_fn(sp, act):
            h, m, stats = act

            def layer(carry, xs):
                h, stats = carry
                p, l_idx = xs
                if moe:
                    (out, _), muts = blk.apply(
                        {"params": p}, h, positions, mask=m, is_causal=True,
                        mutable=["moe_losses"],
                    )
                    layer_stats = muts["moe_losses"]["moe"]["stats"][0]  # (2, E)
                    stats = jax.lax.dynamic_update_index_in_dim(
                        stats, layer_stats, l_idx, 0
                    )
                else:
                    out, _ = blk.apply({"params": p}, h, positions, mask=m, is_causal=True)
                return (out, stats), None

            (h, stats), _ = jax.lax.scan(
                layer, (h, stats), (sp["layers"], sp["layer_idx"])
            )
            return h, m, stats

        E = max(cfg.moe_experts, 1)
        act = (
            x.reshape(M, B // M, T, x.shape[-1]),
            mask.reshape(M, B // M, 1, 1, T),
            jnp.zeros((M, L, 2, E), jnp.float32),  # per-layer routing stats
        )
        h, _, stats = pipeline_apply(
            mesh, stage_fn, stage_params, act, batch_axis=batch_axis, remat=remat
        )
        h = h.reshape(B, T, h.shape[-1])
        h = RMSNorm(cfg.rms_norm_eps).apply({"params": params["final_ln"]}, h)
        logits = nn.Dense(cfg.vocab_size, use_bias=False, dtype=self.module.dtype).apply(
            {"params": params["lm_head"]}, h
        )
        ce = self._ce(logits, labels)
        if not moe:
            return ce
        # exact full-batch Switch aux from microbatch means: f_e, p_e average
        # linearly over equal-size microbatches
        f_e = jnp.mean(stats[:, :, 0], axis=0)  # (L, E)
        p_e = jnp.mean(stats[:, :, 1], axis=0)
        aux = jnp.mean(E * jnp.sum(f_e * p_e, axis=-1))
        return ce + cfg.moe_aux_weight * aux

    @partial(jax.jit, static_argnames=("self", "sampling", "prompt_len"))
    def _generate(self, params, prompt, prompt_len: int, sampling: SamplingConfig, rng):
        B = prompt.shape[0]
        max_len = prompt_len + sampling.max_new_tokens + 1
        caches = self.module.apply({"params": params}, B, max_len, method=self.module.init_cache)

        def step_fn(carry, token, pos):
            caches = carry
            logits, caches = self.module.apply(
                {"params": params}, token, pos, caches, method=self.module.decode_step
            )
            return caches, logits

        # prefill: feed prompt tokens one by one through the cache (scan)
        def prefill_step(caches, tok_pos):
            tok, pos = tok_pos
            caches, logits = step_fn(caches, tok, pos)
            return caches, logits

        caches, _ = jax.lax.scan(
            prefill_step, caches, (prompt.T, jnp.arange(prompt_len))
        )

        def gen_step(carry, token, idx):
            return step_fn(carry, token, idx + prompt_len)

        first = jnp.full((B,), self.cfg.bos_token_id, jnp.int32)
        tokens, lengths = ar_generate(
            gen_step, caches, first, self.cfg.vocab_size, sampling, rng
        )
        return tokens, lengths

    def generate(
        self,
        phone,
        tones=None,
        max_length: int = 1024,
        do_sample: bool = True,
        temperature: float = 1.0,
        top_k: int = 5,
        top_p: float = 1.0,
        repetition_penalty: float = 1.0,
        end_gate_threshold: Optional[float] = None,
        rng: Optional[jax.Array] = None,
        spk_id=None,
        impl=None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (semantic tokens un-shifted (B, max_new), lengths).

        `tones`, `spk_id` and `impl` are accepted for interface parity with
        RoformerSystem.generate (so TTSPipeline can serve either LM) and
        ignored: the reference Llama conditions on the phone stream only
        (llama.py:91-101 builds input_ids from phones + semantic alone), and
        the whole-decode Pallas kernel is a RoFormer-only path (TODO.md
        records the won't-fix rationale: Llama's weights exceed VMEM)."""
        cfg = self.cfg
        B = phone.shape[0]
        col = lambda v: jnp.full((B, 1), v, phone.dtype)
        prompt = jnp.concatenate([col(cfg.phone_bos), phone, col(cfg.phone_eos), col(cfg.bos_token_id)], axis=1)
        # ar_generate refeeds BOS as `first`, so prefill only the part before it
        prefill_ids = prompt[:, :-1]
        sampling = SamplingConfig(
            max_new_tokens=max_length,
            do_sample=do_sample,
            temperature=temperature,
            top_k=top_k,
            top_p=top_p,
            repetition_penalty=repetition_penalty,
            end_gate_threshold=end_gate_threshold,
            eos_token_id=cfg.eos_token_id,
            pad_token_id=cfg.pad_token_id,
            bos_token_id=cfg.bos_token_id,
            ban_until=cfg.token_shift,  # bad_words: ban all text tokens
        )
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        tokens, lengths = self._generate(
            self.params, prefill_ids, prefill_ids.shape[1], sampling, rng
        )
        return tokens - cfg.token_shift, lengths
