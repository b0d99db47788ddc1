"""RoFormer encoder-decoder text->semantic LM in flax.

Architecture parity with HF RoFormer as the reference uses it
(`text2semantic/roformer/roformer.py:59-255`):
* post-LN BERT layers; rotary position embeddings (interleaved-pair
  convention) applied to q,k in *self*-attention only; cross-attention plain.
* embeddings = word + token_type(LN(eps=1e-12)); tones ride the token_type
  channel; per-token speaker embedding added to encoder input embeds
  (`roformer.py:118-121,153-157`).
* vocab: phone mode = len(symbols)+BOS/EOS/PAD; semantic = kmeans_num+3 with
  BOS=K, EOS=K+1, PAD=K+2 (`roformer.py:74-104`); decoder token embedding
  warm-started from k-means centroids when dims match (`roformer.py:111-116`).
* LM head: dense+act+LN transform, decoder projection tied to the semantic
  word embeddings + bias (HF RoFormerOnlyMLMHead).

Generation (`RoformerSystem.generate`) is a `lax.scan` with a preallocated
KV cache; cross-attention K/V computed once — replacing HF `generate`'s
Python loop (`roformer.py:235-242`).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from latent_diffusion_speech_tpu.models.lm.sampling import SamplingConfig, ar_generate
from latent_diffusion_speech_tpu.ops.attention import dot_product_attention
from latent_diffusion_speech_tpu.text.symbols import num_tones, symbols

__all__ = ["RoformerConfig", "Roformer", "RoformerSystem"]


@dataclass(frozen=True)
class StackConfig:
    hidden_size: int = 256
    num_attention_heads: int = 8
    num_hidden_layers: int = 4
    intermediate_size: int = 512
    layer_norm_eps: float = 1e-12
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    max_position_embeddings: int = 3072


@dataclass(frozen=True)
class RoformerConfig:
    encoder: StackConfig = field(default_factory=StackConfig)
    decoder: StackConfig = field(default_factory=lambda: StackConfig(num_hidden_layers=1))
    mode: str = "phone"
    semantic_kmeans_num: int = 4096
    n_spk: int = 323
    text_vocab_size: Optional[int] = None  # for mode="text": external tokenizer vocab

    @property
    def phone_vocab_size(self) -> int:
        if "phone" in self.mode:
            return len(symbols) + 3
        assert self.text_vocab_size is not None, "text mode needs text_vocab_size"
        return self.text_vocab_size

    @property
    def num_token_types(self) -> int:
        return (num_tones + 1) if "phone" in self.mode else 1

    @property
    def phone_bos(self) -> int:
        return len(symbols) if "phone" in self.mode else 101  # BERT [CLS]

    @property
    def phone_eos(self) -> int:
        return len(symbols) + 1 if "phone" in self.mode else 102  # BERT [SEP]

    @property
    def phone_pad(self) -> int:
        return len(symbols) + 2 if "phone" in self.mode else 0  # BERT [PAD]

    @property
    def semantic_vocab_size(self) -> int:
        return self.semantic_kmeans_num + 3

    @property
    def semantic_bos(self) -> int:
        return self.semantic_kmeans_num

    @property
    def semantic_eos(self) -> int:
        return self.semantic_kmeans_num + 1

    @property
    def semantic_pad(self) -> int:
        return self.semantic_kmeans_num + 2


def rotary_sin_cos(positions: jnp.ndarray, dim: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pairwise-repeated sin/cos for the RoFormer rotary convention.
    positions (...,) -> sin/cos (..., dim)."""
    inv_freq = 1.0 / (10000.0 ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    angles = positions.astype(jnp.float32)[..., None] * inv_freq  # (..., dim/2)
    sin = jnp.repeat(jnp.sin(angles), 2, axis=-1)
    cos = jnp.repeat(jnp.cos(angles), 2, axis=-1)
    return sin, cos


def apply_rotary_pairs(x: jnp.ndarray, sin: jnp.ndarray, cos: jnp.ndarray) -> jnp.ndarray:
    """x (B, T, H, D); sin/cos (T, D) or (B, T, D) pairwise-repeated."""
    if sin.ndim == 2:
        sin = sin[None, :, None, :]
        cos = cos[None, :, None, :]
    else:
        sin = sin[:, :, None, :]
        cos = cos[:, :, None, :]
    sin = sin.astype(x.dtype)
    cos = cos.astype(x.dtype)
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    rot = jnp.stack([-x2, x1], axis=-1).reshape(x.shape)
    return x * cos + rot * sin


class Attention(nn.Module):
    cfg: StackConfig
    use_rotary: bool = True
    dtype: jnp.dtype = jnp.float32

    def _heads(self, x):
        B, T, C = x.shape
        H = self.cfg.num_attention_heads
        return x.reshape(B, T, H, C // H)

    @nn.compact
    def __call__(
        self,
        x,
        kv_source=None,
        mask=None,
        is_causal=False,
        positions=None,
        cache=None,
        cache_index=None,
        kv_override=None,
        kv_only=False,
        deterministic=True,
        rotary_sincos=None,
    ):
        """Returns (out, new_cache). kv_source != None -> cross attention.

        cache: optional dict {'k','v'} (B, max_len, H, D) for incremental
        decoding: the current q/k/v at `cache_index` are written in, and
        attention runs over the valid prefix.
        kv_override: precomputed (k, v) heads (cross-attention K/V is
        loop-invariant during generation — computed once, reused every step).
        kv_only: just compute and return the (k, v) heads."""
        cfg = self.cfg
        C = cfg.hidden_size
        source = x if kv_source is None else kv_source
        if kv_only:
            k = self._heads(nn.Dense(C, dtype=self.dtype, name="key")(source))
            v = self._heads(nn.Dense(C, dtype=self.dtype, name="value")(source))
            return (k, v), None
        q = self._heads(nn.Dense(C, dtype=self.dtype, name="query")(x))
        if kv_override is not None:
            k, v = kv_override
        else:
            k = self._heads(nn.Dense(C, dtype=self.dtype, name="key")(source))
            v = self._heads(nn.Dense(C, dtype=self.dtype, name="value")(source))

        if self.use_rotary and kv_source is None and kv_override is None:
            if positions is None:
                positions = jnp.arange(x.shape[1])
            sin, cos = rotary_sin_cos(positions, C // cfg.num_attention_heads)
            q = apply_rotary_pairs(q, sin, cos)
            k = apply_rotary_pairs(k, sin, cos)

        new_cache = None
        if cache is not None:
            # write current k/v at cache_index; attend over [0, cache_index]
            k_cache = jax.lax.dynamic_update_slice(cache["k"], k, (0, cache_index, 0, 0))
            v_cache = jax.lax.dynamic_update_slice(cache["v"], v, (0, cache_index, 0, 0))
            new_cache = {"k": k_cache, "v": v_cache}
            k, v = k_cache, v_cache
            valid = jnp.arange(k.shape[1])[None, None, None, :] <= cache_index
            mask = valid if mask is None else (mask & valid)
            is_causal = False

        drop_rng = None
        if not deterministic and cfg.attention_probs_dropout_prob > 0:
            drop_rng = self.make_rng("dropout")
        out = dot_product_attention(
            q, k, v, mask=mask, is_causal=is_causal,
            dropout_rate=cfg.attention_probs_dropout_prob, dropout_rng=drop_rng,
        )
        out = out.reshape(x.shape[0], x.shape[1], C)
        return nn.Dense(C, dtype=self.dtype, name="out")(out), new_cache


class Layer(nn.Module):
    """Post-LN transformer layer (HF Bert/RoFormer style) with the reference's
    hidden-dropout placement (after the attention/FF output projections)."""

    cfg: StackConfig
    cross_attention: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x,
        enc_states=None,
        self_mask=None,
        cross_mask=None,
        is_causal=False,
        positions=None,
        cache=None,
        cache_index=None,
        deterministic=True,
        cross_kv=None,
        cross_kv_only=False,
        rotary_sincos=None,
    ):
        eps = self.cfg.layer_norm_eps
        if cross_kv_only:
            return Attention(self.cfg, use_rotary=False, dtype=self.dtype, name="cross_attn")(
                enc_states, kv_source=enc_states, kv_only=True
            )
        drop = nn.Dropout(self.cfg.hidden_dropout_prob, deterministic=deterministic)
        h, new_cache = Attention(self.cfg, dtype=self.dtype, name="self_attn")(
            x, mask=self_mask, is_causal=is_causal, positions=positions,
            cache=cache, cache_index=cache_index, deterministic=deterministic,
            rotary_sincos=rotary_sincos,
        )
        x = nn.LayerNorm(epsilon=eps, name="self_ln")(x + drop(h)).astype(self.dtype)

        if self.cross_attention and enc_states is not None:
            h, _ = Attention(self.cfg, use_rotary=False, dtype=self.dtype, name="cross_attn")(
                x, kv_source=enc_states, mask=cross_mask, kv_override=cross_kv,
                deterministic=deterministic,
            )
            x = nn.LayerNorm(epsilon=eps, name="cross_ln")(x + drop(h)).astype(self.dtype)

        h = nn.Dense(self.cfg.intermediate_size, dtype=self.dtype, name="ff_in")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.cfg.hidden_size, dtype=self.dtype, name="ff_out")(h)
        x = nn.LayerNorm(epsilon=eps, name="ff_ln")(x + drop(h)).astype(self.dtype)
        return x, new_cache


class Roformer(nn.Module):
    cfg: RoformerConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        ecfg, dcfg = cfg.encoder, cfg.decoder
        self.phone_embed = nn.Embed(cfg.phone_vocab_size, ecfg.hidden_size, name="phone_embed")
        self.tone_embed = nn.Embed(cfg.num_token_types, ecfg.hidden_size, name="tone_embed")
        self.enc_emb_ln = nn.LayerNorm(epsilon=ecfg.layer_norm_eps, name="enc_emb_ln")
        self.enc_dropout = nn.Dropout(ecfg.hidden_dropout_prob)
        self.encoder_layers = [
            Layer(ecfg, dtype=self.dtype, name=f"enc_{i}") for i in range(ecfg.num_hidden_layers)
        ]
        if cfg.n_spk and cfg.n_spk > 1:
            self.spk_embed = nn.Embed(cfg.n_spk + 1, ecfg.hidden_size, name="spk_embed")

        self.semantic_embed = nn.Embed(cfg.semantic_vocab_size, dcfg.hidden_size, name="semantic_embed")
        self.dec_type_embed = nn.Embed(1, dcfg.hidden_size, name="dec_type_embed")
        self.dec_emb_ln = nn.LayerNorm(epsilon=dcfg.layer_norm_eps, name="dec_emb_ln")
        self.dec_dropout = nn.Dropout(dcfg.hidden_dropout_prob)
        self.decoder_layers = [
            Layer(dcfg, cross_attention=True, dtype=self.dtype, name=f"dec_{i}")
            for i in range(dcfg.num_hidden_layers)
        ]
        # LM head: transform + tied decoder projection + bias
        self.head_transform = nn.Dense(dcfg.hidden_size, dtype=self.dtype, name="head_transform")
        self.head_ln = nn.LayerNorm(epsilon=dcfg.layer_norm_eps, name="head_ln")
        self.head_bias = self.param("head_bias", nn.initializers.zeros, (cfg.semantic_vocab_size,))

    # -- encoder -------------------------------------------------------------

    def encode(self, phone, tone, spk_id=None, attention_mask=None, deterministic=True):
        """phone/tone (B, L) -> encoder states (B, L, C)."""
        x = self.phone_embed(phone) + self.tone_embed(tone)
        x = self.enc_emb_ln(x).astype(self.dtype)
        if self.cfg.n_spk and self.cfg.n_spk > 1 and spk_id is not None:
            x = x + self.spk_embed(spk_id)
        x = self.enc_dropout(x, deterministic=deterministic)
        mask = None
        if attention_mask is not None:
            mask = attention_mask[:, None, None, :].astype(bool)
        for layer in self.encoder_layers:
            x, _ = layer(x, self_mask=mask, deterministic=deterministic)
        return x

    # -- decoder (teacher-forced) -------------------------------------------

    def _lm_head(self, x):
        h = self.head_transform(x)
        h = nn.gelu(h, approximate=False)
        h = self.head_ln(h).astype(self.dtype)
        logits = h @ self.semantic_embed.embedding.T.astype(h.dtype) + self.head_bias
        return logits

    def decode_train(self, semantic, enc_states, self_mask=None, cross_mask=None, deterministic=True):
        """semantic (B, S) ids -> logits (B, S, V). Causal."""
        x = self.semantic_embed(semantic) + self.dec_type_embed(jnp.zeros_like(semantic))
        x = self.dec_emb_ln(x).astype(self.dtype)
        x = self.dec_dropout(x, deterministic=deterministic)
        sm = self_mask[:, None, None, :].astype(bool) if self_mask is not None else None
        cm = cross_mask[:, None, None, :].astype(bool) if cross_mask is not None else None
        for layer in self.decoder_layers:
            x, _ = layer(x, enc_states=enc_states, self_mask=sm, cross_mask=cm, is_causal=True,
                         deterministic=deterministic)
        return self._lm_head(x)

    def __call__(self, phone, tone, semantic, spk_id=None, encoder_attention_mask=None,
                 attention_mask=None, deterministic=True):
        enc = self.encode(phone, tone, spk_id, encoder_attention_mask, deterministic=deterministic)
        return self.decode_train(semantic, enc, self_mask=attention_mask,
                                 cross_mask=encoder_attention_mask, deterministic=deterministic)

    # -- decoder (incremental) ----------------------------------------------

    def compute_cross_kv(self, enc_states):
        """Per-decoder-layer cross-attention (k, v) heads — loop-invariant
        during generation, so computed once outside the decode scan."""
        return [
            layer(None, enc_states=enc_states, cross_kv_only=True)[0]
            for layer in self.decoder_layers
        ]

    def decode_step(self, token, pos, caches, enc_states, cross_mask=None, cross_kvs=None,
                    rotary_tables=None):
        """One decode step. token (B,), pos scalar, caches: list per layer.
        rotary_tables: optional precomputed (max_len, D) sin/cos — turns the
        per-step rotary transcendentals into one gather (the tables are
        loop-invariant and live outside the decode scan).
        Returns (logits (B, V), new_caches)."""
        x = self.semantic_embed(token[:, None]) + self.dec_type_embed(jnp.zeros_like(token[:, None]))
        x = self.dec_emb_ln(x).astype(self.dtype)
        cm = cross_mask[:, None, None, :].astype(bool) if cross_mask is not None else None
        positions = jnp.asarray([pos])
        rot = None
        if rotary_tables is not None:
            sin_t, cos_t = rotary_tables
            rot = (
                jax.lax.dynamic_slice_in_dim(sin_t, pos, 1, axis=0),
                jax.lax.dynamic_slice_in_dim(cos_t, pos, 1, axis=0),
            )
        if cross_kvs is None:
            cross_kvs = [None] * len(self.decoder_layers)
        new_caches = []
        for layer, cache, ckv in zip(self.decoder_layers, caches, cross_kvs):
            x, new_cache = layer(
                x, enc_states=enc_states, cross_mask=cm,
                positions=positions, cache=cache, cache_index=pos, cross_kv=ckv,
                rotary_sincos=rot,
            )
            new_caches.append(new_cache)
        return self._lm_head(x)[:, 0], new_caches

    def init_cache(self, batch: int, max_len: int):
        dcfg = self.cfg.decoder
        H = dcfg.num_attention_heads
        D = dcfg.hidden_size // H
        return [
            {
                "k": jnp.zeros((batch, max_len, H, D), self.dtype),
                "v": jnp.zeros((batch, max_len, H, D), self.dtype),
            }
            for _ in range(dcfg.num_hidden_layers)
        ]


class RoformerSystem:
    """Owns (module, params); exposes loss / generate with jit."""

    def __init__(self, cfg: RoformerConfig, params=None, dtype=jnp.float32, seed: int = 0,
                 codebook: Optional[np.ndarray] = None):
        self.cfg = cfg
        self.module = Roformer(cfg, dtype=dtype)
        if params is None:
            p = jnp.zeros((1, 4), jnp.int32)
            # jitted init: one compiled program instead of per-param dispatch
            params = jax.jit(lambda r, a: self.module.init(r, a, a, a, spk_id=a))(
                jax.random.PRNGKey(seed), p
            )["params"]
            if codebook is not None and codebook.shape[1] == cfg.decoder.hidden_size:
                # warm-start semantic embedding rows from k-means centroids
                emb = np.asarray(params["semantic_embed"]["embedding"])
                emb[: cfg.semantic_kmeans_num] = codebook
                params = dict(params)
                params["semantic_embed"] = {"embedding": jnp.asarray(emb)}
        self.params = params

    def encode_seq_parallel(self, phone, tone, spk_id=None, mesh=None):
        """Sequence-parallel text encode over the mesh 'seq' axis.

        Activations are sharded along the token dimension; the pure-transformer
        encoder's elementwise/matmul ops partition trivially, and self-attention
        runs as exact ring attention (k/v blocks rotating over ICI via
        `ppermute` — see ops/ring_attention.py).  The reference has no sequence
        parallelism (SURVEY.md §2.8); this substantiates the reserved 'seq'
        axis for contexts that outgrow one chip.  L must divide by the axis
        size; output is sharded the same way."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from latent_diffusion_speech_tpu.ops.attention import sequence_parallel

        spec = NamedSharding(mesh, P(None, "seq"))
        phone = jax.device_put(jnp.asarray(phone), spec)
        tone = jax.device_put(jnp.asarray(tone), spec)
        if spk_id is not None:
            spk_id = jax.device_put(jnp.asarray(spk_id), spec)

        # the ring context must be active while tracing: build a fresh jit
        # per mesh (cached on self) so the compiled program embeds the ring
        key = (id(mesh), spk_id is not None)
        cache = getattr(self, "_seq_par_cache", None)
        if cache is None or cache[0] != key:
            def fn(params, ph, tn, sp):
                with sequence_parallel(mesh):
                    return self.module.apply(
                        {"params": params}, ph, tn, sp, method=self.module.encode
                    )

            self._seq_par_cache = (key, jax.jit(fn))
        return self._seq_par_cache[1](self.params, phone, tone, spk_id)

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

    def loss(self, params, phone, tone, semantic_in, labels, spk_id=None,
             encoder_attention_mask=None, attention_mask=None, dropout_rng=None):
        """Causal CE with -100 ignore (HF convention: logits[:-1] vs labels[1:])."""
        rngs = {"dropout": dropout_rng} if dropout_rng is not None else None
        logits = self.module.apply(
            {"params": params}, phone, tone, semantic_in, spk_id,
            encoder_attention_mask, attention_mask,
            deterministic=dropout_rng is None,
            rngs=rngs,
        )
        return self._ce(logits, labels)

    def loss_pp(
        self,
        params,
        phone,
        tone,
        semantic_in,
        labels,
        mesh,
        spk_id=None,
        encoder_attention_mask=None,
        attention_mask=None,
        *,
        microbatches: int = 4,
        batch_axis: Optional[str] = None,
        remat: bool = False,
    ):
        """Pipeline-parallel enc-dec loss over the mesh 'pipe' axis.

        GPipe wants homogeneous, shape-preserving stages; an encoder-decoder
        is heterogeneous (decoder layers carry cross-attention and run on a
        different stream).  The TPU-native resolution: the activation pytree
        carries BOTH streams — (enc_hidden, dec_hidden, enc_mask, dec_mask) —
        and every pipeline slot holds one layer from the combined
        [enc_0..enc_{E-1}, dec_0..dec_{D-1}] list, padded to S*ceil((E+D)/S)
        with identity slots.  Encoder params are padded with zero
        cross-attention blocks so all slots share one leaf structure, and a
        per-slot `kind` (0=enc, 1=dec, 2=identity) selects the branch with
        `lax.switch` at runtime.  Decoder slots come after all encoder slots,
        so by the time a microbatch reaches them its enc_hidden stream IS the
        final encoder output — cross-attention reads it in place.

        Embeddings and the LM head are small and stay replicated, like the
        Llama `loss_pp`.  Deterministic (no dropout).  Numerically equal to
        `loss(dropout_rng=None)` — pinned in tests/test_pipeline.py.

        No reference equivalent: the reference is DP-only (SURVEY.md §2.8);
        this replaces its accelerate DDP scaling surface
        (`21_train_lm.py:19`) with a composable pipeline axis.
        """
        from latent_diffusion_speech_tpu.parallel.pipeline import (
            pipeline_apply,
            stack_stage_params,
        )

        cfg = self.cfg
        ecfg, dcfg = cfg.encoder, cfg.decoder
        if (ecfg.hidden_size, ecfg.intermediate_size) != (
            dcfg.hidden_size,
            dcfg.intermediate_size,
        ):
            raise ValueError(
                "loss_pp: encoder/decoder stacks must share hidden and "
                "intermediate sizes (pipeline slots need one param layout); "
                f"got enc ({ecfg.hidden_size}, {ecfg.intermediate_size}) vs "
                f"dec ({dcfg.hidden_size}, {dcfg.intermediate_size})"
            )
        S = dict(mesh.shape).get("pipe", 1)
        E, D = ecfg.num_hidden_layers, dcfg.num_hidden_layers
        per = -(-(E + D) // max(S, 1))  # ceil
        n_pad = S * per - (E + D)

        dec_template = params["dec_0"]
        zeros_dec = jax.tree_util.tree_map(jnp.zeros_like, dec_template)
        slots = []
        kinds = []
        for i in range(E):
            padded = dict(params[f"enc_{i}"])
            padded["cross_attn"] = zeros_dec["cross_attn"]
            padded["cross_ln"] = zeros_dec["cross_ln"]
            slots.append(padded)
            kinds.append(0)
        for i in range(D):
            slots.append(dict(params[f"dec_{i}"]))
            kinds.append(1)
        slots.extend([zeros_dec] * n_pad)
        kinds.extend([2] * n_pad)

        stage_params = {
            "layers": stack_stage_params(
                [stack_stage_params(slots[s * per : (s + 1) * per]) for s in range(S)]
            ),
            "kind": jnp.asarray(kinds, jnp.int32).reshape(S, per),
        }

        B, Le = phone.shape
        Sd = semantic_in.shape[1]
        C = ecfg.hidden_size
        M = microbatches
        if B % M != 0:
            raise ValueError(f"loss_pp: batch {B} not divisible by microbatches {M}")

        dtype = self.module.dtype
        # replicated embeddings (encode()/decode_train() semantics, no dropout)
        enc_x = nn.Embed(cfg.phone_vocab_size, C).apply(
            {"params": params["phone_embed"]}, phone
        ) + nn.Embed(cfg.num_token_types, C).apply({"params": params["tone_embed"]}, tone)
        enc_x = nn.LayerNorm(epsilon=ecfg.layer_norm_eps).apply(
            {"params": params["enc_emb_ln"]}, enc_x
        ).astype(dtype)
        if cfg.n_spk and cfg.n_spk > 1 and spk_id is not None:
            enc_x = enc_x + nn.Embed(cfg.n_spk + 1, C).apply(
                {"params": params["spk_embed"]}, spk_id
            )
        dec_x = nn.Embed(cfg.semantic_vocab_size, dcfg.hidden_size).apply(
            {"params": params["semantic_embed"]}, semantic_in
        ) + nn.Embed(1, dcfg.hidden_size).apply(
            {"params": params["dec_type_embed"]}, jnp.zeros_like(semantic_in)
        )
        dec_x = nn.LayerNorm(epsilon=dcfg.layer_norm_eps).apply(
            {"params": params["dec_emb_ln"]}, dec_x
        ).astype(dtype)

        em = (
            encoder_attention_mask.astype(bool)
            if encoder_attention_mask is not None
            else jnp.ones((B, Le), bool)
        )
        dm = (
            attention_mask.astype(bool)
            if attention_mask is not None
            else jnp.ones((B, Sd), bool)
        )

        enc_layer = Layer(ecfg, cross_attention=False, dtype=dtype)
        dec_layer = Layer(dcfg, cross_attention=True, dtype=dtype)

        def enc_branch(op):
            p, (eh, dh, em, dm) = op
            out, _ = enc_layer.apply(
                {"params": p}, eh, self_mask=em[:, None, None, :]
            )
            return (out, dh, em, dm)

        def dec_branch(op):
            p, (eh, dh, em, dm) = op
            out, _ = dec_layer.apply(
                {"params": p}, dh, enc_states=eh,
                self_mask=dm[:, None, None, :],
                cross_mask=em[:, None, None, :], is_causal=True,
            )
            return (eh, out, em, dm)

        def id_branch(op):
            return op[1]

        def stage_fn(sp, act):
            def one(act, xs):
                p, kind = xs
                return jax.lax.switch(kind, [enc_branch, dec_branch, id_branch], (p, act)), None

            act, _ = jax.lax.scan(one, act, (sp["layers"], sp["kind"]))
            return act

        act = (
            enc_x.reshape(M, B // M, Le, C),
            dec_x.reshape(M, B // M, Sd, C),
            em.reshape(M, B // M, Le),
            dm.reshape(M, B // M, Sd),
        )
        _, dec_h, _, _ = pipeline_apply(
            mesh, stage_fn, stage_params, act, batch_axis=batch_axis, remat=remat
        )
        dec_h = dec_h.reshape(B, Sd, dec_h.shape[-1])

        # replicated LM head (_lm_head semantics)
        h = nn.Dense(dcfg.hidden_size, dtype=dtype).apply(
            {"params": params["head_transform"]}, dec_h
        )
        h = nn.gelu(h, approximate=False)
        h = nn.LayerNorm(epsilon=dcfg.layer_norm_eps).apply(
            {"params": params["head_ln"]}, h
        ).astype(dtype)
        logits = h @ params["semantic_embed"]["embedding"].T.astype(h.dtype) + params["head_bias"]
        return self._ce(logits, labels)

    def _decode_fits_vmem(self, batch: int, max_new_tokens: int, enc_len: int) -> bool:
        """VMEM capacity gate for the whole-decode Pallas kernel, computed
        from actual byte accounting of every operand/scratch/output the
        kernel allocates (see `ops.pallas.ar_decode.decode_vmem_bytes`) vs
        the v5e scoped-VMEM budget — so a config change (wider decoder,
        longer generation) is rejected by arithmetic, not by a heuristic
        fitted to one geometry."""
        from latent_diffusion_speech_tpu.ops.pallas.ar_decode import (
            DECODE_VMEM_BUDGET_BYTES,
            decode_vmem_bytes,
        )

        total = decode_vmem_bytes(
            self.cfg, batch, max_new_tokens, enc_len, dtype=self.module.dtype
        )["total"]
        return total <= DECODE_VMEM_BUDGET_BYTES

    @partial(jax.jit, static_argnames=("self", "sampling", "impl"))
    def _generate(self, params, phone, tone, spk_id, enc_mask, sampling: SamplingConfig,
                  rng, impl: str = "xla"):
        if spk_id is not None and jnp.ndim(spk_id) == 0:
            # scalar speaker id: broadcast inside the compiled program (an
            # eager jnp.full on the caller side costs a device round-trip)
            spk_id = jnp.full(phone.shape, spk_id, jnp.int32)
        enc = self.module.apply(
            {"params": params}, phone, tone, spk_id, enc_mask, method=self.module.encode
        )
        B = phone.shape[0]
        cross_kvs = self.module.apply(
            {"params": params}, enc, method=self.module.compute_cross_kv
        )

        if impl == "pallas" and not self._decode_fits_vmem(
            B, sampling.max_new_tokens, phone.shape[1]
        ):
            # the kernel keeps per-stream KV caches in VMEM; past ~8 flagship
            # streams the scoped allocation exceeds the 16 MB core VMEM
            # (measured: B=16 x 430 tokens wants 27 MB) — large batches are
            # throughput-bound anyway, where the scan path batches well
            impl = "xla"
        if impl == "pallas" and sampling.do_sample and sampling.top_k <= 0 and sampling.top_p < 1.0:
            # the kernel's nucleus cutoff rides the top-k values; pure top-p
            # (top_k=0) would need a full-vocab sort in-kernel — use the scan
            impl = "xla"
        if impl == "pallas":
            # the whole decode loop as ONE Pallas kernel with VMEM-resident
            # weights/KV-cache (ops/pallas/ar_decode.py) — ~3x faster than
            # the scan on v5e (12 vs 40 us/token at the flagship geometry).
            # Greedy decoding matches the scan path; stochastic sampling uses
            # the TPU core PRNG (equal in distribution, different stream).
            from latent_diffusion_speech_tpu.ops.pallas.ar_decode import (
                roformer_decode_pallas,
            )

            if enc_mask is not None:
                # the kernel's cross mask is a prefix length (every producer
                # in this codebase builds prefix masks: pad-to-bucket right)
                cross_len = jnp.sum(enc_mask.astype(jnp.int32), axis=-1)
            else:
                cross_len = jnp.full((B,), phone.shape[1], jnp.int32)
            seed = jax.random.randint(rng, (), 0, jnp.iinfo(jnp.int32).max)
            return roformer_decode_pallas(
                params, self.cfg, sampling, cross_kvs, cross_len, seed,
                dtype=self.module.dtype,
            )

        max_len = sampling.max_new_tokens + 1
        caches = self.module.apply(
            {"params": params}, B, max_len, method=self.module.init_cache
        )
        head_dim = self.cfg.decoder.hidden_size // self.cfg.decoder.num_attention_heads
        rotary_tables = rotary_sin_cos(jnp.arange(max_len), head_dim)

        def step_fn(carry, token, pos):
            caches = carry
            logits, caches = self.module.apply(
                {"params": params}, token, pos, caches, enc, enc_mask, cross_kvs,
                rotary_tables,
                method=self.module.decode_step,
            )
            return caches, logits

        first = jnp.full((B,), self.cfg.semantic_bos, jnp.int32)
        return ar_generate(step_fn, caches, first, self.cfg.semantic_vocab_size, sampling, rng)

    def generate(
        self,
        phone,
        tone,
        spk_id=None,
        attention_mask=None,
        max_length: int = 1024,
        do_sample: bool = True,
        temperature: float = 1.0,
        top_k: int = 5,
        top_p: float = 0.8,
        repetition_penalty: float = 1.2,
        end_gate_threshold: Optional[float] = None,
        rng: Optional[jax.Array] = None,
        impl: str = "xla",
    ):
        """Reference-shaped generate (`roformer.py:179-244`). Returns
        (tokens (B, max_new), lengths (B,)) where tokens exclude BOS and
        include EOS; PAD after EOS.
        impl: "xla" (decode scan) or "pallas" (whole-decode single kernel)."""
        sampling = SamplingConfig(
            max_new_tokens=max_length,
            do_sample=do_sample,
            temperature=temperature,
            top_k=top_k,
            top_p=top_p,
            repetition_penalty=repetition_penalty,
            end_gate_threshold=end_gate_threshold,
            eos_token_id=self.cfg.semantic_eos,
            pad_token_id=self.cfg.semantic_pad,
            bos_token_id=self.cfg.semantic_bos,
        )
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        return self._generate(
            self.params, phone, tone, spk_id, attention_mask, sampling, rng, impl
        )
