"""BERT / MegatronBert text encoders in flax (the 'text' LM mode features).

The reference extracts phone-level text features from pretrained BERTs —
Erlangshen-MegatronBert-1.3B for ZH (`/root/reference/text/chinese_bert.py`)
and bert-base-multilingual-cased (`multi_language_bert.py`) — taking
`hidden_states[-3]` and repeating rows per word2ph.  This module restates
both encoder variants natively:

* classic BERT (post-LN): embeddings LayerNorm; residual-then-LN around
  attention and FFN;
* MegatronBert (pre-LN): no embedding LayerNorm; LN before attention/FFN,
  residual outside, one final LN after the stack.

`hidden_states` ordering matches HF (`output_hidden_states=True`):
[embeddings, layer_1_out, ..., layer_{L-1}_out, final], so index -3 selects
the same tensor the reference reads.  Torch is used only at import time.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = ["BertConfig", "BertEncoderModel", "bert_params_from_torch"]


@dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 119547          # bert-base-multilingual-cased
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    pre_ln: bool = False              # True = MegatronBert layout

    @classmethod
    def from_hf(cls, hf_cfg) -> "BertConfig":
        return cls(
            vocab_size=hf_cfg.vocab_size,
            hidden_size=hf_cfg.hidden_size,
            num_hidden_layers=hf_cfg.num_hidden_layers,
            num_attention_heads=hf_cfg.num_attention_heads,
            intermediate_size=hf_cfg.intermediate_size,
            max_position_embeddings=hf_cfg.max_position_embeddings,
            type_vocab_size=hf_cfg.type_vocab_size,
            layer_norm_eps=hf_cfg.layer_norm_eps,
            pre_ln=hf_cfg.model_type == "megatron-bert",
        )


class _SelfAttention(nn.Module):
    cfg: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask_bias):
        c = self.cfg
        H, D = c.num_attention_heads, c.hidden_size // c.num_attention_heads
        B, T, _ = x.shape
        q = nn.Dense(c.hidden_size, dtype=self.dtype, name="query")(x).reshape(B, T, H, D)
        k = nn.Dense(c.hidden_size, dtype=self.dtype, name="key")(x).reshape(B, T, H, D)
        v = nn.Dense(c.hidden_size, dtype=self.dtype, name="value")(x).reshape(B, T, H, D)
        scores = jnp.einsum("blhd,brhd->bhlr", q, k) / jnp.sqrt(D).astype(x.dtype)
        if mask_bias is not None:
            scores = scores + mask_bias
        probs = nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhlr,brhd->blhd", probs, v).reshape(B, T, c.hidden_size)
        return nn.Dense(c.hidden_size, dtype=self.dtype, name="out")(out)


class _Layer(nn.Module):
    cfg: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask_bias):
        c = self.cfg
        eps = c.layer_norm_eps
        if c.pre_ln:
            h = nn.LayerNorm(epsilon=eps, name="attn_ln")(x)
            x = x + _SelfAttention(c, dtype=self.dtype, name="attn")(h, mask_bias)
            h = nn.LayerNorm(epsilon=eps, name="ffn_ln")(x)
            h = nn.Dense(c.intermediate_size, dtype=self.dtype, name="ffn_in")(h)
            h = nn.gelu(h, approximate=False)
            x = x + nn.Dense(c.hidden_size, dtype=self.dtype, name="ffn_out")(h)
        else:
            h = _SelfAttention(c, dtype=self.dtype, name="attn")(x, mask_bias)
            x = nn.LayerNorm(epsilon=eps, name="attn_ln")(x + h)
            h = nn.Dense(c.intermediate_size, dtype=self.dtype, name="ffn_in")(x)
            h = nn.gelu(h, approximate=False)
            x = nn.LayerNorm(epsilon=eps, name="ffn_ln")(x + nn.Dense(c.hidden_size, dtype=self.dtype, name="ffn_out")(h))
        return x


class BertEncoderModel(nn.Module):
    cfg: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, token_type_ids=None, attention_mask=None) -> List[jnp.ndarray]:
        """Returns the HF-ordered hidden_states tuple (len = layers + 1)."""
        c = self.cfg
        B, T = input_ids.shape
        x = nn.Embed(c.vocab_size, c.hidden_size, name="word_embeddings")(input_ids)
        x = x + nn.Embed(c.max_position_embeddings, c.hidden_size, name="position_embeddings")(
            jnp.arange(T)[None]
        )
        types = token_type_ids if token_type_ids is not None else jnp.zeros_like(input_ids)
        x = x + nn.Embed(c.type_vocab_size, c.hidden_size, name="token_type_embeddings")(types)
        if not c.pre_ln:
            x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="emb_ln")(x)
        mask_bias = None
        if attention_mask is not None:
            mask_bias = (1.0 - attention_mask[:, None, None, :].astype(x.dtype)) * -1e9
        hidden = [x]
        for i in range(c.num_hidden_layers):
            x = _Layer(c, dtype=self.dtype, name=f"layer_{i}")(x, mask_bias)
            hidden.append(x)
        if c.pre_ln:
            # MegatronBert: final LN replaces the last raw layer output in the
            # HF hidden_states tuple
            hidden[-1] = nn.LayerNorm(epsilon=c.layer_norm_eps, name="final_ln")(x)
        return hidden


# ---------------------------------------------------------------------------
# HF import (BertModel or MegatronBertModel state dicts)
# ---------------------------------------------------------------------------

def _np(v):
    return np.asarray(v.detach().cpu().float().numpy() if hasattr(v, "detach") else v)


def bert_params_from_torch(state: Dict, cfg: BertConfig) -> Dict:
    state = {k.removeprefix("bert."): v for k, v in state.items()}

    def dense(name):
        return {"kernel": _np(state[f"{name}.weight"]).T, "bias": _np(state[f"{name}.bias"])}

    def ln(name):
        return {"scale": _np(state[f"{name}.weight"]), "bias": _np(state[f"{name}.bias"])}

    def emb(name):
        return {"embedding": _np(state[f"{name}.weight"])}

    params: Dict = {
        "word_embeddings": emb("embeddings.word_embeddings"),
        "position_embeddings": emb("embeddings.position_embeddings"),
        "token_type_embeddings": emb("embeddings.token_type_embeddings"),
    }
    if cfg.pre_ln:
        params["final_ln"] = ln("encoder.ln")
    else:
        params["emb_ln"] = ln("embeddings.LayerNorm")
    for i in range(cfg.num_hidden_layers):
        b = f"encoder.layer.{i}"
        layer = {
            "attn": {
                "query": dense(f"{b}.attention.self.query"),
                "key": dense(f"{b}.attention.self.key"),
                "value": dense(f"{b}.attention.self.value"),
                "out": dense(f"{b}.attention.output.dense"),
            },
            "ffn_in": dense(f"{b}.intermediate.dense"),
            "ffn_out": dense(f"{b}.output.dense"),
        }
        if cfg.pre_ln:
            layer["attn_ln"] = ln(f"{b}.attention.ln")
            layer["ffn_ln"] = ln(f"{b}.ln")
        else:
            layer["attn_ln"] = ln(f"{b}.attention.output.LayerNorm")
            layer["ffn_ln"] = ln(f"{b}.output.LayerNorm")
        params[f"layer_{i}"] = layer
    return params
