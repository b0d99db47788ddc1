"""HuBERT (bshall variant) unit encoder in flax.

Inventory parity with the reference alternative unit encoder
(`encoder/hubert/model.py:19-228`): 7-conv feature extractor (GroupNorm on the
first conv), LayerNorm+512->768 projection, grouped conv positional embedding
(k=128, 16 groups, one-sample trim), 12-layer post-LN transformer
(torch.nn.TransformerEncoderLayer semantics: 12 heads, 3072 FF, GELU), 768->256
unit projection; `HubertSoft.units` pads the waveform by (400-320)//2 on both
sides.  SpecAugment-style span masking for training included.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from latent_diffusion_speech_tpu.ops.attention import dot_product_attention

__all__ = ["Hubert", "HubertSoft", "compute_span_mask"]


class FeatureExtractor(nn.Module):
    """Raw audio (B, T) -> (B, T // 320, 512). VALID convs (torch default pad 0)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = x[..., None]
        specs = [(10, 5), (3, 2), (3, 2), (3, 2), (3, 2), (2, 2), (2, 2)]
        for i, (k, s) in enumerate(specs):
            h = nn.Conv(512, (k,), strides=(s,), padding="VALID", use_bias=False,
                        dtype=self.dtype, name=f"conv{i}")(h)
            if i == 0:
                h = nn.GroupNorm(num_groups=512, epsilon=1e-5, name="norm0")(h)
            h = nn.gelu(h, approximate=False)
        return h


class PositionalConvEmbedding(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # torch Conv1d(768, 768, 128, padding=64, groups=16), trim last sample
        h = nn.Conv(768, (128,), padding=[(64, 64)], feature_group_count=16,
                    dtype=self.dtype, name="conv")(x)
        return nn.gelu(h[:, :-1], approximate=False)


class EncoderLayer(nn.Module):
    """torch.nn.TransformerEncoderLayer semantics (post-LN, norm_first=False)."""

    n_heads: int = 12
    d_model: int = 768
    d_ff: int = 3072
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, T, C = x.shape
        d = self.d_model // self.n_heads
        q = nn.Dense(C, dtype=self.dtype, name="q")(x).reshape(B, T, self.n_heads, d)
        k = nn.Dense(C, dtype=self.dtype, name="k")(x).reshape(B, T, self.n_heads, d)
        v = nn.Dense(C, dtype=self.dtype, name="v")(x).reshape(B, T, self.n_heads, d)
        attn = dot_product_attention(q, k, v).reshape(B, T, C)
        attn = nn.Dense(C, dtype=self.dtype, name="out")(attn)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x + attn).astype(self.dtype)
        h = nn.Dense(self.d_ff, dtype=self.dtype, name="ff1")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(C, dtype=self.dtype, name="ff2")(h)
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(x + h).astype(self.dtype)


def compute_span_mask(
    rng: jax.Array, shape: Tuple[int, int], mask_prob: float = 0.8,
    mask_length: int = 10, min_masks: int = 2,
) -> jnp.ndarray:
    """SpecAugment span mask (ref `_compute_mask`, model.py:176-228):
    per row, ~prob*T/len spans of `mask_length` frames."""
    B, T = shape
    num_spans = max(int(mask_prob * T / mask_length), min_masks)
    starts = jax.random.randint(rng, (B, num_spans), 0, max(T - mask_length, 1))
    offs = jnp.arange(mask_length)
    idx = (starts[..., None] + offs).reshape(B, -1)
    mask = jnp.zeros((B, T), bool)
    return mask.at[jnp.arange(B)[:, None], idx].set(True)


class Hubert(nn.Module):
    num_label_embeddings: int = 100
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.feature_extractor = FeatureExtractor(dtype=self.dtype)
        self.feature_norm = nn.LayerNorm(epsilon=1e-5, name="fp_norm")
        self.feature_projection = nn.Dense(768, dtype=self.dtype, name="fp_proj")
        self.positional_embedding = PositionalConvEmbedding(dtype=self.dtype)
        self.norm = nn.LayerNorm(epsilon=1e-5)
        self.layers = [EncoderLayer(dtype=self.dtype, name=f"layer_{i}") for i in range(12)]
        self.proj = nn.Dense(256, dtype=self.dtype, name="proj")
        self.masked_spec_embed = self.param(
            "masked_spec_embed", nn.initializers.uniform(1.0), (768,)
        )
        self.label_embedding = nn.Embed(self.num_label_embeddings, 256, name="label_embedding")

    def encode(
        self, wav: jnp.ndarray, layer: Optional[int] = None, span_mask: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        x = self.feature_extractor(wav)
        x = self.feature_projection(self.feature_norm(x))
        if span_mask is not None:
            x = jnp.where(span_mask[..., None], self.masked_spec_embed.astype(x.dtype), x)
        x = x + self.positional_embedding(x)
        x = self.norm(x)
        for l in self.layers[: (layer if layer is not None else 12)]:
            x = l(x)
        return x

    def logits(self, units: jnp.ndarray) -> jnp.ndarray:
        """Cosine similarity to label embeddings / 0.1 (ref model.py:57-63)."""
        u = units / jnp.maximum(jnp.linalg.norm(units, axis=-1, keepdims=True), 1e-12)
        e = self.label_embedding.embedding
        e = e / jnp.maximum(jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-12)
        return (u @ e.T.astype(u.dtype)) / 0.1

    def __call__(self, wav: jnp.ndarray, span_mask: Optional[jnp.ndarray] = None):
        x = self.encode(wav, span_mask=span_mask)
        units = self.proj(x)
        return self.logits(units), units


class HubertSoft(Hubert):
    def units(self, wav: jnp.ndarray) -> jnp.ndarray:
        """(B, T) 16 kHz -> (B, T // 320, 256) soft units (ref model.py:72-80)."""
        pad = (400 - 320) // 2
        wav = jnp.pad(wav, ((0, 0), (pad, pad)))
        return self.proj(self.encode(wav))


# ---------------------------------------------------------------------------
# torch checkpoint import (bshall hubert-soft/discrete releases,
# ref model.py:12-16 URLS; TransformerEncoderLayer packs qkv in in_proj)
# ---------------------------------------------------------------------------

def hubert_params_from_torch(state) -> dict:
    """Map a bshall Hubert state dict onto the flax `Hubert`/`HubertSoft` tree."""
    import numpy as np

    def _np(v):
        return np.asarray(v.detach().cpu().float().numpy() if hasattr(v, "detach") else v, np.float32)

    state = {k: _np(v) for k, v in state.items()}

    def dense(name, bias=True):
        p = {"kernel": state[f"{name}.weight"].T}
        if bias and f"{name}.bias" in state:
            p["bias"] = state[f"{name}.bias"]
        return p

    def ln(name):
        return {"scale": state[f"{name}.weight"], "bias": state[f"{name}.bias"]}

    params: dict = {
        "fp_norm": ln("feature_projection.norm"),
        "fp_proj": dense("feature_projection.projection"),
        "norm": ln("norm"),
        "proj": dense("proj"),
        "masked_spec_embed": state["masked_spec_embed"],
        "label_embedding": {"embedding": state["label_embedding.weight"]},
    }

    fe = {}
    for i in range(7):
        w = state[f"feature_extractor.conv{i}.weight"]  # (out, in, k)
        fe[f"conv{i}"] = {"kernel": np.transpose(w, (2, 1, 0))}
    fe["norm0"] = ln("feature_extractor.norm0")
    params["feature_extractor"] = fe

    # positional conv: weight-normed (parametrizations or weight_g/weight_v)
    pe_prefix = "positional_embedding.conv"
    if f"{pe_prefix}.parametrizations.weight.original0" in state:
        g = state[f"{pe_prefix}.parametrizations.weight.original0"]
        v = state[f"{pe_prefix}.parametrizations.weight.original1"]
    else:
        g = state[f"{pe_prefix}.weight_g"]
        v = state[f"{pe_prefix}.weight_v"]
    # torch weight_norm(dim=2) keeps the kernel axis: g is (1, 1, k) and the
    # norm runs over (out, in) per kernel position
    norm = np.sqrt(np.sum(v**2, axis=(0, 1), keepdims=True))
    w = g * v / np.maximum(norm, 1e-12)  # (out, in_per_group, k)
    params["positional_embedding"] = {
        "conv": {"kernel": np.transpose(w, (2, 1, 0)), "bias": state[f"{pe_prefix}.bias"]}
    }

    for i in range(12):
        b = f"encoder.layers.{i}"
        in_w = state[f"{b}.self_attn.in_proj_weight"]  # (3C, C) packed qkv
        in_b = state[f"{b}.self_attn.in_proj_bias"]
        C = in_w.shape[1]
        params[f"layer_{i}"] = {
            "q": {"kernel": in_w[:C].T, "bias": in_b[:C]},
            "k": {"kernel": in_w[C : 2 * C].T, "bias": in_b[C : 2 * C]},
            "v": {"kernel": in_w[2 * C :].T, "bias": in_b[2 * C :]},
            "out": dense(f"{b}.self_attn.out_proj"),
            "norm1": ln(f"{b}.norm1"),
            "norm2": ln(f"{b}.norm2"),
            "ff1": dense(f"{b}.linear1"),
            "ff2": dense(f"{b}.linear2"),
        }
    return params
