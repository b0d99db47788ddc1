"""wav2vec 2.0 large (XLSR-53) encoder in flax — TPU-native XLSR unit slot.

Capability parity with the reference's fairseq delegation
(`/root/reference/tools/tools.py:144-163`, `xlsr_53_56k.pt` ensemble load +
`extract_features()["x"]`): raw 16 kHz audio -> 7-conv feature extractor
(layer-norm variant) -> feature projection -> grouped conv positional
embedding -> 24 pre-norm transformer layers -> final LayerNorm, all as XLA
programs.  Architecture restated from the published wav2vec 2.0 "large"
geometry (as in HF `Wav2Vec2Model` with `do_stable_layer_norm=True`,
`feat_extract_norm='layer'`), which is the converted form of the fairseq
XLSR-53 checkpoint; torch is touched only at weight-import time.

Importer accepts both HF `Wav2Vec2Model` state dicts and raw fairseq
wav2vec2 checkpoints (key translation below).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from latent_diffusion_speech_tpu.ops.attention import dot_product_attention

__all__ = [
    "Wav2Vec2Config",
    "Wav2Vec2Encoder",
    "wav2vec2_params_from_hf",
    "wav2vec2_params_from_fairseq",
]


@dataclass(frozen=True)
class Wav2Vec2Config:
    hidden_size: int = 1024
    num_hidden_layers: int = 24
    intermediate_size: int = 4096
    num_attention_heads: int = 16
    conv_dim: Tuple[int, ...] = (512,) * 7
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_bias: bool = True
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    layer_norm_eps: float = 1e-5
    do_normalize: bool = True  # fairseq `normalize=True` for XLSR

    @classmethod
    def from_hf(cls, hf_cfg) -> "Wav2Vec2Config":
        return cls(
            hidden_size=hf_cfg.hidden_size,
            num_hidden_layers=hf_cfg.num_hidden_layers,
            intermediate_size=hf_cfg.intermediate_size,
            num_attention_heads=hf_cfg.num_attention_heads,
            conv_dim=tuple(hf_cfg.conv_dim),
            conv_kernel=tuple(hf_cfg.conv_kernel),
            conv_stride=tuple(hf_cfg.conv_stride),
            conv_bias=hf_cfg.conv_bias,
            num_conv_pos_embeddings=hf_cfg.num_conv_pos_embeddings,
            num_conv_pos_embedding_groups=hf_cfg.num_conv_pos_embedding_groups,
            layer_norm_eps=hf_cfg.layer_norm_eps,
            do_normalize=getattr(hf_cfg, "do_normalize", True),
        )


class _LayerNormConvFE(nn.Module):
    """feat_extract_norm='layer': each conv is followed by a channels-last
    LayerNorm + GELU (the large-model variant; the group-norm variant lives
    in models/hubert.py)."""

    cfg: Wav2Vec2Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = x[..., None]
        for i, (c, k, s) in enumerate(
            zip(self.cfg.conv_dim, self.cfg.conv_kernel, self.cfg.conv_stride)
        ):
            h = nn.Conv(c, (k,), strides=(s,), padding="VALID",
                        use_bias=self.cfg.conv_bias, dtype=self.dtype, name=f"conv{i}")(h)
            h = nn.LayerNorm(epsilon=1e-5, name=f"conv_ln{i}")(h)
            h = nn.gelu(h, approximate=False)
        return h


class _PosConvEmbedding(nn.Module):
    cfg: Wav2Vec2Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.cfg.num_conv_pos_embeddings
        h = nn.Conv(self.cfg.hidden_size, (k,), padding=[(k // 2, k // 2)],
                    feature_group_count=self.cfg.num_conv_pos_embedding_groups,
                    dtype=self.dtype, name="conv")(x)
        if k % 2 == 0:
            h = h[:, :-1]
        return nn.gelu(h, approximate=False)


class _StableLNLayer(nn.Module):
    """Pre-norm transformer layer (do_stable_layer_norm=True)."""

    cfg: Wav2Vec2Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        H, D = c.num_attention_heads, c.hidden_size // c.num_attention_heads
        B, T, _ = x.shape
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="layer_norm")(x)
        q = nn.Dense(c.hidden_size, dtype=self.dtype, name="q_proj")(h).reshape(B, T, H, D)
        k = nn.Dense(c.hidden_size, dtype=self.dtype, name="k_proj")(h).reshape(B, T, H, D)
        v = nn.Dense(c.hidden_size, dtype=self.dtype, name="v_proj")(h).reshape(B, T, H, D)
        attn = dot_product_attention(q, k, v).reshape(B, T, c.hidden_size)
        x = x + nn.Dense(c.hidden_size, dtype=self.dtype, name="out_proj")(attn)
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="final_layer_norm")(x)
        h = nn.Dense(c.intermediate_size, dtype=self.dtype, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        return x + nn.Dense(c.hidden_size, dtype=self.dtype, name="fc2")(h)


class Wav2Vec2Encoder(nn.Module):
    cfg: Wav2Vec2Config = field(default_factory=Wav2Vec2Config)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, wav: jnp.ndarray) -> jnp.ndarray:
        """Raw audio (B, T) 16 kHz -> hidden states (B, ~T // 320, hidden).

        Matches fairseq `extract_features()["x"]` / HF last_hidden_state."""
        c = self.cfg
        if c.do_normalize:
            # HF Wav2Vec2FeatureExtractor zero_mean_unit_var (fairseq's
            # F.layer_norm(wav, shape) up to eps)
            mean = jnp.mean(wav, axis=-1, keepdims=True)
            var = jnp.var(wav, axis=-1, keepdims=True)
            wav = (wav - mean) / jnp.sqrt(var + 1e-7)
        x = _LayerNormConvFE(c, dtype=self.dtype, name="feature_extractor")(wav)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="fp_layer_norm")(x)
        x = nn.Dense(c.hidden_size, dtype=self.dtype, name="fp_projection")(x)
        x = x + _PosConvEmbedding(c, dtype=self.dtype, name="pos_conv_embed")(x)
        for i in range(c.num_hidden_layers):
            x = _StableLNLayer(c, dtype=self.dtype, name=f"layer_{i}")(x)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, name="encoder_layer_norm")(x)


# ---------------------------------------------------------------------------
# weight import
# ---------------------------------------------------------------------------

def _np(v):
    return np.asarray(v.detach().cpu().float().numpy() if hasattr(v, "detach") else v, np.float32)


def _fold_weight_norm_dim2(g, v):
    """torch weight_norm(dim=2) on a (out, in, k) conv: norm over (out, in)."""
    norm = np.sqrt(np.sum(v**2, axis=(0, 1), keepdims=True))
    return g * v / np.maximum(norm, 1e-12)


def wav2vec2_params_from_hf(state: Dict, cfg: Wav2Vec2Config) -> Dict:
    """Map a HF `Wav2Vec2Model` state dict (do_stable_layer_norm variant)."""
    state = {k: _np(v) for k, v in state.items()}

    def dense(name, bias=True):
        p = {"kernel": state[f"{name}.weight"].T}
        if bias and f"{name}.bias" in state:
            p["bias"] = state[f"{name}.bias"]
        return p

    def ln(name):
        return {"scale": state[f"{name}.weight"], "bias": state[f"{name}.bias"]}

    fe: Dict = {}
    for i in range(len(cfg.conv_dim)):
        b = f"feature_extractor.conv_layers.{i}"
        conv = {"kernel": np.transpose(state[f"{b}.conv.weight"], (2, 1, 0))}
        if f"{b}.conv.bias" in state:
            conv["bias"] = state[f"{b}.conv.bias"]
        fe[f"conv{i}"] = conv
        fe[f"conv_ln{i}"] = ln(f"{b}.layer_norm")

    pc = "encoder.pos_conv_embed.conv"
    if f"{pc}.parametrizations.weight.original0" in state:
        g, v = state[f"{pc}.parametrizations.weight.original0"], state[f"{pc}.parametrizations.weight.original1"]
    else:
        g, v = state[f"{pc}.weight_g"], state[f"{pc}.weight_v"]
    w = _fold_weight_norm_dim2(g, v)

    params: Dict = {
        "feature_extractor": fe,
        "fp_layer_norm": ln("feature_projection.layer_norm"),
        "fp_projection": dense("feature_projection.projection"),
        "pos_conv_embed": {"conv": {"kernel": np.transpose(w, (2, 1, 0)),
                                    "bias": state[f"{pc}.bias"]}},
        "encoder_layer_norm": ln("encoder.layer_norm"),
    }
    for i in range(cfg.num_hidden_layers):
        b = f"encoder.layers.{i}"
        params[f"layer_{i}"] = {
            "layer_norm": ln(f"{b}.layer_norm"),
            "q_proj": dense(f"{b}.attention.q_proj"),
            "k_proj": dense(f"{b}.attention.k_proj"),
            "v_proj": dense(f"{b}.attention.v_proj"),
            "out_proj": dense(f"{b}.attention.out_proj"),
            "final_layer_norm": ln(f"{b}.final_layer_norm"),
            "fc1": dense(f"{b}.feed_forward.intermediate_dense"),
            "fc2": dense(f"{b}.feed_forward.output_dense"),
        }
    return params


_FAIRSEQ_TO_HF = [
    # (fairseq prefix/pattern, HF replacement)
    ("post_extract_proj", "feature_projection.projection"),
    ("layer_norm.", "feature_projection.layer_norm."),  # top-level feature LN
    ("encoder.pos_conv.0", "encoder.pos_conv_embed.conv"),
    ("self_attn.", "attention."),
    ("self_attn_layer_norm", "layer_norm"),
    ("fc1", "feed_forward.intermediate_dense"),
    ("fc2", "feed_forward.output_dense"),
]


def wav2vec2_params_from_fairseq(state: Dict, cfg: Wav2Vec2Config) -> Dict:
    """Translate a fairseq wav2vec2 checkpoint ('model' state dict from
    `xlsr_53_56k.pt`) into HF naming, then reuse the HF mapping.

    fairseq layout: `feature_extractor.conv_layers.{i}.0` (conv) and
    `.2.1` (the LayerNorm inside [conv, dropout, Sequential(Transpose, LN,
    Transpose)]); quantizer/project_q/final_proj heads are dropped."""
    out: Dict = {}
    for key, val in state.items():
        if key.startswith(("quantizer", "project_q", "final_proj", "mask_emb",
                           "label_embs", "w2v_encoder.proj")):
            continue
        k = key
        if k.startswith("feature_extractor.conv_layers."):
            parts = k.split(".")
            i, rest = parts[2], ".".join(parts[3:])
            if rest.startswith("0."):
                k = f"feature_extractor.conv_layers.{i}.conv.{rest[2:]}"
            elif rest.startswith("2.1."):
                k = f"feature_extractor.conv_layers.{i}.layer_norm.{rest[4:]}"
            else:
                continue
        elif k.startswith("encoder.layers."):
            for pat, rep in _FAIRSEQ_TO_HF[3:]:
                k = k.replace(pat, rep)
        elif k.startswith("encoder.layer_norm."):
            pass  # final encoder LN: same name in HF
        elif k.startswith("encoder.pos_conv.0"):
            k = k.replace("encoder.pos_conv.0", "encoder.pos_conv_embed.conv")
        elif k.startswith("post_extract_proj"):
            k = k.replace("post_extract_proj", "feature_projection.projection")
        elif k.startswith("layer_norm."):
            k = k.replace("layer_norm.", "feature_projection.layer_norm.")
        out[k] = val
    return wav2vec2_params_from_hf(out, cfg)
