"""w2v-BERT 2.0 conformer encoder in flax (TPU-native unit extractor).

Capability parity with the reference's HF-transformers delegation
(`/root/reference/tools/tools.py:128-142`, facebook/w2v-bert-2.0): the full
chain — Kaldi-style fbank frontend, stride-2 frame stacking, feature
projection, 24 conformer blocks with relative_key attention — runs as XLA
programs; the torch model is used only as a parity oracle in tests.

Architecture restated from the HF implementation
(transformers/models/wav2vec2_bert/modeling_wav2vec2_bert.py): each conformer
block is ffn1(half-step) -> self-attention (+ relative-position-key bias) ->
causal depthwise conv module -> ffn2(half-step) -> LayerNorm.  The fbank
frontend matches SeamlessM4TFeatureExtractor: 25 ms povey-window frames,
hop 10 ms, per-frame DC removal + pre-emphasis 0.97, 512-FFT power spectrum,
80 Kaldi-scale mel filters (triangularized in mel space), log with floor,
per-mel-bin normalization, and 2-frame stacking to 160-d inputs.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclass(frozen=True)
class W2vBertConfig:
    hidden_size: int = 1024
    num_hidden_layers: int = 24
    intermediate_size: int = 4096
    num_attention_heads: int = 16
    feature_projection_input_dim: int = 160
    layer_norm_eps: float = 1e-5
    left_max_position_embeddings: int = 64
    right_max_position_embeddings: int = 8
    conv_depthwise_kernel_size: int = 31

    @classmethod
    def from_hf(cls, hf_cfg) -> "W2vBertConfig":
        return cls(
            hidden_size=hf_cfg.hidden_size,
            num_hidden_layers=hf_cfg.num_hidden_layers,
            intermediate_size=hf_cfg.intermediate_size,
            num_attention_heads=hf_cfg.num_attention_heads,
            feature_projection_input_dim=hf_cfg.feature_projection_input_dim,
            layer_norm_eps=hf_cfg.layer_norm_eps,
            left_max_position_embeddings=hf_cfg.left_max_position_embeddings,
            right_max_position_embeddings=hf_cfg.right_max_position_embeddings,
            conv_depthwise_kernel_size=hf_cfg.conv_depthwise_kernel_size,
        )


# ---------------------------------------------------------------------------
# fbank frontend (SeamlessM4TFeatureExtractor semantics)
# ---------------------------------------------------------------------------

def _hz_to_mel_kaldi(f):
    return 1127.0 * np.log(1.0 + f / 700.0)


def kaldi_mel_filters(
    num_frequency_bins: int = 257,
    num_mel_filters: int = 80,
    min_frequency: float = 20.0,
    max_frequency: float = 8000.0,
    sampling_rate: int = 16000,
) -> np.ndarray:
    """Kaldi mel filter bank, triangularized in mel space (matches HF
    `mel_filter_bank(..., mel_scale='kaldi', triangularize_in_mel_space=True,
    norm=None)`). Returns (num_frequency_bins, num_mel_filters)."""
    mel_min = _hz_to_mel_kaldi(min_frequency)
    mel_max = _hz_to_mel_kaldi(max_frequency)
    mel_freqs = np.linspace(mel_min, mel_max, num_mel_filters + 2)
    # triangularize in mel space: FFT bin frequencies mapped to mel first
    fft_bin_width = sampling_rate / ((num_frequency_bins - 1) * 2)
    fft_freqs = _hz_to_mel_kaldi(fft_bin_width * np.arange(num_frequency_bins))
    fdiff = np.diff(mel_freqs)
    slopes = mel_freqs[None, :] - fft_freqs[:, None]
    down = -slopes[:, :-2] / fdiff[:-1]
    up = slopes[:, 2:] / fdiff[1:]
    return np.maximum(0.0, np.minimum(down, up))


def w2vbert_fbank(
    audio: jnp.ndarray,
    mel_filters: Optional[np.ndarray] = None,
    stride: int = 2,
) -> jnp.ndarray:
    """16 kHz audio (B, T) -> stacked log-mel features (B, T//320, 160).

    Matches SeamlessM4TFeatureExtractor: 2^15 scaling, 400-sample frames /
    hop 160 (center=False), per-frame DC removal, pre-emphasis 0.97 (first
    sample scaled by 1-p), povey window, 512-point power spectrum, Kaldi mel
    filters with floor 2^-23, natural log, per-mel-bin zero-mean/unit-var
    (ddof=1) over time, then 2-frame stacking."""
    if audio.ndim == 1:
        audio = audio[None]
    frame_length, hop, fft_length = 400, 160, 512
    filters = jnp.asarray(mel_filters if mel_filters is not None else kaldi_mel_filters())
    window = jnp.asarray(np.power(np.hanning(frame_length), 0.85))

    x = audio.astype(jnp.float32) * 32768.0
    num_frames = 1 + (x.shape[-1] - frame_length) // hop
    idx = jnp.arange(num_frames)[:, None] * hop + jnp.arange(frame_length)[None, :]
    frames = x[:, idx]  # (B, F, 400)
    frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    pre = frames.at[:, :, 1:].add(-0.97 * frames[:, :, :-1])
    frames = pre.at[:, :, 0].multiply(1.0 - 0.97)
    frames = frames * window
    spec = jnp.abs(jnp.fft.rfft(frames, n=fft_length, axis=-1)) ** 2
    mel = jnp.log(jnp.maximum(spec @ filters, 1.192092955078125e-07))  # (B, F, 80)
    mean = jnp.mean(mel, axis=1, keepdims=True)
    var = jnp.var(mel, axis=1, keepdims=True) * mel.shape[1] / max(mel.shape[1] - 1, 1)
    mel = (mel - mean) / jnp.sqrt(var + 1e-7)
    F = (mel.shape[1] // stride) * stride
    return mel[:, :F].reshape(mel.shape[0], F // stride, stride * mel.shape[-1])


# ---------------------------------------------------------------------------
# conformer encoder
# ---------------------------------------------------------------------------

class _FeedForward(nn.Module):
    cfg: W2vBertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.cfg.intermediate_size, dtype=self.dtype, name="intermediate_dense")(x)
        h = nn.swish(h)
        return nn.Dense(self.cfg.hidden_size, dtype=self.dtype, name="output_dense")(h)


class _RelKeySelfAttention(nn.Module):
    """Self-attention with learned relative-position key bias
    (position_embeddings_type='relative_key')."""

    cfg: W2vBertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        H, D = c.num_attention_heads, c.hidden_size // c.num_attention_heads
        B, T, _ = x.shape
        q = nn.Dense(c.hidden_size, dtype=self.dtype, name="linear_q")(x).reshape(B, T, H, D)
        k = nn.Dense(c.hidden_size, dtype=self.dtype, name="linear_k")(x).reshape(B, T, H, D)
        v = nn.Dense(c.hidden_size, dtype=self.dtype, name="linear_v")(x).reshape(B, T, H, D)
        scores = jnp.einsum("blhd,brhd->bhlr", q, k) / jnp.sqrt(D).astype(self.dtype)

        L, R = c.left_max_position_embeddings, c.right_max_position_embeddings
        dist_table = self.param(
            "distance_embedding", nn.initializers.normal(0.02), (L + R + 1, D), jnp.float32
        )
        distance = jnp.clip(jnp.arange(T)[None, :] - jnp.arange(T)[:, None], -L, R)
        pos = jnp.take(dist_table, distance + L, axis=0).astype(self.dtype)  # (T, T, D)
        scores = scores + jnp.einsum("blhd,lrd->bhlr", q, pos) / jnp.sqrt(D).astype(self.dtype)

        probs = nn.softmax(scores.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhlr,brhd->blhd", probs, v).reshape(B, T, c.hidden_size)
        return nn.Dense(c.hidden_size, dtype=self.dtype, name="linear_out")(out)


class _ConvModule(nn.Module):
    """Conformer convolution: LN -> pointwise(2h) -> GLU -> causal depthwise
    conv(k) -> LN -> swish -> pointwise(h)."""

    cfg: W2vBertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="layer_norm")(x)
        h = nn.Dense(2 * c.hidden_size, use_bias=False, dtype=self.dtype, name="pointwise_conv1")(h)
        a, b = jnp.split(h, 2, axis=-1)
        h = a * nn.sigmoid(b)  # GLU over the channel dim
        k = c.conv_depthwise_kernel_size
        h = nn.Conv(
            c.hidden_size, (k,), padding=[(k - 1, 0)], feature_group_count=c.hidden_size,
            use_bias=False, dtype=self.dtype, name="depthwise_conv",
        )(h)
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="depthwise_layer_norm")(h)
        h = nn.swish(h)
        return nn.Dense(c.hidden_size, use_bias=False, dtype=self.dtype, name="pointwise_conv2")(h)


class ConformerBlock(nn.Module):
    cfg: W2vBertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        x = x + 0.5 * _FeedForward(c, dtype=self.dtype, name="ffn1")(
            nn.LayerNorm(epsilon=c.layer_norm_eps, name="ffn1_layer_norm")(x)
        )
        x = x + _RelKeySelfAttention(c, dtype=self.dtype, name="self_attn")(
            nn.LayerNorm(epsilon=c.layer_norm_eps, name="self_attn_layer_norm")(x)
        )
        x = x + _ConvModule(c, dtype=self.dtype, name="conv_module")(x)
        x = x + 0.5 * _FeedForward(c, dtype=self.dtype, name="ffn2")(
            nn.LayerNorm(epsilon=c.layer_norm_eps, name="ffn2_layer_norm")(x)
        )
        return nn.LayerNorm(epsilon=c.layer_norm_eps, name="final_layer_norm")(x)


class W2vBertModel(nn.Module):
    cfg: W2vBertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features: jnp.ndarray) -> jnp.ndarray:
        """Stacked fbank features (B, T, 160) -> hidden states (B, T, 1024)."""
        c = self.cfg
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="fp_layer_norm")(features)
        x = nn.Dense(c.hidden_size, dtype=self.dtype, name="fp_projection")(x)
        for i in range(c.num_hidden_layers):
            x = ConformerBlock(c, dtype=self.dtype, name=f"layer_{i}")(x)
        return x


# ---------------------------------------------------------------------------
# HF checkpoint import (facebook/w2v-bert-2.0 Wav2Vec2BertModel state dict)
# ---------------------------------------------------------------------------

def _np(v):
    return np.asarray(v.detach().cpu().float().numpy() if hasattr(v, "detach") else v)


def _dense(state: Dict, name: str, bias: bool = True) -> Dict:
    p = {"kernel": _np(state[f"{name}.weight"]).T}
    if bias and f"{name}.bias" in state:
        p["bias"] = _np(state[f"{name}.bias"])
    return p


def _ln(state: Dict, name: str) -> Dict:
    return {"scale": _np(state[f"{name}.weight"]), "bias": _np(state[f"{name}.bias"])}


def _ffn(state: Dict, name: str) -> Dict:
    return {
        "intermediate_dense": _dense(state, f"{name}.intermediate_dense"),
        "output_dense": _dense(state, f"{name}.output_dense"),
    }


def w2vbert_params_from_torch(state: Dict, cfg: W2vBertConfig) -> Dict:
    """Map a HF Wav2Vec2BertModel state dict into W2vBertModel params.

    Pointwise convs are k=1 Conv1d in torch -> Dense here ((2h,h,1) -> (h,2h));
    the depthwise conv (h,1,k) transposes to flax's (k,1,h) grouped layout."""
    state = {k: v for k, v in state.items()}
    params: Dict = {
        "fp_layer_norm": _ln(state, "feature_projection.layer_norm"),
        "fp_projection": _dense(state, "feature_projection.projection"),
    }
    for i in range(cfg.num_hidden_layers):
        b = f"encoder.layers.{i}"
        dw = _np(state[f"{b}.conv_module.depthwise_conv.weight"])  # (h, 1, k)
        params[f"layer_{i}"] = {
            "ffn1_layer_norm": _ln(state, f"{b}.ffn1_layer_norm"),
            "ffn1": _ffn(state, f"{b}.ffn1"),
            "self_attn_layer_norm": _ln(state, f"{b}.self_attn_layer_norm"),
            "self_attn": {
                "linear_q": _dense(state, f"{b}.self_attn.linear_q"),
                "linear_k": _dense(state, f"{b}.self_attn.linear_k"),
                "linear_v": _dense(state, f"{b}.self_attn.linear_v"),
                "linear_out": _dense(state, f"{b}.self_attn.linear_out"),
                "distance_embedding": _np(state[f"{b}.self_attn.distance_embedding.weight"]),
            },
            "conv_module": {
                "layer_norm": _ln(state, f"{b}.conv_module.layer_norm"),
                "pointwise_conv1": {
                    "kernel": _np(state[f"{b}.conv_module.pointwise_conv1.weight"])[:, :, 0].T
                },
                "depthwise_conv": {"kernel": np.transpose(dw, (2, 1, 0))},
                "depthwise_layer_norm": _ln(state, f"{b}.conv_module.depthwise_layer_norm"),
                "pointwise_conv2": {
                    "kernel": _np(state[f"{b}.conv_module.pointwise_conv2.weight"])[:, :, 0].T
                },
            },
            "ffn2_layer_norm": _ln(state, f"{b}.ffn2_layer_norm"),
            "ffn2": _ffn(state, f"{b}.ffn2"),
            "final_layer_norm": _ln(state, f"{b}.final_layer_norm"),
        }
    return params
