"""Whisper audio encoder in flax (semantic unit extractor backbone).

Architecture parity with the reference (`encoder/whisper/model.py:42-131`):
conv k3 (stride 1) -> GELU -> conv k3 stride 2 -> GELU -> +sinusoidal
positions -> N pre-LN residual attention blocks (MHA with biasless key,
4x GELU MLP) -> final LayerNorm.  large-v3: 128 mels, 1280 state, 20 heads,
32 layers, output = 1280-d units at mel_frames/2 rate (hop 320 @ 16 kHz).

LayerNorms compute in f32 and cast back (ref model.py:23-25), which is exactly
flax LayerNorm's behavior with param_dtype=f32 / dtype=bf16.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from latent_diffusion_speech_tpu.ops.attention import dot_product_attention


@dataclass(frozen=True)
class WhisperDims:
    n_mels: int = 128
    n_audio_ctx: int = 1500
    n_audio_state: int = 1280
    n_audio_head: int = 20
    n_audio_layer: int = 32

    @classmethod
    def from_checkpoint_dims(cls, dims: dict) -> "WhisperDims":
        return cls(
            n_mels=dims["n_mels"],
            n_audio_ctx=dims["n_audio_ctx"],
            n_audio_state=dims["n_audio_state"],
            n_audio_head=dims["n_audio_head"],
            n_audio_layer=dims["n_audio_layer"],
        )


def sinusoids(length: int, channels: int, max_timescale: float = 10000.0) -> jnp.ndarray:
    """Sinusoidal positions (ref model.py:35-40, sans the hardcoded .to('cuda'))."""
    assert channels % 2 == 0
    log_inc = np.log(max_timescale) / (channels // 2 - 1)
    inv = jnp.exp(-log_inc * jnp.arange(channels // 2))
    scaled = jnp.arange(length)[:, None] * inv[None, :]
    return jnp.concatenate([jnp.sin(scaled), jnp.cos(scaled)], axis=1)


class MHA(nn.Module):
    n_state: int
    n_head: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.n_state // self.n_head
        q = nn.Dense(self.n_state, dtype=self.dtype, name="query")(x)
        k = nn.Dense(self.n_state, use_bias=False, dtype=self.dtype, name="key")(x)
        v = nn.Dense(self.n_state, dtype=self.dtype, name="value")(x)
        B, T = x.shape[:2]
        out = dot_product_attention(
            q.reshape(B, T, self.n_head, d),
            k.reshape(B, T, self.n_head, d),
            v.reshape(B, T, self.n_head, d),
        ).reshape(B, T, self.n_state)
        return nn.Dense(self.n_state, dtype=self.dtype, name="out")(out)


class ResidualAttentionBlock(nn.Module):
    n_state: int
    n_head: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(epsilon=1e-5, name="attn_ln")(x).astype(self.dtype)
        x = x + MHA(self.n_state, self.n_head, dtype=self.dtype, name="attn")(h)
        h = nn.LayerNorm(epsilon=1e-5, name="mlp_ln")(x).astype(self.dtype)
        h = nn.Dense(4 * self.n_state, dtype=self.dtype, name="mlp_0")(h)
        h = nn.gelu(h, approximate=False)
        x = x + nn.Dense(self.n_state, dtype=self.dtype, name="mlp_2")(h)
        return x


class WhisperEncoder(nn.Module):
    dims: WhisperDims
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        """mel (B, n_mels, T) -> units (B, T // 2, n_state)."""
        x = jnp.swapaxes(mel, -1, -2)  # (B, T, n_mels) channels-last
        x = nn.Conv(self.dims.n_audio_state, (3,), padding=[(1, 1)], dtype=self.dtype, name="conv1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Conv(self.dims.n_audio_state, (3,), strides=(2,), padding=[(1, 1)], dtype=self.dtype, name="conv2")(x)
        x = nn.gelu(x, approximate=False)
        x = x + sinusoids(x.shape[1], self.dims.n_audio_state).astype(x.dtype)
        for i in range(self.dims.n_audio_layer):
            x = ResidualAttentionBlock(
                self.dims.n_audio_state, self.dims.n_audio_head, dtype=self.dtype, name=f"block_{i}"
            )(x)
        return nn.LayerNorm(epsilon=1e-5, name="ln_post")(x)


# ---------------------------------------------------------------------------
# torch checkpoint import ('pretrain/large-v3_encoder.pt':
# {"dims": {...}, "model_state_dict": {...}} — ref tools/tools.py:105-117)
# ---------------------------------------------------------------------------

def _dense(state: Dict, name: str, bias: bool = True) -> Dict:
    p = {"kernel": np.asarray(state[name + ".weight"]).T}
    if bias and name + ".bias" in state:
        p["bias"] = np.asarray(state[name + ".bias"])
    return p


def _conv(state: Dict, name: str) -> Dict:
    w = np.asarray(state[name + ".weight"])  # (out, in, k)
    return {"kernel": np.transpose(w, (2, 1, 0)), "bias": np.asarray(state[name + ".bias"])}


def _ln(state: Dict, name: str) -> Dict:
    return {"scale": np.asarray(state[name + ".weight"]), "bias": np.asarray(state[name + ".bias"])}


def whisper_encoder_params_from_torch(state: Dict, dims: WhisperDims) -> Dict:
    """Map the reference AudioEncoder state dict (keys `encoder.*` or bare)."""
    state = {
        (k[len("encoder.") :] if k.startswith("encoder.") else k): np.asarray(
            v.detach().cpu().float().numpy() if hasattr(v, "detach") else v
        )
        for k, v in state.items()
    }
    params: Dict = {
        "conv1": _conv(state, "conv1"),
        "conv2": _conv(state, "conv2"),
        "ln_post": _ln(state, "ln_post"),
    }
    for i in range(dims.n_audio_layer):
        b = f"blocks.{i}"
        params[f"block_{i}"] = {
            "attn_ln": _ln(state, f"{b}.attn_ln"),
            "mlp_ln": _ln(state, f"{b}.mlp_ln"),
            "attn": {
                "query": _dense(state, f"{b}.attn.query"),
                "key": _dense(state, f"{b}.attn.key", bias=False),
                "value": _dense(state, f"{b}.attn.value"),
                "out": _dense(state, f"{b}.attn.out"),
            },
            "mlp_0": _dense(state, f"{b}.mlp.0"),
            "mlp_2": _dense(state, f"{b}.mlp.2"),
        }
    return params
