"""WaveNet (WN) + ConvReluNorm + flow modules from the codec's module bag.

The reference ships these in `encoder/hifi_vaegan/modules/modules.py:1-180`
(VITS lineage).  Nothing in the reference's HiFi-VAEGAN forward path uses
them — SURVEY §2.4 marks them "unused in this path" — but they are part of
the codec component surface (posterior encoders / flow priors built from this
bag), so the framework carries TPU-native equivalents: channels-last flax,
dilated convs lowered as NWC `conv_general_dilated` (MXU-shaped), the WN gate
computed as one fused tanh*sigmoid on a split tensor exactly like the
reference's `fused_add_tanh_sigmoid_multiply` (`modules.py:8-14` — XLA fuses
it without the TorchScript annotation).

Weight-normed torch checkpoints load via `wn_params_from_torch` /
`conv_relu_norm_params_from_torch` (weight-norm folded at import, the same
convention as the rest of the codec importers).  Parity-tested against the
reference modules in tests/test_vaegan_modules.py.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = [
    "DilatedConv1d",
    "WN1D",
    "ConvReluNorm1D",
    "log_flow",
    "flip_flow",
    "wn_params_from_torch",
    "conv_relu_norm_params_from_torch",
]


class DilatedConv1d(nn.Module):
    """'Same'-padded dilated conv over (B, T, C) — `nn.Conv1d(..., dilation)`
    with padding (k*d - d)//2 (modules.py:80-83)."""

    features: int
    kernel_size: int
    dilation: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k, d = self.kernel_size, self.dilation
        pad = (k * d - d) // 2
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (k, x.shape[-1], self.features), jnp.float32
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        out = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype), (1,), [(pad, pad)],
            rhs_dilation=(d,), dimension_numbers=("NWC", "WIO", "NWC"),
        )
        return out + bias.astype(self.dtype)


class WN1D(nn.Module):
    """WaveNet stack (modules.py:64-119): n_layers of [dilated conv to 2H,
    gated tanh*sigmoid, 1x1 res+skip], accumulating the skip stream.

    The optional `g` conditioning of the VITS original was already stripped
    in the reference; masks are (B, T, 1) channels-last."""

    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_mask=None, dropout_rng=None, dropout_rate: float = 0.0):
        h = self.hidden_channels
        mask = jnp.ones_like(x[..., :1]) if x_mask is None else x_mask
        output = jnp.zeros_like(x)
        for i in range(self.n_layers):
            x_in = DilatedConv1d(
                2 * h, self.kernel_size, dilation=self.dilation_rate ** i,
                dtype=self.dtype, name=f"in_layers_{i}",
            )(x)
            acts = jnp.tanh(x_in[..., :h]) * jax.nn.sigmoid(x_in[..., h:])
            if dropout_rate > 0.0 and dropout_rng is not None:
                dropout_rng, sub = jax.random.split(dropout_rng)
                keep = jax.random.bernoulli(sub, 1.0 - dropout_rate, acts.shape)
                acts = jnp.where(keep, acts / (1.0 - dropout_rate), 0.0)
            out_ch = 2 * h if i < self.n_layers - 1 else h
            res_skip = nn.Dense(out_ch, dtype=self.dtype, name=f"res_skip_layers_{i}")(acts)
            if i < self.n_layers - 1:
                x = (x + res_skip[..., :h]) * mask
                output = output + res_skip[..., h:]
            else:
                output = output + res_skip
        return output * mask


class ConvReluNorm1D(nn.Module):
    """Conv -> LayerNorm -> ReLU stack with a zero-init residual projection
    (modules.py:30-62).  The reference's channels-first `LayerNorm` is a plain
    last-axis LayerNorm here (channels-last)."""

    hidden_channels: int
    out_channels: int
    kernel_size: int
    n_layers: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_mask=None, dropout_rng=None, dropout_rate: float = 0.0):
        assert self.n_layers > 1, "Number of layers should be larger than 0."
        mask = jnp.ones_like(x[..., :1]) if x_mask is None else x_mask
        x_org = x
        pad = self.kernel_size // 2
        for i in range(self.n_layers):
            x = DilatedConv1d(
                self.hidden_channels, self.kernel_size, dtype=self.dtype,
                name=f"conv_layers_{i}",
            )(x * mask)
            x = nn.LayerNorm(epsilon=1e-5, name=f"norm_layers_{i}")(x).astype(self.dtype)
            x = nn.relu(x)
            if dropout_rate > 0.0 and dropout_rng is not None:
                dropout_rng, sub = jax.random.split(dropout_rng)
                keep = jax.random.bernoulli(sub, 1.0 - dropout_rate, x.shape)
                x = jnp.where(keep, x / (1.0 - dropout_rate), 0.0)
        x = x_org + nn.Dense(
            self.out_channels, kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros, dtype=self.dtype, name="proj",
        )(x)
        return x * mask


def log_flow(x, x_mask, reverse: bool = False):
    """`Log` flow (modules.py:121-129): y = log(clamp(x)) with logdet."""
    if not reverse:
        y = jnp.log(jnp.clip(x, 1e-5)) * x_mask
        logdet = jnp.sum(-y, axis=(1, 2))
        return y, logdet
    return jnp.exp(x) * x_mask


def flip_flow(x, reverse: bool = False):
    """`Flip` flow (modules.py:131-138): reverse the channel axis.
    Channels-last: flips axis -1 (the reference flips dim 1 of (B, C, T))."""
    x = jnp.flip(x, axis=-1)
    if not reverse:
        return x, jnp.zeros(x.shape[0], x.dtype)
    return x


# -- importers ---------------------------------------------------------------


def _np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().float().numpy() if hasattr(t, "detach") else t, np.float32)


def wn_params_from_torch(state: Dict) -> Dict:
    """WN state dict (weight-normed convs) -> WN1D params."""
    from latent_diffusion_speech_tpu.models.vaegan.import_torch import fold_weight_norm

    state = fold_weight_norm({k: _np(v) for k, v in state.items()})
    params: Dict = {}
    i = 0
    while f"in_layers.{i}.weight" in state:
        w = state[f"in_layers.{i}.weight"]  # (O, I, k)
        params[f"in_layers_{i}"] = {
            "kernel": np.transpose(w, (2, 1, 0)),
            "bias": state[f"in_layers.{i}.bias"],
        }
        rs = state[f"res_skip_layers.{i}.weight"]  # (O, I, 1)
        params[f"res_skip_layers_{i}"] = {
            "kernel": rs[:, :, 0].T,
            "bias": state[f"res_skip_layers.{i}.bias"],
        }
        i += 1
    return params


def conv_relu_norm_params_from_torch(state: Dict) -> Dict:
    """ConvReluNorm state dict -> ConvReluNorm1D params."""
    state = {k: _np(v) for k, v in state.items()}
    params: Dict = {}
    i = 0
    while f"conv_layers.{i}.weight" in state:
        params[f"conv_layers_{i}"] = {
            "kernel": np.transpose(state[f"conv_layers.{i}.weight"], (2, 1, 0)),
            "bias": state[f"conv_layers.{i}.bias"],
        }
        params[f"norm_layers_{i}"] = {
            "scale": state[f"norm_layers.{i}.gamma"],
            "bias": state[f"norm_layers.{i}.beta"],
        }
        i += 1
    params["proj"] = {
        "kernel": state["proj.weight"][:, :, 0].T,
        "bias": state["proj.bias"],
    }
    return params
