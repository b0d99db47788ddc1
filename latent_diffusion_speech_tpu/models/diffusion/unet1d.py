"""Conditional UNet-1D denoiser in flax (channels-last).

This is the *effective* architecture the reference instantiates — the diffusers
UNet2DConditionModel 1-D port (`diffusion/unet1d/`) reduced to the single
configuration `Unit2Mel` builds (`diffusion/unit2mel.py:62-71`):

* conv_in k3 -> 4 down blocks (2x [ResBlock + TransformerBlock] for the first
  three, 2x ResBlock for the last; strided-conv downsample between) -> mid
  (ResBlock + Transformer + ResBlock) -> 4 up blocks (3x [concat skip +
  ResBlock (+Transformer)], nearest-x2-upsample + conv between) -> GroupNorm ->
  SiLU -> conv_out k3  (`unet_1d_condition.py:949-1035`, `unet_1d_blocks.py`).
* ResBlock: GroupNorm -> SiLU -> conv k3 -> time-emb 'scale_shift' -> GroupNorm
  -> (1+scale)*h+shift -> SiLU -> conv k3, 1x1 shortcut (`resnet.py:461-645`).
* TransformerBlock: GroupNorm(eps 1e-6) -> 1x1 conv in -> [LN -> self-attn ->
  LN -> self-attn -> LN -> GEGLU FF] -> 1x1 conv out + residual
  (`transformer_1d.py:258-295`, `attention.py:129-204`; with
  only_cross_attention=True and no encoder states both attentions act as
  self-attention at runtime).
* Timesteps: sinusoidal (flip_sin_to_cos, shift 0) -> MLP to 4*boc[0]
  (`embeddings.py:24-66,157-203`).

TPU-first: channels-last convs on the MXU, f32 softmax inside bf16 compute,
`nn.remat` on blocks for rematerialized training.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from latent_diffusion_speech_tpu.ops.attention import dot_product_attention

__all__ = ["UNet1DConfig", "UNet1D"]


@dataclass(frozen=True)
class UNet1DConfig:
    in_channels: int = 384           # out_dims + n_hidden
    out_channels: int = 128
    block_out_channels: Tuple[int, ...] = (256, 384, 512, 512)
    layers_per_block: int = 2
    n_heads: int = 8
    norm_num_groups: int = 8
    cross_attn: Tuple[bool, ...] = (True, True, True, False)  # per down block
    dropout: float = 0.0
    remat: bool = False
    conv_impl: str = "xla"           # 'xla' (conv_general_dilated) | 'matmul'
    # 'xla' (default): einsum attention — measured at its traffic floor for
    # these short sequences; 'fused' = the Pallas single-block kernel, kept as
    # a tested opt-in (it LOSES here: benchmarks/TRAIN_ATTN_AB.json)
    attn_impl: str = "xla"
    # GEGLU gelu: 'auto' (default — tanh approximation for batch >= 128,
    # exact erf below), 'exact' (erf everywhere — bit-parity mode), 'tanh'
    # (everywhere).  Measured (benchmarks/TRAIN_STEP_AB.json): tanh is -4%
    # step time at B=256 (74.4 vs 77.6 ms) but +35% at B=64 (an XLA fusion
    # pathology), hence the per-shape dispatch; the approximation error
    # (<1e-3 relative) is below bf16 resolution.  Shapes are static under
    # jit, so 'auto' resolves at trace time — no runtime branch.
    gelu: str = "auto"
    # q/k/v projections: 'split' (three (C,C) matmuls — parity default) or
    # 'fused' (one (C,3C) matmul on concatenated kernels; identical params
    # and numerics up to dot-product association — same trick as GegluFF)
    qkv: str = "split"

    @property
    def downsample_factor(self) -> int:
        return 2 ** (len(self.block_out_channels) - 1)


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0) -> jnp.ndarray:
    """Sinusoidal embedding, diffusers convention: flip_sin_to_cos=True,
    downscale_freq_shift=0 -> [cos | sin]."""
    half = dim // 2
    freqs = jnp.exp(-jnp.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class Conv1dSame(nn.Module):
    """'Same'-padded odd-kernel Conv1d with a selectable lowering.

    Param layout is identical to ``flax.linen.Conv`` (kernel (k, C_in, C_out)
    WIO + bias), so checkpoints are interchangeable between impls.

    * ``impl='xla'``: ``lax.conv_general_dilated`` NWC — exactly what
      ``nn.Conv`` emits.
    * ``impl='matmul'``: sum of k shifted (B, T, C_in) @ (C_in, C_out)
      matmuls (stride 1), or k strided-phase matmuls (stride 2).  Forward
      AND backward then lower to plain ``dot_general``s on the MXU — the
      conv-backward layout work the train-step MFU analysis called for
      (grad-wrt-kernel becomes (C_in, B*T) @ (B*T, C_out)).  Same trick as
      the vocoder's ``models/vaegan/models.py::Conv1d`` forward rewrite.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    impl: str = "xla"
    dtype: jnp.dtype = jnp.float32
    use_bias: bool = True
    # Fuse a nearest-x2 upsample into the conv (matmul impl, k=3, s=1 only):
    # the caller passes the UN-repeated x and gets the 2T output.  Polyphase:
    # out[2t] = w0·x[t-1] + (w1+w2)·x[t]; out[2t+1] = (w0+w1)·x[t] + w2·x[t+1]
    # — 4 length-T matmuls instead of 3 length-2T ones (1.5x fewer FLOPs) and
    # the (B, 2T, C) repeat tensor never materializes.
    upsample2x: bool = False

    @nn.compact
    def __call__(self, x):
        k, s = self.kernel_size, self.stride
        pad = (k - 1) // 2
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (k, x.shape[-1], self.features), jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else jnp.zeros((self.features,), jnp.float32)
        )
        x = x.astype(self.dtype)
        w = kernel.astype(self.dtype)
        if self.upsample2x:
            assert self.impl == "matmul" and k == 3 and s == 1
            x_prev = jnp.pad(x, ((0, 0), (1, 0), (0, 0)))[:, :-1]
            x_next = jnp.pad(x, ((0, 0), (0, 1), (0, 0)))[:, 1:]
            even = x_prev @ w[0] + x @ (w[1] + w[2])
            odd = x @ (w[0] + w[1]) + x_next @ w[2]
            out = jnp.stack([even, odd], axis=2).reshape(x.shape[0], -1, self.features)
        elif self.impl == "matmul":
            T = x.shape[1]
            T_out = (T + 2 * pad - k) // s + 1
            xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0))) if pad else x
            if s == 1:
                out = xp[:, 0:T_out] @ w[0]
                for t in range(1, k):
                    out = out + xp[:, t : t + T_out] @ w[t]
            else:
                out = xp[:, 0::s][:, :T_out] @ w[0]
                for t in range(1, k):
                    out = out + xp[:, t::s][:, :T_out] @ w[t]
        else:
            out = jax.lax.conv_general_dilated(
                x, w, (s,), [(pad, pad)],
                dimension_numbers=("NWC", "WIO", "NWC"),
            )
        return out + bias.astype(self.dtype)


class ResBlock1D(nn.Module):
    out_channels: int
    groups: int = 8
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    conv_impl: str = "xla"

    @nn.compact
    def __call__(self, x, temb):
        """x (B, T, C), temb (B, E). 'scale_shift' time conditioning."""
        # norms: f32 statistics, output cast back to the compute dtype — the
        # f32 tensor must not materialize in HBM (the step is bandwidth-bound)
        h = nn.GroupNorm(num_groups=self.groups, epsilon=self.eps, name="norm1")(x).astype(self.dtype)
        h = nn.silu(h)
        h = Conv1dSame(self.out_channels, 3, impl=self.conv_impl, dtype=self.dtype, name="conv1")(h)

        emb = nn.Dense(2 * self.out_channels, dtype=self.dtype, name="time_emb_proj")(nn.silu(temb))
        scale, shift = jnp.split(emb[:, None, :], 2, axis=-1)

        h = nn.GroupNorm(num_groups=self.groups, epsilon=self.eps, name="norm2")(h).astype(self.dtype)
        h = h * (1 + scale) + shift
        h = nn.silu(h)
        h = Conv1dSame(self.out_channels, 3, impl=self.conv_impl, dtype=self.dtype, name="conv2")(h)

        if x.shape[-1] != self.out_channels:
            x = Conv1dSame(self.out_channels, 1, impl=self.conv_impl, dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class _ProjKernel(nn.Module):
    """Bias-free projection weight with nn.Dense's param layout, returned as
    an array so callers can fuse several projections into one matmul while
    checkpoints stay interchangeable with the split form."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        return self.param(
            "kernel", nn.initializers.lecun_normal(), (in_features, self.features), jnp.float32
        )


class SelfAttention(nn.Module):
    channels: int
    n_heads: int
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"
    qkv: str = "split"

    @nn.compact
    def __call__(self, x):
        B, T, C = x.shape
        d = self.channels // self.n_heads
        if self.qkv == "fused":
            # one (B*T, C) @ (C, 3C) matmul instead of three (C, C) ones:
            # fewer dispatches, fuller MXU tiles; the kernel concat is tiny
            # next to the matmul and the param tree is unchanged
            w = jnp.concatenate(
                [
                    _ProjKernel(self.channels, name="to_q")(x.shape[-1]),
                    _ProjKernel(self.channels, name="to_k")(x.shape[-1]),
                    _ProjKernel(self.channels, name="to_v")(x.shape[-1]),
                ],
                axis=1,
            ).astype(self.dtype)
            q, k, v = jnp.split(x @ w, 3, axis=-1)
        else:
            q = nn.Dense(self.channels, use_bias=False, dtype=self.dtype, name="to_q")(x)
            k = nn.Dense(self.channels, use_bias=False, dtype=self.dtype, name="to_k")(x)
            v = nn.Dense(self.channels, use_bias=False, dtype=self.dtype, name="to_v")(x)
        out = dot_product_attention(
            q.reshape(B, T, self.n_heads, d),
            k.reshape(B, T, self.n_heads, d),
            v.reshape(B, T, self.n_heads, d),
            impl=self.attn_impl,
        ).reshape(B, T, C)
        return nn.Dense(self.channels, dtype=self.dtype, name="to_out")(out)


class GegluFF(nn.Module):
    """GEGLU feed-forward with the diffusers param layout (one fused
    (C, 8C) ff_proj kernel) executed as TWO (C, 4C) matmuls on sliced
    weights: the (B, T, 8C) pre-split tensor never materializes in HBM —
    measured -25% fwd+bwd on this sub-layer at train shapes
    (benchmarks/TRAIN_DECOMPOSE.json geglu rows).

    `approx_gelu` swaps erf-GELU for the tanh approximation: erf lowers to a
    long VPU polynomial on TPU; the tanh form's error (<1e-3 relative) is
    below bf16 resolution.  The dispatch lives in TransformerBlock1D
    (gelu='auto': tanh iff batch >= 128 — the measured crossover where the
    tanh form wins; below it an XLA fusion pathology makes it lose)."""

    channels: int
    dtype: jnp.dtype = jnp.float32
    approx_gelu: bool = False

    @nn.compact
    def __call__(self, ff_in):
        c = self.channels
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (c, 8 * c), jnp.float32
        )
        bias = self.param("bias", nn.initializers.zeros, (8 * c,), jnp.float32)
        w = kernel.astype(self.dtype)
        b = bias.astype(self.dtype)
        a = ff_in @ w[:, : 4 * c] + b[: 4 * c]
        g = ff_in @ w[:, 4 * c :] + b[4 * c :]
        return a * nn.gelu(g, approximate=self.approx_gelu)


class TransformerBlock1D(nn.Module):
    """Transformer2DModel(num_layers=1) effective runtime path."""

    channels: int
    n_heads: int
    groups: int = 8
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"
    gelu: str = "auto"  # 'auto' (tanh iff B >= 128) | 'exact' | 'tanh' (see UNet1DConfig.gelu)
    qkv: str = "split"

    @nn.compact
    def __call__(self, x):
        residual = x
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6, name="norm")(x).astype(self.dtype)
        h = nn.Dense(self.channels, dtype=self.dtype, name="proj_in")(h)  # 1x1 conv == dense

        # BasicTransformerBlock: attn1 + attn2 (both self-attn at runtime) + GEGLU FF
        h = h + SelfAttention(self.channels, self.n_heads, dtype=self.dtype,
                              attn_impl=self.attn_impl, qkv=self.qkv, name="attn1")(
            nn.LayerNorm(name="norm1")(h).astype(self.dtype)
        )
        h = h + SelfAttention(self.channels, self.n_heads, dtype=self.dtype,
                              attn_impl=self.attn_impl, qkv=self.qkv, name="attn2")(
            nn.LayerNorm(name="norm2")(h).astype(self.dtype)
        )
        ff_in = nn.LayerNorm(name="norm3")(h).astype(self.dtype)
        # 'auto': x.shape[0] is static under jit, so the B>=128 dispatch is a
        # trace-time constant (the measured crossover — TRAIN_STEP_AB.json)
        approx = self.gelu == "tanh" or (self.gelu == "auto" and x.shape[0] >= 128)
        h = h + nn.Dense(self.channels, dtype=self.dtype, name="ff_out")(
            GegluFF(self.channels, dtype=self.dtype, approx_gelu=approx,
                    name="ff_proj")(ff_in)
        )

        h = nn.Dense(self.channels, dtype=self.dtype, name="proj_out")(h)
        return h + residual


class Downsample1D(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32
    conv_impl: str = "xla"

    @nn.compact
    def __call__(self, x):
        return Conv1dSame(self.channels, 3, stride=2, impl=self.conv_impl, dtype=self.dtype, name="conv")(x)


class Upsample1D(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32
    conv_impl: str = "xla"

    @nn.compact
    def __call__(self, x):
        if self.conv_impl == "matmul":
            # polyphase: upsample fused into the conv, repeat never materializes
            return Conv1dSame(
                self.channels, 3, impl="matmul", upsample2x=True,
                dtype=self.dtype, name="conv",
            )(x)
        x = jnp.repeat(x, 2, axis=1)  # nearest x2
        return Conv1dSame(self.channels, 3, impl=self.conv_impl, dtype=self.dtype, name="conv")(x)


class UNet1D(nn.Module):
    cfg: UNet1DConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        """x (B, T, in_channels) noisy-spec ++ condition; t (B,) int/float steps.
        Returns eps-prediction (B, T, out_channels).  T must be divisible by
        2**(n_blocks-1); GaussianDiffusion pads to that grid."""
        cfg = self.cfg
        boc = cfg.block_out_channels
        n_blocks = len(boc)
        res_block = nn.remat(ResBlock1D) if cfg.remat else ResBlock1D
        attn_block = nn.remat(TransformerBlock1D) if cfg.remat else TransformerBlock1D

        temb = timestep_embedding(t, boc[0])
        temb = nn.Dense(4 * boc[0], dtype=self.dtype, name="time_mlp1")(temb)
        temb = nn.Dense(4 * boc[0], dtype=self.dtype, name="time_mlp2")(nn.silu(temb))

        h = Conv1dSame(boc[0], 3, impl=cfg.conv_impl, dtype=self.dtype, name="conv_in")(x)
        skips = [h]

        # down
        for i in range(n_blocks):
            for j in range(cfg.layers_per_block):
                h = res_block(boc[i], cfg.norm_num_groups, dtype=self.dtype, conv_impl=cfg.conv_impl, name=f"down_{i}_res_{j}")(h, temb)
                if cfg.cross_attn[i]:
                    h = attn_block(boc[i], cfg.n_heads, cfg.norm_num_groups, dtype=self.dtype, attn_impl=cfg.attn_impl, gelu=cfg.gelu, qkv=cfg.qkv, name=f"down_{i}_attn_{j}")(h)
                skips.append(h)
            if i < n_blocks - 1:
                h = Downsample1D(boc[i], dtype=self.dtype, conv_impl=cfg.conv_impl, name=f"down_{i}_downsample")(h)
                skips.append(h)

        # mid
        h = res_block(boc[-1], cfg.norm_num_groups, dtype=self.dtype, conv_impl=cfg.conv_impl, name="mid_res_0")(h, temb)
        h = attn_block(boc[-1], cfg.n_heads, cfg.norm_num_groups, dtype=self.dtype, attn_impl=cfg.attn_impl, gelu=cfg.gelu, qkv=cfg.qkv, name="mid_attn")(h)
        h = res_block(boc[-1], cfg.norm_num_groups, dtype=self.dtype, conv_impl=cfg.conv_impl, name="mid_res_1")(h, temb)

        # up (reversed channel order; num_layers = layers_per_block + 1)
        rev = list(reversed(boc))
        rev_attn = list(reversed(cfg.cross_attn))
        for i in range(n_blocks):
            for j in range(cfg.layers_per_block + 1):
                h = jnp.concatenate([h, skips.pop()], axis=-1)
                h = res_block(rev[i], cfg.norm_num_groups, dtype=self.dtype, conv_impl=cfg.conv_impl, name=f"up_{i}_res_{j}")(h, temb)
                if rev_attn[i]:
                    h = attn_block(rev[i], cfg.n_heads, cfg.norm_num_groups, dtype=self.dtype, attn_impl=cfg.attn_impl, gelu=cfg.gelu, qkv=cfg.qkv, name=f"up_{i}_attn_{j}")(h)
            if i < n_blocks - 1:
                h = Upsample1D(rev[i], dtype=self.dtype, conv_impl=cfg.conv_impl, name=f"up_{i}_upsample")(h)

        h = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-5, name="conv_norm_out")(h).astype(self.dtype)
        h = nn.silu(h)
        return Conv1dSame(cfg.out_channels, 3, impl=cfg.conv_impl, dtype=self.dtype, name="conv_out")(h)
