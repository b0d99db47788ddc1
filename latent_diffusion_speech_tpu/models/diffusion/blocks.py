"""The full diffusers UNet block zoo, 1-D and TPU-native (channels-last flax).

The reference carries the complete diffusers block factory
(`diffusion/unet1d/unet_1d_blocks.py:31-226` — 11 down + 11 up block types,
3 mid blocks at `:425-749`, `KAttentionBlock` at `:3039`), of which its config
instantiates only 5.  The flagship fast path here
(`models/diffusion/unet1d.py::UNet1D`) implements that effective architecture;
this module implements *every* factory-reachable block type so the general
`UNet1DCondition` builder (`unet1d_condition.py`) covers the whole dormant
surface too.

Design notes (TPU-first, not a translation):

* **Channels-last (B, T, C)** everywhere — convs hit the MXU as NWC, 1x1 convs
  become plain matmuls, and no transposes bracket the attention layers (the
  torch code permutes around every block).
* **Flax module names mirror the torch submodule paths** (``resnets_0``,
  ``attentions_0.transformer_blocks_0.attn1.to_q`` …) so one generic
  path-translating importer (`import_torch.block_params_from_torch`) loads any
  reference checkpoint slice into any of these blocks.
* **2-D residue in the reference is implemented by intent, not replicated.**
  The 1-D port left several dormant paths broken on (B, C, T) tensors:
  `AvgPool2d`/`upfirdn2d_native`/`F.conv2d` in the resamplers
  (`resnet.py:427-459,707-822`), `emb[:, :, None, None]` in `AdaGroupNorm`
  (`attention.py:383`), the deprecated ``Attention`` processor reading
  (B, C, T) as (batch, seq, dim) (`attention_processor.py:376-383`), and the
  image-RGB ``skip_conv = Conv2d(3, …)`` in the Skip blocks
  (`unet_1d_blocks.py:1455-1459`).  Here every resampler/norm/attention is a
  correct 1-D op over T, and the skip-sample channel count is configurable.
  Blocks whose reference forward *is* valid 1-D are parity-tested against it
  (tests/test_unet_blocks.py); the rest carry intent tests.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from latent_diffusion_speech_tpu.models.diffusion.unet1d import Conv1dSame
from latent_diffusion_speech_tpu.ops.attention import dot_product_attention

__all__ = [
    "get_down_block",
    "get_up_block",
    "get_mid_block",
    "DOWN_BLOCK_TYPES",
    "UP_BLOCK_TYPES",
    "ResnetBlock1DFull",
    "AttnBlock1D",
    "AddedKVAttention1D",
    "CrossAttention1D",
    "Transformer1D",
    "DualTransformer1D",
    "KAttention1D",
    "AdaGroupNorm1D",
]


def get_activation(name: str):
    return {
        "swish": nn.silu,
        "silu": nn.silu,
        "gelu": nn.gelu,
        "mish": lambda x: x * jnp.tanh(nn.softplus(x)),
        "relu": nn.relu,
    }[name]


# --------------------------------------------------------------------------
# resamplers (1-D intent of resnet.py:104-459,707-822)
# --------------------------------------------------------------------------


def nearest_up2(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.repeat(x, 2, axis=1)


def avg_down2(x: jnp.ndarray) -> jnp.ndarray:
    """AvgPool k2 s2 over T (floor semantics like torch)."""
    t = (x.shape[1] // 2) * 2
    return x[:, :t].reshape(x.shape[0], t // 2, 2, x.shape[2]).mean(axis=2)


def upfirdn1d(
    x: jnp.ndarray,
    kernel: Sequence[float],
    up: int = 1,
    down: int = 1,
    pad: Tuple[int, int] = (0, 0),
) -> jnp.ndarray:
    """1-D upfirdn (zero-stuff by `up`, FIR-convolve, subsample by `down`)
    over the T axis of (B, T, C) — the 1-D intent of
    `resnet.py::upfirdn2d_native` (which requires 4-D input).  Implemented as
    shifted adds: the kernel is length-4, so this lowers to a handful of
    pad/slice/scale ops XLA fuses, rather than a grouped conv."""
    k = jnp.asarray(kernel, x.dtype)[::-1]  # true convolution (kernel flipped)
    B, T, C = x.shape
    if up > 1:
        x = jnp.concatenate(
            [x[:, :, None, :], jnp.zeros((B, T, up - 1, C), x.dtype)], axis=2
        ).reshape(B, T * up, C)
    p0, p1 = pad
    x = jnp.pad(x, ((0, 0), (max(p0, 0), max(p1, 0)), (0, 0)))
    if p0 < 0:
        x = x[:, -p0:]
    if p1 < 0:
        x = x[:, :p1]
    n = x.shape[1] - len(kernel) + 1
    out = k[0] * x[:, 0:n]
    for i in range(1, len(kernel)):
        out = out + k[i] * x[:, i : i + n]
    return out[:, ::down] if down > 1 else out


_FIR = (1.0, 3.0, 3.0, 1.0)


def fir_up2(x: jnp.ndarray, gain: float = 1.0) -> jnp.ndarray:
    """FIR x2 upsample, kernel (1,3,3,1) (resnet.py:707-743 intent: the 2-D
    gain factor**2 becomes factor in 1-D so amplitude is preserved)."""
    k = [v / sum(_FIR) * gain * 2 for v in _FIR]
    p = len(k) - 2
    return upfirdn1d(x, k, up=2, pad=((p + 1) // 2 + 1, p // 2))


def fir_down2(x: jnp.ndarray, gain: float = 1.0) -> jnp.ndarray:
    k = [v / sum(_FIR) * gain for v in _FIR]
    p = len(k) - 2
    return upfirdn1d(x, k, down=2, pad=((p + 1) // 2, p // 2))


def k_down2(x: jnp.ndarray) -> jnp.ndarray:
    """KDownsample2D intent (resnet.py:427-443): reflect-pad 1, correlate with
    (1,3,3,1)/8, stride 2.  The kernel is symmetric so correlation ==
    convolution."""
    k = [v / 8.0 for v in _FIR]
    x = jnp.pad(x, ((0, 0), (1, 1), (0, 0)), mode="reflect")
    return upfirdn1d(x, k, down=2, pad=(0, 0))


def k_up2(x: jnp.ndarray) -> jnp.ndarray:
    """KUpsample2D intent (resnet.py:444-459): reflect-pad 1, transposed conv
    stride 2 with kernel (1,3,3,1)/4, crop padding*2+1-ish back to 2T."""
    k = [v / 8.0 * 2.0 for v in _FIR]
    x = jnp.pad(x, ((0, 0), (1, 1), (0, 0)), mode="reflect")
    # conv_transpose(stride 2, padding 3) == zero-stuff + full conv, crop 3
    return upfirdn1d(x, k, up=2, pad=(len(k) - 1 - 3, len(k) - 2 - 3))


class ConvDownsample1D(nn.Module):
    """Downsample2D(use_conv=True) — k3 s2 conv; padding=0 zero-pads (0, 1)
    like the reference (resnet.py:217-221)."""

    out_channels: int
    padding: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.padding == 0:
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 0)))
            pad = [(0, 0)]
        else:
            pad = [(self.padding, self.padding)]
        return _StridedConv(self.out_channels, padding=pad, dtype=self.dtype, name="conv")(x)


class _StridedConv(nn.Module):
    features: int
    padding: list
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        import jax

        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, x.shape[-1], self.features), jnp.float32
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        out = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype), (2,), self.padding,
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        return out + bias.astype(self.dtype)


class ConvUpsample1D(nn.Module):
    """Upsample2D(use_conv=True) — nearest x2 + k3 conv."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return Conv1dSame(self.out_channels, 3, dtype=self.dtype, name="conv")(nearest_up2(x))


class FirDownsample1D(nn.Module):
    """FirDownsample2D intent: optional k3 conv fused after the FIR filter."""

    out_channels: Optional[int] = None
    use_conv: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if not self.use_conv:
            return fir_down2(x)
        k = [v / sum(_FIR) for v in _FIR]
        p = (len(k) - 2) + 2  # (kernel - factor) + (convW - 1), convW=3
        x = upfirdn1d(x, k, pad=((p + 1) // 2, p // 2))
        return _StridedConv(self.out_channels, padding=[(0, 0)], dtype=self.dtype, name="Conv1d_0")(x)


class FirUpsample1D(nn.Module):
    """FirUpsample2D intent.  The reference fuses conv_transpose + FIR as an
    optimization (resnet.py:251-296); the unfused equivalent — FIR x2
    upsample, then the k3 conv — computes the same function, and XLA fuses
    the elementwise FIR into the conv anyway.  No factory caller sets
    use_conv=True (the Skip blocks use the plain-FIR path)."""

    out_channels: Optional[int] = None
    use_conv: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if not self.use_conv:
            return fir_up2(x)
        return Conv1dSame(self.out_channels, 3, dtype=self.dtype, name="Conv1d_0")(fir_up2(x))


# --------------------------------------------------------------------------
# norms / attention variants
# --------------------------------------------------------------------------


class AdaGroupNorm1D(nn.Module):
    """AdaGroupNorm (attention.py:360-388) — non-affine GroupNorm modulated by
    a per-batch (scale, shift) from the time embedding.  The torch forward
    broadcasts ``emb[:, :, None, None]`` (2-D residue); intent is (B, 1, C)."""

    out_dim: int
    num_groups: int
    eps: float = 1e-5
    act_fn: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb):
        if self.act_fn is not None:
            emb = get_activation(self.act_fn)(emb)
        emb = nn.Dense(2 * self.out_dim, dtype=self.dtype, name="linear")(emb)
        scale, shift = jnp.split(emb[:, None, :], 2, axis=-1)
        x = nn.GroupNorm(
            num_groups=self.num_groups, epsilon=self.eps, use_bias=False, use_scale=False
        )(x).astype(self.dtype)
        return x * (1 + scale) + shift


class CrossAttention1D(nn.Module):
    """diffusers `Attention` core (attention_processor.py:26-141) on
    channels-last inputs: q from x, k/v from `context` (self-attention when
    context is None).  `bias_add` is an additive attention bias (the
    -10000-style mask the reference builds in `prepare_attention_mask`)."""

    query_dim: int
    heads: int
    dim_head: int
    cross_attention_dim: Optional[int] = None
    bias: bool = False
    out_bias: bool = True
    cross_attention_norm: Optional[str] = None
    cross_attention_norm_num_groups: int = 32
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x, context=None, bias_add=None):
        inner = self.heads * self.dim_head
        ctx = x if context is None else context
        if context is not None and self.cross_attention_norm == "layer_norm":
            ctx = nn.LayerNorm(name="norm_cross")(ctx).astype(self.dtype)
        elif context is not None and self.cross_attention_norm == "group_norm":
            ctx = nn.GroupNorm(
                num_groups=self.cross_attention_norm_num_groups, epsilon=1e-5, name="norm_cross"
            )(ctx).astype(self.dtype)
        q = nn.Dense(inner, use_bias=self.bias, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=self.bias, dtype=self.dtype, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=self.bias, dtype=self.dtype, name="to_v")(ctx)
        B, Tq = q.shape[:2]
        Tk = k.shape[1]
        out = dot_product_attention(
            q.reshape(B, Tq, self.heads, self.dim_head),
            k.reshape(B, Tk, self.heads, self.dim_head),
            v.reshape(B, Tk, self.heads, self.dim_head),
            bias=bias_add,
            impl=self.attn_impl,
        ).reshape(B, Tq, inner)
        return nn.Dense(self.query_dim, use_bias=self.out_bias, dtype=self.dtype, name="to_out_0")(out)


class AttnBlock1D(nn.Module):
    """The deprecated-style `Attention` the Attn*Block2D types instantiate
    (`_from_deprecated_attn_block=True`, group_norm + residual + rescale,
    `unet_1d_blocks.py:795-806`).  The reference's `AttnProcessor` misreads a
    (B, C, T) input as (batch, seq, dim) (attention_processor.py:376-383 has
    no 3-D spatial branch) — intent, as in the 2-D original, is attention over
    T with C features."""

    channels: int
    attention_head_dim: Optional[int] = None
    norm_num_groups: Optional[int] = 32
    eps: float = 1e-5
    rescale_output_factor: float = 1.0
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x):
        head_dim = self.attention_head_dim or self.channels
        heads = self.channels // head_dim
        h = x
        if self.norm_num_groups is not None:
            h = nn.GroupNorm(
                num_groups=self.norm_num_groups, epsilon=self.eps, name="group_norm"
            )(h).astype(self.dtype)
        # q/k/v/out live directly on the torch Attention module, so they are
        # inlined here (no nested scope) to keep the importer path mechanical
        q = nn.Dense(self.channels, use_bias=True, dtype=self.dtype, name="to_q")(h)
        k = nn.Dense(self.channels, use_bias=True, dtype=self.dtype, name="to_k")(h)
        v = nn.Dense(self.channels, use_bias=True, dtype=self.dtype, name="to_v")(h)
        B, T = q.shape[:2]
        h = dot_product_attention(
            q.reshape(B, T, heads, head_dim),
            k.reshape(B, T, heads, head_dim),
            v.reshape(B, T, heads, head_dim),
            impl=self.attn_impl,
        ).reshape(B, T, self.channels)
        h = nn.Dense(self.channels, use_bias=True, dtype=self.dtype, name="to_out_0")(h)
        return (x + h) / self.rescale_output_factor


class AddedKVAttention1D(nn.Module):
    """`Attention` with `added_kv_proj_dim` driven by `AttnAddedKVProcessor`
    (attention_processor.py:620-672): q/k/v from the group-normed x, plus
    learned k/v projections of the encoder states prepended along the key
    axis; `only_cross_attention=True` drops the self k/v entirely.  When
    encoder states are None the *un-normed* x feeds the added projections
    (the reference binds it before group_norm — kept for parity)."""

    query_dim: int
    heads: int
    dim_head: int
    added_kv_proj_dim: int
    norm_num_groups: Optional[int] = None
    only_cross_attention: bool = False
    cross_attention_norm: Optional[str] = None
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x, context=None, bias_add=None):
        inner = self.heads * self.dim_head
        residual = x
        ctx = x if context is None else context
        if context is not None and self.cross_attention_norm == "layer_norm":
            ctx = nn.LayerNorm(name="norm_cross")(ctx).astype(self.dtype)
        elif context is not None and self.cross_attention_norm == "group_norm":
            # normed over added_kv_proj_dim channels (attention_processor.py:113-124)
            ctx = nn.GroupNorm(num_groups=32, epsilon=1e-5, name="norm_cross")(ctx).astype(self.dtype)
        h = x
        if self.norm_num_groups is not None:
            h = nn.GroupNorm(
                num_groups=self.norm_num_groups, epsilon=1e-5, name="group_norm"
            )(h).astype(self.dtype)
        q = nn.Dense(inner, use_bias=True, dtype=self.dtype, name="to_q")(h)
        ek = nn.Dense(inner, dtype=self.dtype, name="add_k_proj")(ctx)
        ev = nn.Dense(inner, dtype=self.dtype, name="add_v_proj")(ctx)
        if not self.only_cross_attention:
            k = nn.Dense(inner, use_bias=True, dtype=self.dtype, name="to_k")(h)
            v = nn.Dense(inner, use_bias=True, dtype=self.dtype, name="to_v")(h)
            k = jnp.concatenate([ek, k], axis=1)
            v = jnp.concatenate([ev, v], axis=1)
        else:
            k, v = ek, ev
        B, Tq = q.shape[:2]
        Tk = k.shape[1]
        out = dot_product_attention(
            q.reshape(B, Tq, self.heads, self.dim_head),
            k.reshape(B, Tk, self.heads, self.dim_head),
            v.reshape(B, Tk, self.heads, self.dim_head),
            bias=bias_add,
            impl=self.attn_impl,
        ).reshape(B, Tq, inner)
        out = nn.Dense(self.query_dim, use_bias=True, dtype=self.dtype, name="to_out_0")(out)
        return out + residual


class GEGLU1D(nn.Module):
    inner_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(2 * self.inner_dim, dtype=self.dtype, name="proj")(x)
        a, g = jnp.split(h, 2, axis=-1)
        return a * nn.gelu(g, approximate=False)


class GELUProj1D(nn.Module):
    inner_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.gelu(nn.Dense(self.inner_dim, dtype=self.dtype, name="proj")(x), approximate=False)


class FeedForward1D(nn.Module):
    """diffusers FeedForward (attention.py): net.0 = GEGLU/GELU, net.2 = out."""

    dim: int
    mult: int = 4
    activation_fn: str = "geglu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inner = self.dim * self.mult
        if self.activation_fn == "geglu":
            h = GEGLU1D(inner, dtype=self.dtype, name="net_0")(x)
        elif self.activation_fn == "gelu":
            h = GELUProj1D(inner, dtype=self.dtype, name="net_0")(x)
        else:
            raise NotImplementedError(self.activation_fn)
        return nn.Dense(self.dim, dtype=self.dtype, name="net_2")(h)


class BasicTransformerBlock1D(nn.Module):
    """General BasicTransformerBlock (attention.py:26-204): attn1 is self-attn
    (or cross when only_cross_attention), attn2 is cross-attn over encoder
    states (self when they're None), GEGLU FF.  layer_norm variant only — the
    ada_norm variants need `num_embeds_ada_norm`, which no factory caller in
    the reference sets."""

    dim: int
    heads: int
    dim_head: int
    cross_attention_dim: Optional[int] = None
    only_cross_attention: bool = False
    double_self_attention: bool = False
    attention_bias: bool = False
    activation_fn: str = "geglu"
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x, context=None, bias_add=None, context_bias_add=None):
        h = nn.LayerNorm(name="norm1")(x).astype(self.dtype)
        ctx1 = context if self.only_cross_attention else None
        x = x + CrossAttention1D(
            self.dim, self.heads, self.dim_head,
            cross_attention_dim=self.cross_attention_dim if self.only_cross_attention else None,
            bias=self.attention_bias, dtype=self.dtype, attn_impl=self.attn_impl, name="attn1",
        )(h, ctx1, bias_add=bias_add if ctx1 is None else context_bias_add)
        if self.cross_attention_dim is not None or self.double_self_attention:
            h = nn.LayerNorm(name="norm2")(x).astype(self.dtype)
            ctx2 = None if self.double_self_attention else context
            x = x + CrossAttention1D(
                self.dim, self.heads, self.dim_head,
                cross_attention_dim=None if self.double_self_attention else self.cross_attention_dim,
                bias=self.attention_bias, dtype=self.dtype, attn_impl=self.attn_impl, name="attn2",
            )(h, ctx2, bias_add=context_bias_add if ctx2 is not None else bias_add)
        h = nn.LayerNorm(name="norm3")(x).astype(self.dtype)
        return x + FeedForward1D(self.dim, activation_fn=self.activation_fn, dtype=self.dtype, name="ff")(h)


class Transformer1D(nn.Module):
    """General Transformer2DModel continuous path (transformer_1d.py:41-326):
    GroupNorm -> proj_in -> N blocks -> proj_out -> +residual.
    `use_linear_projection` changes only the torch param layout (conv1x1 vs
    linear); channels-last both are a Dense."""

    num_attention_heads: int
    attention_head_dim: int
    in_channels: int
    num_layers: int = 1
    cross_attention_dim: Optional[int] = None
    norm_num_groups: int = 32
    only_cross_attention: bool = False
    double_self_attention: bool = False
    attention_bias: bool = False
    activation_fn: str = "geglu"
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x, context=None, bias_add=None, context_bias_add=None):
        inner = self.num_attention_heads * self.attention_head_dim
        residual = x
        h = nn.GroupNorm(
            num_groups=self.norm_num_groups, epsilon=1e-6, name="norm"
        )(x).astype(self.dtype)
        h = nn.Dense(inner, dtype=self.dtype, name="proj_in")(h)
        for i in range(self.num_layers):
            h = BasicTransformerBlock1D(
                inner, self.num_attention_heads, self.attention_head_dim,
                cross_attention_dim=self.cross_attention_dim,
                only_cross_attention=self.only_cross_attention,
                double_self_attention=self.double_self_attention,
                attention_bias=self.attention_bias,
                activation_fn=self.activation_fn,
                dtype=self.dtype, attn_impl=self.attn_impl,
                name=f"transformer_blocks_{i}",
            )(h, context, bias_add, context_bias_add)
        h = nn.Dense(self.in_channels, dtype=self.dtype, name="proj_out")(h)
        return h + residual


class DualTransformer1D(nn.Module):
    """DualTransformer2DModel (dual_transformer_1d.py): two transformers over
    token slices of the context, mixed 50/50 around the shared residual."""

    num_attention_heads: int
    attention_head_dim: int
    in_channels: int
    num_layers: int = 1
    cross_attention_dim: Optional[int] = None
    norm_num_groups: int = 32
    condition_lengths: Tuple[int, int] = (77, 257)
    transformer_index_for_condition: Tuple[int, int] = (1, 0)
    mix_ratio: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, bias_add=None):
        transformers = [
            Transformer1D(
                self.num_attention_heads, self.attention_head_dim, self.in_channels,
                num_layers=self.num_layers, cross_attention_dim=self.cross_attention_dim,
                norm_num_groups=self.norm_num_groups, dtype=self.dtype,
                name=f"transformers_{i}",
            )
            for i in range(2)
        ]
        encoded = []
        start = 0
        for i, length in enumerate(self.condition_lengths):
            ctx = context[:, start : start + length]
            idx = self.transformer_index_for_condition[i]
            encoded.append(transformers[idx](x, ctx, bias_add=bias_add) - x)
            start += length
        return encoded[0] * self.mix_ratio + encoded[1] * (1 - self.mix_ratio) + x


class KAttention1D(nn.Module):
    """KAttentionBlock (unet_1d_blocks.py:3039-3150): AdaGroupNorm-gated
    self-attn (optional) + cross-attn, no feed-forward."""

    dim: int
    num_attention_heads: int
    attention_head_dim: int
    cross_attention_dim: Optional[int] = None
    temb_channels: int = 768
    add_self_attention: bool = False
    attention_bias: bool = True
    cross_attention_norm: Optional[str] = None
    group_size: int = 32
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x, temb, context=None, bias_add=None, context_bias_add=None):
        groups = max(1, self.dim // self.group_size)
        if self.add_self_attention:
            h = AdaGroupNorm1D(self.dim, groups, dtype=self.dtype, name="norm1")(x, temb)
            x = x + CrossAttention1D(
                self.dim, self.num_attention_heads, self.attention_head_dim,
                bias=self.attention_bias, dtype=self.dtype, attn_impl=self.attn_impl, name="attn1",
            )(h, None, bias_add=bias_add)
        h = AdaGroupNorm1D(self.dim, groups, dtype=self.dtype, name="norm2")(x, temb)
        x = x + CrossAttention1D(
            self.dim, self.num_attention_heads, self.attention_head_dim,
            cross_attention_dim=self.cross_attention_dim,
            bias=self.attention_bias,
            cross_attention_norm=self.cross_attention_norm,
            dtype=self.dtype, attn_impl=self.attn_impl, name="attn2",
        )(h, context, bias_add=bias_add if context is None else context_bias_add)
        return x


# --------------------------------------------------------------------------
# the full ResnetBlock2D (resnet.py:461-645), 1-D
# --------------------------------------------------------------------------


class ResnetBlock1DFull(nn.Module):
    """Every knob of the reference ResnetBlock2D: time_embedding_norm in
    {default, scale_shift, ada_group}, skip_time_act, in-block up/down
    resampling (conv-free: nearest / avg-pool / FIR per `kernel`),
    output_scale_factor, forced shortcut, bias-free shortcut, and a distinct
    conv2 width (K up blocks)."""

    out_channels: int
    temb_channels: Optional[int] = 512
    groups: int = 32
    groups_out: Optional[int] = None
    eps: float = 1e-6
    non_linearity: str = "swish"
    skip_time_act: bool = False
    time_embedding_norm: str = "default"  # default | scale_shift | ada_group
    kernel: Optional[str] = None  # None | 'fir' | 'sde_vp'
    output_scale_factor: float = 1.0
    use_in_shortcut: Optional[bool] = None
    up: bool = False
    down: bool = False
    conv_shortcut_bias: bool = True
    conv_out_channels: Optional[int] = None
    dtype: jnp.dtype = jnp.float32
    conv_impl: str = "xla"

    def _resample(self, x):
        if self.up:
            return {"fir": fir_up2, "sde_vp": nearest_up2, None: nearest_up2}[self.kernel](x)
        return {"fir": fir_down2, "sde_vp": avg_down2, None: avg_down2}[self.kernel](x)

    @nn.compact
    def __call__(self, x, temb=None):
        act = get_activation(self.non_linearity)
        groups_out = self.groups_out if self.groups_out is not None else self.groups
        conv_out_ch = self.conv_out_channels or self.out_channels
        ada = self.time_embedding_norm == "ada_group"

        if ada:
            h = AdaGroupNorm1D(x.shape[-1], self.groups, eps=self.eps, dtype=self.dtype, name="norm1")(x, temb)
        else:
            h = nn.GroupNorm(num_groups=self.groups, epsilon=self.eps, name="norm1")(x).astype(self.dtype)
        h = act(h)
        if self.up or self.down:
            x = self._resample(x)
            h = self._resample(h)
        h = Conv1dSame(self.out_channels, 3, impl=self.conv_impl, dtype=self.dtype, name="conv1")(h)

        emb = None
        if temb is not None and self.temb_channels is not None and not ada:
            t = temb if self.skip_time_act else act(temb)
            width = 2 * self.out_channels if self.time_embedding_norm == "scale_shift" else self.out_channels
            emb = nn.Dense(width, dtype=self.dtype, name="time_emb_proj")(t)[:, None, :]
        if emb is not None and self.time_embedding_norm == "default":
            h = h + emb

        if ada:
            h = AdaGroupNorm1D(self.out_channels, groups_out, eps=self.eps, dtype=self.dtype, name="norm2")(h, temb)
        else:
            h = nn.GroupNorm(num_groups=groups_out, epsilon=self.eps, name="norm2")(h).astype(self.dtype)
        if emb is not None and self.time_embedding_norm == "scale_shift":
            scale, shift = jnp.split(emb, 2, axis=-1)
            h = h * (1 + scale) + shift
        h = act(h)
        h = Conv1dSame(conv_out_ch, 3, impl=self.conv_impl, dtype=self.dtype, name="conv2")(h)

        use_sc = (x.shape[-1] != conv_out_ch) if self.use_in_shortcut is None else self.use_in_shortcut
        if use_sc:
            x = Conv1dSame(
                conv_out_ch, 1, impl=self.conv_impl, dtype=self.dtype,
                use_bias=self.conv_shortcut_bias, name="conv_shortcut",
            )(x)
        return (x + h) / self.output_scale_factor


# --------------------------------------------------------------------------
# down blocks (unet_1d_blocks.py:749-1876)
# --------------------------------------------------------------------------


class DownBlock1D(nn.Module):
    """DownBlock2D (unet_1d_blocks.py:1018-1097)."""

    out_channels: int
    temb_channels: Optional[int]
    num_layers: int = 1
    resnet_eps: float = 1e-6
    resnet_time_scale_shift: str = "default"
    resnet_act_fn: str = "swish"
    resnet_groups: int = 32
    output_scale_factor: float = 1.0
    add_downsample: bool = True
    downsample_padding: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb=None):
        skips = ()
        for i in range(self.num_layers):
            x = ResnetBlock1DFull(
                self.out_channels, self.temb_channels, groups=self.resnet_groups,
                eps=self.resnet_eps, non_linearity=self.resnet_act_fn,
                time_embedding_norm=self.resnet_time_scale_shift,
                output_scale_factor=self.output_scale_factor,
                dtype=self.dtype, name=f"resnets_{i}",
            )(x, temb)
            skips += (x,)
        if self.add_downsample:
            x = ConvDownsample1D(
                self.out_channels, padding=self.downsample_padding,
                dtype=self.dtype, name="downsamplers_0",
            )(x)
            skips += (x,)
        return x, skips


class ResnetDownsampleBlock1D(nn.Module):
    """ResnetDownsampleBlock2D (unet_1d_blocks.py:1423-1514): downsampling via
    a down=True resnet (the reference's avg-pool inside it is 2-D residue;
    here it is a correct T-axis avg-pool)."""

    out_channels: int
    temb_channels: Optional[int]
    num_layers: int = 1
    resnet_eps: float = 1e-6
    resnet_time_scale_shift: str = "default"
    resnet_act_fn: str = "swish"
    resnet_groups: int = 32
    output_scale_factor: float = 1.0
    add_downsample: bool = True
    skip_time_act: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb=None):
        skips = ()
        for i in range(self.num_layers):
            x = ResnetBlock1DFull(
                self.out_channels, self.temb_channels, groups=self.resnet_groups,
                eps=self.resnet_eps, non_linearity=self.resnet_act_fn,
                time_embedding_norm=self.resnet_time_scale_shift,
                output_scale_factor=self.output_scale_factor,
                skip_time_act=self.skip_time_act,
                dtype=self.dtype, name=f"resnets_{i}",
            )(x, temb)
            skips += (x,)
        if self.add_downsample:
            x = ResnetBlock1DFull(
                self.out_channels, self.temb_channels, groups=self.resnet_groups,
                eps=self.resnet_eps, non_linearity=self.resnet_act_fn,
                time_embedding_norm=self.resnet_time_scale_shift,
                output_scale_factor=self.output_scale_factor,
                skip_time_act=self.skip_time_act, down=True,
                dtype=self.dtype, name="downsamplers_0",
            )(x, temb)
            skips += (x,)
        return x, skips


class AttnDownBlock1D(nn.Module):
    """AttnDownBlock2D (unet_1d_blocks.py:749-858)."""

    out_channels: int
    temb_channels: Optional[int]
    num_layers: int = 1
    resnet_eps: float = 1e-6
    resnet_time_scale_shift: str = "default"
    resnet_act_fn: str = "swish"
    resnet_groups: int = 32
    attention_head_dim: Optional[int] = 1
    output_scale_factor: float = 1.0
    downsample_padding: int = 1
    downsample_type: Optional[str] = "conv"  # 'conv' | 'resnet' | None
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x, temb=None):
        head_dim = self.attention_head_dim or self.out_channels
        skips = ()
        for i in range(self.num_layers):
            x = ResnetBlock1DFull(
                self.out_channels, self.temb_channels, groups=self.resnet_groups,
                eps=self.resnet_eps, non_linearity=self.resnet_act_fn,
                time_embedding_norm=self.resnet_time_scale_shift,
                output_scale_factor=self.output_scale_factor,
                dtype=self.dtype, name=f"resnets_{i}",
            )(x, temb)
            x = AttnBlock1D(
                self.out_channels, head_dim, norm_num_groups=self.resnet_groups,
                eps=self.resnet_eps, rescale_output_factor=self.output_scale_factor,
                dtype=self.dtype, attn_impl=self.attn_impl, name=f"attentions_{i}",
            )(x)
            skips += (x,)
        if self.downsample_type == "conv":
            x = ConvDownsample1D(
                self.out_channels, padding=self.downsample_padding,
                dtype=self.dtype, name="downsamplers_0",
            )(x)
            skips += (x,)
        elif self.downsample_type == "resnet":
            x = ResnetBlock1DFull(
                self.out_channels, self.temb_channels, groups=self.resnet_groups,
                eps=self.resnet_eps, non_linearity=self.resnet_act_fn,
                time_embedding_norm=self.resnet_time_scale_shift,
                output_scale_factor=self.output_scale_factor, down=True,
                dtype=self.dtype, name="downsamplers_0",
            )(x, temb)
            skips += (x,)
        return x, skips


class CrossAttnDownBlock1D(nn.Module):
    """CrossAttnDownBlock2D (unet_1d_blocks.py:861-1015)."""

    out_channels: int
    temb_channels: Optional[int]
    num_layers: int = 1
    transformer_layers_per_block: int = 1
    resnet_eps: float = 1e-6
    resnet_time_scale_shift: str = "default"
    resnet_act_fn: str = "swish"
    resnet_groups: int = 32
    num_attention_heads: int = 1
    cross_attention_dim: int = 1280
    output_scale_factor: float = 1.0
    downsample_padding: int = 1
    add_downsample: bool = True
    dual_cross_attention: bool = False
    only_cross_attention: bool = False
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x, temb=None, context=None, bias_add=None, context_bias_add=None,
                 additional_residuals=None):
        skips = ()
        for i in range(self.num_layers):
            x = ResnetBlock1DFull(
                self.out_channels, self.temb_channels, groups=self.resnet_groups,
                eps=self.resnet_eps, non_linearity=self.resnet_act_fn,
                time_embedding_norm=self.resnet_time_scale_shift,
                output_scale_factor=self.output_scale_factor,
                dtype=self.dtype, name=f"resnets_{i}",
            )(x, temb)
            if self.dual_cross_attention:
                x = DualTransformer1D(
                    self.num_attention_heads, self.out_channels // self.num_attention_heads,
                    self.out_channels, num_layers=1,
                    cross_attention_dim=self.cross_attention_dim,
                    norm_num_groups=self.resnet_groups,
                    dtype=self.dtype, name=f"attentions_{i}",
                )(x, context, bias_add=context_bias_add)
            else:
                x = Transformer1D(
                    self.num_attention_heads, self.out_channels // self.num_attention_heads,
                    self.out_channels, num_layers=self.transformer_layers_per_block,
                    cross_attention_dim=self.cross_attention_dim,
                    norm_num_groups=self.resnet_groups,
                    only_cross_attention=self.only_cross_attention,
                    dtype=self.dtype, attn_impl=self.attn_impl, name=f"attentions_{i}",
                )(x, context, bias_add, context_bias_add)
            # T2I-adapter hook: added to the LAST pair's output, so it lands
            # in that skip too (unet_1d_blocks.py:1001-1004)
            if additional_residuals is not None and i == self.num_layers - 1:
                x = x + additional_residuals
            skips += (x,)
        if self.add_downsample:
            x = ConvDownsample1D(
                self.out_channels, padding=self.downsample_padding,
                dtype=self.dtype, name="downsamplers_0",
            )(x)
            skips += (x,)
        return x, skips


class SimpleCrossAttnDownBlock1D(nn.Module):
    """SimpleCrossAttnDownBlock2D (unet_1d_blocks.py:1516-1673): added-KV
    attention instead of transformer blocks; resnet downsampler."""

    out_channels: int
    temb_channels: Optional[int]
    num_layers: int = 1
    resnet_eps: float = 1e-6
    resnet_time_scale_shift: str = "default"
    resnet_act_fn: str = "swish"
    resnet_groups: int = 32
    attention_head_dim: int = 1
    cross_attention_dim: int = 1280
    output_scale_factor: float = 1.0
    add_downsample: bool = True
    skip_time_act: bool = False
    only_cross_attention: bool = False
    cross_attention_norm: Optional[str] = None
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x, temb=None, context=None, bias_add=None):
        heads = self.out_channels // self.attention_head_dim
        skips = ()
        for i in range(self.num_layers):
            x = ResnetBlock1DFull(
                self.out_channels, self.temb_channels, groups=self.resnet_groups,
                eps=self.resnet_eps, non_linearity=self.resnet_act_fn,
                time_embedding_norm=self.resnet_time_scale_shift,
                output_scale_factor=self.output_scale_factor,
                skip_time_act=self.skip_time_act,
                dtype=self.dtype, name=f"resnets_{i}",
            )(x, temb)
            x = AddedKVAttention1D(
                self.out_channels, heads, self.attention_head_dim,
                added_kv_proj_dim=self.cross_attention_dim,
                norm_num_groups=self.resnet_groups,
                only_cross_attention=self.only_cross_attention,
                cross_attention_norm=self.cross_attention_norm,
                dtype=self.dtype, attn_impl=self.attn_impl, name=f"attentions_{i}",
            )(x, context, bias_add=bias_add)
            skips += (x,)
        if self.add_downsample:
            x = ResnetBlock1DFull(
                self.out_channels, self.temb_channels, groups=self.resnet_groups,
                eps=self.resnet_eps, non_linearity=self.resnet_act_fn,
                time_embedding_norm=self.resnet_time_scale_shift,
                output_scale_factor=self.output_scale_factor,
                skip_time_act=self.skip_time_act, down=True,
                dtype=self.dtype, name="downsamplers_0",
            )(x, temb)
            skips += (x,)
        return x, skips


class SkipDownBlock1D(nn.Module):
    """SkipDownBlock2D (unet_1d_blocks.py:1344-1421): score-SDE style — a FIR
    pyramid of the raw input rides alongside and is injected after the FIR
    down-resnet.  The reference's skip_conv is Conv2d(3, C) (image RGB
    residue); here the skip sample keeps the model's own input channel count
    (`skip_channels`)."""

    out_channels: int
    temb_channels: Optional[int]
    skip_channels: int = 1
    num_layers: int = 1
    resnet_eps: float = 1e-6
    resnet_time_scale_shift: str = "default"
    resnet_act_fn: str = "swish"
    output_scale_factor: float = 2.0 ** 0.5
    add_downsample: bool = True
    with_attention: bool = False
    attention_head_dim: Optional[int] = 1
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x, temb=None, skip_sample=None):
        skips = ()
        in_ch = x.shape[-1]
        for i in range(self.num_layers):
            cin = in_ch if i == 0 else self.out_channels
            x = ResnetBlock1DFull(
                self.out_channels, self.temb_channels,
                groups=min(cin // 4, 32), groups_out=min(self.out_channels // 4, 32),
                eps=self.resnet_eps, non_linearity=self.resnet_act_fn,
                time_embedding_norm=self.resnet_time_scale_shift,
                output_scale_factor=self.output_scale_factor,
                dtype=self.dtype, name=f"resnets_{i}",
            )(x, temb)
            if self.with_attention:
                head_dim = self.attention_head_dim or self.out_channels
                x = AttnBlock1D(
                    self.out_channels, head_dim, norm_num_groups=32,
                    eps=self.resnet_eps, rescale_output_factor=self.output_scale_factor,
                    dtype=self.dtype, attn_impl=self.attn_impl, name=f"attentions_{i}",
                )(x)
            skips += (x,)
        if self.add_downsample:
            x = ResnetBlock1DFull(
                self.out_channels, self.temb_channels,
                groups=min(self.out_channels // 4, 32),
                eps=self.resnet_eps, non_linearity=self.resnet_act_fn,
                time_embedding_norm=self.resnet_time_scale_shift,
                output_scale_factor=self.output_scale_factor,
                use_in_shortcut=True, down=True, kernel="fir",
                dtype=self.dtype, name="resnet_down",
            )(x, temb)
            skip_sample = fir_down2(skip_sample)
            x = Conv1dSame(self.out_channels, 1, dtype=self.dtype, name="skip_conv")(skip_sample) + x
            skips += (x,)
        return x, skips, skip_sample


class DownEncoderBlock1D(nn.Module):
    """DownEncoderBlock2D / AttnDownEncoderBlock2D (unet_1d_blocks.py:
    1099-1241): no time conditioning, single output (VAE-encoder style)."""

    out_channels: int
    num_layers: int = 1
    resnet_eps: float = 1e-6
    resnet_time_scale_shift: str = "default"
    resnet_act_fn: str = "swish"
    resnet_groups: int = 32
    output_scale_factor: float = 1.0
    add_downsample: bool = True
    downsample_padding: int = 1
    with_attention: bool = False
    attention_head_dim: Optional[int] = 1
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x, temb=None):
        del temb
        for i in range(self.num_layers):
            x = ResnetBlock1DFull(
                self.out_channels, temb_channels=None, groups=self.resnet_groups,
                eps=self.resnet_eps, non_linearity=self.resnet_act_fn,
                time_embedding_norm=self.resnet_time_scale_shift,
                output_scale_factor=self.output_scale_factor,
                dtype=self.dtype, name=f"resnets_{i}",
            )(x, None)
            if self.with_attention:
                head_dim = self.attention_head_dim or self.out_channels
                x = AttnBlock1D(
                    self.out_channels, head_dim, norm_num_groups=self.resnet_groups,
                    eps=self.resnet_eps, rescale_output_factor=self.output_scale_factor,
                    dtype=self.dtype, attn_impl=self.attn_impl, name=f"attentions_{i}",
                )(x)
        if self.add_downsample:
            x = ConvDownsample1D(
                self.out_channels, padding=self.downsample_padding,
                dtype=self.dtype, name="downsamplers_0",
            )(x)
        return x, ()


class KDownBlock1D(nn.Module):
    """KDownBlock2D (unet_1d_blocks.py:1675-1746): ada_group resnets,
    bias-free shortcuts, k-filter downsample."""

    out_channels: int
    temb_channels: Optional[int]
    num_layers: int = 4
    resnet_eps: float = 1e-5
    resnet_act_fn: str = "gelu"
    resnet_group_size: int = 32
    add_downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb=None):
        skips = ()
        for i in range(self.num_layers):
            cin = x.shape[-1]
            x = ResnetBlock1DFull(
                self.out_channels, self.temb_channels,
                groups=cin // self.resnet_group_size,
                groups_out=self.out_channels // self.resnet_group_size,
                eps=self.resnet_eps, non_linearity=self.resnet_act_fn,
                time_embedding_norm="ada_group", conv_shortcut_bias=False,
                dtype=self.dtype, name=f"resnets_{i}",
            )(x, temb)
            skips += (x,)
        if self.add_downsample:
            x = k_down2(x)
        return x, skips


class KCrossAttnDownBlock1D(nn.Module):
    """KCrossAttnDownBlock2D (unet_1d_blocks.py:1748-1874)."""

    out_channels: int
    temb_channels: Optional[int]
    cross_attention_dim: int
    num_layers: int = 4
    resnet_group_size: int = 32
    add_downsample: bool = True
    attention_head_dim: int = 64
    add_self_attention: bool = False
    resnet_eps: float = 1e-5
    resnet_act_fn: str = "gelu"
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x, temb=None, context=None, bias_add=None, context_bias_add=None):
        skips = ()
        for i in range(self.num_layers):
            cin = x.shape[-1]
            x = ResnetBlock1DFull(
                self.out_channels, self.temb_channels,
                groups=cin // self.resnet_group_size,
                groups_out=self.out_channels // self.resnet_group_size,
                eps=self.resnet_eps, non_linearity=self.resnet_act_fn,
                time_embedding_norm="ada_group", conv_shortcut_bias=False,
                dtype=self.dtype, name=f"resnets_{i}",
            )(x, temb)
            x = KAttention1D(
                self.out_channels, self.out_channels // self.attention_head_dim,
                self.attention_head_dim, cross_attention_dim=self.cross_attention_dim,
                temb_channels=self.temb_channels, attention_bias=True,
                add_self_attention=self.add_self_attention,
                cross_attention_norm="layer_norm", group_size=self.resnet_group_size,
                dtype=self.dtype, attn_impl=self.attn_impl, name=f"attentions_{i}",
            )(x, temb, context, bias_add, context_bias_add)
            # the reference emits None skips when not downsampling (k-unet
            # wiring: only the pre-downsample feature is consumed)
            skips += (x if self.add_downsample else None,)
        if self.add_downsample:
            x = k_down2(x)
        return x, skips


# --------------------------------------------------------------------------
# up blocks (unet_1d_blocks.py:1876-3037)
# --------------------------------------------------------------------------


class UpBlock1D(nn.Module):
    """UpBlock2D (unet_1d_blocks.py:2133-2207): per layer, concat one popped
    skip then resnet; optional conv upsample."""

    out_channels: int
    temb_channels: Optional[int]
    num_layers: int = 1
    resnet_eps: float = 1e-6
    resnet_time_scale_shift: str = "default"
    resnet_act_fn: str = "swish"
    resnet_groups: int = 32
    output_scale_factor: float = 1.0
    add_upsample: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skips, temb=None):
        skips = list(skips)
        for i in range(self.num_layers):
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = ResnetBlock1DFull(
                self.out_channels, self.temb_channels, groups=self.resnet_groups,
                eps=self.resnet_eps, non_linearity=self.resnet_act_fn,
                time_embedding_norm=self.resnet_time_scale_shift,
                output_scale_factor=self.output_scale_factor,
                dtype=self.dtype, name=f"resnets_{i}",
            )(x, temb)
        if self.add_upsample:
            x = ConvUpsample1D(self.out_channels, dtype=self.dtype, name="upsamplers_0")(x)
        return x


class ResnetUpsampleBlock1D(nn.Module):
    """ResnetUpsampleBlock2D (unet_1d_blocks.py:2558-2651)."""

    out_channels: int
    temb_channels: Optional[int]
    num_layers: int = 1
    resnet_eps: float = 1e-6
    resnet_time_scale_shift: str = "default"
    resnet_act_fn: str = "swish"
    resnet_groups: int = 32
    output_scale_factor: float = 1.0
    add_upsample: bool = True
    skip_time_act: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skips, temb=None):
        skips = list(skips)
        for i in range(self.num_layers):
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = ResnetBlock1DFull(
                self.out_channels, self.temb_channels, groups=self.resnet_groups,
                eps=self.resnet_eps, non_linearity=self.resnet_act_fn,
                time_embedding_norm=self.resnet_time_scale_shift,
                output_scale_factor=self.output_scale_factor,
                skip_time_act=self.skip_time_act,
                dtype=self.dtype, name=f"resnets_{i}",
            )(x, temb)
        if self.add_upsample:
            x = ResnetBlock1DFull(
                self.out_channels, self.temb_channels, groups=self.resnet_groups,
                eps=self.resnet_eps, non_linearity=self.resnet_act_fn,
                time_embedding_norm=self.resnet_time_scale_shift,
                output_scale_factor=self.output_scale_factor,
                skip_time_act=self.skip_time_act, up=True,
                dtype=self.dtype, name="upsamplers_0",
            )(x, temb)
        return x


class AttnUpBlock1D(nn.Module):
    """AttnUpBlock2D (unet_1d_blocks.py:1876-1983)."""

    out_channels: int
    temb_channels: Optional[int]
    num_layers: int = 1
    resnet_eps: float = 1e-6
    resnet_time_scale_shift: str = "default"
    resnet_act_fn: str = "swish"
    resnet_groups: int = 32
    attention_head_dim: Optional[int] = 1
    output_scale_factor: float = 1.0
    upsample_type: Optional[str] = "conv"  # 'conv' | 'resnet' | None
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x, skips, temb=None):
        head_dim = self.attention_head_dim or self.out_channels
        skips = list(skips)
        for i in range(self.num_layers):
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = ResnetBlock1DFull(
                self.out_channels, self.temb_channels, groups=self.resnet_groups,
                eps=self.resnet_eps, non_linearity=self.resnet_act_fn,
                time_embedding_norm=self.resnet_time_scale_shift,
                output_scale_factor=self.output_scale_factor,
                dtype=self.dtype, name=f"resnets_{i}",
            )(x, temb)
            x = AttnBlock1D(
                self.out_channels, head_dim, norm_num_groups=self.resnet_groups,
                eps=self.resnet_eps, rescale_output_factor=self.output_scale_factor,
                dtype=self.dtype, attn_impl=self.attn_impl, name=f"attentions_{i}",
            )(x)
        if self.upsample_type == "conv":
            x = ConvUpsample1D(self.out_channels, dtype=self.dtype, name="upsamplers_0")(x)
        elif self.upsample_type == "resnet":
            x = ResnetBlock1DFull(
                self.out_channels, self.temb_channels, groups=self.resnet_groups,
                eps=self.resnet_eps, non_linearity=self.resnet_act_fn,
                time_embedding_norm=self.resnet_time_scale_shift,
                output_scale_factor=self.output_scale_factor, up=True,
                dtype=self.dtype, name="upsamplers_0",
            )(x, temb)
        return x


class CrossAttnUpBlock1D(nn.Module):
    """CrossAttnUpBlock2D (unet_1d_blocks.py:1985-2131)."""

    out_channels: int
    temb_channels: Optional[int]
    num_layers: int = 1
    transformer_layers_per_block: int = 1
    resnet_eps: float = 1e-6
    resnet_time_scale_shift: str = "default"
    resnet_act_fn: str = "swish"
    resnet_groups: int = 32
    num_attention_heads: int = 1
    cross_attention_dim: int = 1280
    output_scale_factor: float = 1.0
    add_upsample: bool = True
    dual_cross_attention: bool = False
    only_cross_attention: bool = False
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x, skips, temb=None, context=None, bias_add=None, context_bias_add=None):
        skips = list(skips)
        for i in range(self.num_layers):
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = ResnetBlock1DFull(
                self.out_channels, self.temb_channels, groups=self.resnet_groups,
                eps=self.resnet_eps, non_linearity=self.resnet_act_fn,
                time_embedding_norm=self.resnet_time_scale_shift,
                output_scale_factor=self.output_scale_factor,
                dtype=self.dtype, name=f"resnets_{i}",
            )(x, temb)
            if self.dual_cross_attention:
                x = DualTransformer1D(
                    self.num_attention_heads, self.out_channels // self.num_attention_heads,
                    self.out_channels, num_layers=1,
                    cross_attention_dim=self.cross_attention_dim,
                    norm_num_groups=self.resnet_groups,
                    dtype=self.dtype, name=f"attentions_{i}",
                )(x, context, bias_add=context_bias_add)
            else:
                x = Transformer1D(
                    self.num_attention_heads, self.out_channels // self.num_attention_heads,
                    self.out_channels, num_layers=self.transformer_layers_per_block,
                    cross_attention_dim=self.cross_attention_dim,
                    norm_num_groups=self.resnet_groups,
                    only_cross_attention=self.only_cross_attention,
                    dtype=self.dtype, attn_impl=self.attn_impl, name=f"attentions_{i}",
                )(x, context, bias_add, context_bias_add)
        if self.add_upsample:
            x = ConvUpsample1D(self.out_channels, dtype=self.dtype, name="upsamplers_0")(x)
        return x


class SimpleCrossAttnUpBlock1D(nn.Module):
    """SimpleCrossAttnUpBlock2D (unet_1d_blocks.py:2653-2815)."""

    out_channels: int
    temb_channels: Optional[int]
    num_layers: int = 1
    resnet_eps: float = 1e-6
    resnet_time_scale_shift: str = "default"
    resnet_act_fn: str = "swish"
    resnet_groups: int = 32
    attention_head_dim: int = 1
    cross_attention_dim: int = 1280
    output_scale_factor: float = 1.0
    add_upsample: bool = True
    skip_time_act: bool = False
    only_cross_attention: bool = False
    cross_attention_norm: Optional[str] = None
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x, skips, temb=None, context=None, bias_add=None):
        heads = self.out_channels // self.attention_head_dim
        skips = list(skips)
        for i in range(self.num_layers):
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = ResnetBlock1DFull(
                self.out_channels, self.temb_channels, groups=self.resnet_groups,
                eps=self.resnet_eps, non_linearity=self.resnet_act_fn,
                time_embedding_norm=self.resnet_time_scale_shift,
                output_scale_factor=self.output_scale_factor,
                skip_time_act=self.skip_time_act,
                dtype=self.dtype, name=f"resnets_{i}",
            )(x, temb)
            x = AddedKVAttention1D(
                self.out_channels, heads, self.attention_head_dim,
                added_kv_proj_dim=self.cross_attention_dim,
                norm_num_groups=self.resnet_groups,
                only_cross_attention=self.only_cross_attention,
                cross_attention_norm=self.cross_attention_norm,
                dtype=self.dtype, attn_impl=self.attn_impl, name=f"attentions_{i}",
            )(x, context, bias_add=bias_add)
        if self.add_upsample:
            x = ResnetBlock1DFull(
                self.out_channels, self.temb_channels, groups=self.resnet_groups,
                eps=self.resnet_eps, non_linearity=self.resnet_act_fn,
                time_embedding_norm=self.resnet_time_scale_shift,
                output_scale_factor=self.output_scale_factor,
                skip_time_act=self.skip_time_act, up=True,
                dtype=self.dtype, name="upsamplers_0",
            )(x, temb)
        return x


class SkipUpBlock1D(nn.Module):
    """SkipUpBlock2D / AttnSkipUpBlock2D (unet_1d_blocks.py:2344-2556): the
    score-SDE skip pyramid on the way up — the hidden state contributes
    `skip_conv(act(skip_norm(h)))` to the FIR-upsampled skip sample.  The
    reference's group-count expression for AttnSkip resnets has an operator-
    precedence slip (`min(in + skip // 4, 32)`, :1267); intent
    (`min((in + skip) // 4, 32)`, as SkipUpBlock2D :2398 does) is used for
    both."""

    out_channels: int
    temb_channels: Optional[int]
    skip_channels: int = 1
    num_layers: int = 1
    resnet_eps: float = 1e-6
    resnet_time_scale_shift: str = "default"
    resnet_act_fn: str = "swish"
    output_scale_factor: float = 2.0 ** 0.5
    add_upsample: bool = True
    with_attention: bool = False
    attention_head_dim: Optional[int] = 1
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x, skips, temb=None, skip_sample=None):
        skips = list(skips)
        for i in range(self.num_layers):
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            cin = x.shape[-1]
            x = ResnetBlock1DFull(
                self.out_channels, self.temb_channels,
                groups=min(cin // 4, 32), groups_out=min(self.out_channels // 4, 32),
                eps=self.resnet_eps, non_linearity=self.resnet_act_fn,
                time_embedding_norm=self.resnet_time_scale_shift,
                output_scale_factor=self.output_scale_factor,
                dtype=self.dtype, name=f"resnets_{i}",
            )(x, temb)
        if self.with_attention:
            head_dim = self.attention_head_dim or self.out_channels
            x = AttnBlock1D(
                self.out_channels, head_dim, norm_num_groups=32,
                eps=self.resnet_eps, rescale_output_factor=self.output_scale_factor,
                dtype=self.dtype, attn_impl=self.attn_impl, name="attentions_0",
            )(x)
        skip_sample = fir_up2(skip_sample) if skip_sample is not None else 0.0
        if self.add_upsample:
            s = nn.GroupNorm(
                num_groups=min(self.out_channels // 4, 32), epsilon=self.resnet_eps,
                name="skip_norm",
            )(x).astype(self.dtype)
            s = nn.silu(s)
            s = Conv1dSame(self.skip_channels, 3, dtype=self.dtype, name="skip_conv")(s)
            skip_sample = skip_sample + s
            x = ResnetBlock1DFull(
                self.out_channels, self.temb_channels,
                groups=min(self.out_channels // 4, 32),
                groups_out=min(self.out_channels // 4, 32),
                eps=self.resnet_eps, non_linearity=self.resnet_act_fn,
                time_embedding_norm=self.resnet_time_scale_shift,
                output_scale_factor=self.output_scale_factor,
                use_in_shortcut=True, up=True, kernel="fir",
                dtype=self.dtype, name="resnet_up",
            )(x, temb)
        return x, skip_sample


class UpDecoderBlock1D(nn.Module):
    """UpDecoderBlock2D / AttnUpDecoderBlock2D (unet_1d_blocks.py:2209-2342):
    no skips (VAE-decoder style)."""

    out_channels: int
    temb_channels: Optional[int] = None
    num_layers: int = 1
    resnet_eps: float = 1e-6
    resnet_time_scale_shift: str = "default"
    resnet_act_fn: str = "swish"
    resnet_groups: int = 32
    output_scale_factor: float = 1.0
    add_upsample: bool = True
    with_attention: bool = False
    attention_head_dim: Optional[int] = 1
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x, temb=None):
        for i in range(self.num_layers):
            x = ResnetBlock1DFull(
                self.out_channels, self.temb_channels, groups=self.resnet_groups,
                eps=self.resnet_eps, non_linearity=self.resnet_act_fn,
                time_embedding_norm=self.resnet_time_scale_shift,
                output_scale_factor=self.output_scale_factor,
                dtype=self.dtype, name=f"resnets_{i}",
            )(x, temb)
            if self.with_attention:
                head_dim = self.attention_head_dim or self.out_channels
                x = AttnBlock1D(
                    self.out_channels, head_dim, norm_num_groups=self.resnet_groups,
                    eps=self.resnet_eps, rescale_output_factor=self.output_scale_factor,
                    dtype=self.dtype, attn_impl=self.attn_impl, name=f"attentions_{i}",
                )(x)
        if self.add_upsample:
            x = ConvUpsample1D(self.out_channels, dtype=self.dtype, name="upsamplers_0")(x)
        return x


class KUpBlock1D(nn.Module):
    """KUpBlock2D (unet_1d_blocks.py:2817-2890): k-unet wiring — one skip
    concat up front, k_in = 2*out, k_out = in_channels, num_layers-1 resnets."""

    in_channels: int
    out_channels: int
    temb_channels: Optional[int]
    num_layers: int = 5
    resnet_eps: float = 1e-5
    resnet_act_fn: str = "gelu"
    resnet_group_size: int = 32
    add_upsample: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skips, temb=None):
        if skips and skips[-1] is not None:
            x = jnp.concatenate([x, skips[-1]], axis=-1)
        k_out = self.in_channels
        n = self.num_layers - 1
        for i in range(n):
            cin = x.shape[-1]
            x = ResnetBlock1DFull(
                k_out if i == n - 1 else self.out_channels, self.temb_channels,
                groups=cin // self.resnet_group_size,
                groups_out=self.out_channels // self.resnet_group_size,
                eps=self.resnet_eps, non_linearity=self.resnet_act_fn,
                time_embedding_norm="ada_group", conv_shortcut_bias=False,
                dtype=self.dtype, name=f"resnets_{i}",
            )(x, temb)
        if self.add_upsample:
            x = k_up2(x)
        return x


class KCrossAttnUpBlock1D(nn.Module):
    """KCrossAttnUpBlock2D (unet_1d_blocks.py:2892-3037)."""

    in_channels: int
    out_channels: int
    temb_channels: Optional[int]
    cross_attention_dim: int = 768
    num_layers: int = 4
    resnet_eps: float = 1e-5
    resnet_act_fn: str = "gelu"
    resnet_group_size: int = 32
    attention_head_dim: int = 1
    add_upsample: bool = True
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x, skips, temb=None, context=None, bias_add=None, context_bias_add=None):
        is_first = self.in_channels == self.out_channels == self.temb_channels
        is_middle = self.in_channels != self.out_channels
        if skips and skips[-1] is not None:
            x = jnp.concatenate([x, skips[-1]], axis=-1)
        k_out = self.in_channels
        n = self.num_layers - 1
        for i in range(n):
            cin = x.shape[-1]
            last = i == n - 1
            x = ResnetBlock1DFull(
                self.out_channels, self.temb_channels,
                groups=cin // self.resnet_group_size,
                groups_out=self.out_channels // self.resnet_group_size,
                eps=self.resnet_eps, non_linearity=self.resnet_act_fn,
                time_embedding_norm="ada_group", conv_shortcut_bias=False,
                conv_out_channels=k_out if (is_middle and last) else None,
                dtype=self.dtype, name=f"resnets_{i}",
            )(x, temb)
            dim = k_out if last else self.out_channels
            x = KAttention1D(
                dim, dim // self.attention_head_dim, self.attention_head_dim,
                cross_attention_dim=self.cross_attention_dim,
                temb_channels=self.temb_channels, attention_bias=True,
                add_self_attention=is_first, cross_attention_norm="layer_norm",
                dtype=self.dtype, attn_impl=self.attn_impl, name=f"attentions_{i}",
            )(x, temb, context, bias_add, context_bias_add)
        if self.add_upsample:
            x = k_up2(x)
        return x


# --------------------------------------------------------------------------
# mid blocks (unet_1d_blocks.py:425-749)
# --------------------------------------------------------------------------


class MidBlock1D(nn.Module):
    """UNetMidBlock2D (unet_1d_blocks.py:425-513): resnet, then num_layers x
    [deprecated-attention, resnet]."""

    in_channels: int
    temb_channels: Optional[int]
    num_layers: int = 1
    resnet_eps: float = 1e-6
    resnet_time_scale_shift: str = "default"
    resnet_act_fn: str = "swish"
    resnet_groups: Optional[int] = 32
    add_attention: bool = True
    attention_head_dim: Optional[int] = 1
    output_scale_factor: float = 1.0
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x, temb=None):
        groups = self.resnet_groups if self.resnet_groups is not None else min(self.in_channels // 4, 32)

        def res(i):
            return ResnetBlock1DFull(
                self.in_channels, self.temb_channels, groups=groups,
                eps=self.resnet_eps, non_linearity=self.resnet_act_fn,
                time_embedding_norm=self.resnet_time_scale_shift,
                output_scale_factor=self.output_scale_factor,
                dtype=self.dtype, name=f"resnets_{i}",
            )

        x = res(0)(x, temb)
        head_dim = self.attention_head_dim or self.in_channels
        for i in range(self.num_layers):
            if self.add_attention:
                x = AttnBlock1D(
                    self.in_channels, head_dim, norm_num_groups=groups,
                    eps=self.resnet_eps, rescale_output_factor=self.output_scale_factor,
                    dtype=self.dtype, attn_impl=self.attn_impl, name=f"attentions_{i}",
                )(x)
            x = res(i + 1)(x, temb)
        return x


class MidBlock1DCrossAttn(nn.Module):
    """UNetMidBlock2DCrossAttn (unet_1d_blocks.py:516-624)."""

    in_channels: int
    temb_channels: Optional[int]
    num_layers: int = 1
    transformer_layers_per_block: int = 1
    resnet_eps: float = 1e-6
    resnet_time_scale_shift: str = "default"
    resnet_act_fn: str = "swish"
    resnet_groups: Optional[int] = 32
    num_attention_heads: int = 1
    output_scale_factor: float = 1.0
    cross_attention_dim: int = 1280
    dual_cross_attention: bool = False
    only_cross_attention: bool = False
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x, temb=None, context=None, bias_add=None, context_bias_add=None):
        groups = self.resnet_groups if self.resnet_groups is not None else min(self.in_channels // 4, 32)

        def res(i):
            return ResnetBlock1DFull(
                self.in_channels, self.temb_channels, groups=groups,
                eps=self.resnet_eps, non_linearity=self.resnet_act_fn,
                time_embedding_norm=self.resnet_time_scale_shift,
                output_scale_factor=self.output_scale_factor,
                dtype=self.dtype, name=f"resnets_{i}",
            )

        x = res(0)(x, temb)
        for i in range(self.num_layers):
            if self.dual_cross_attention:
                x = DualTransformer1D(
                    self.num_attention_heads, self.in_channels // self.num_attention_heads,
                    self.in_channels, num_layers=1,
                    cross_attention_dim=self.cross_attention_dim,
                    norm_num_groups=groups, dtype=self.dtype, name=f"attentions_{i}",
                )(x, context, bias_add=context_bias_add)
            else:
                x = Transformer1D(
                    self.num_attention_heads, self.in_channels // self.num_attention_heads,
                    self.in_channels, num_layers=self.transformer_layers_per_block,
                    cross_attention_dim=self.cross_attention_dim,
                    norm_num_groups=groups,
                    only_cross_attention=self.only_cross_attention,
                    dtype=self.dtype, attn_impl=self.attn_impl, name=f"attentions_{i}",
                )(x, context, bias_add, context_bias_add)
            x = res(i + 1)(x, temb)
        return x


class MidBlock1DSimpleCrossAttn(nn.Module):
    """UNetMidBlock2DSimpleCrossAttn (unet_1d_blocks.py:626-746)."""

    in_channels: int
    temb_channels: Optional[int]
    num_layers: int = 1
    resnet_eps: float = 1e-6
    resnet_time_scale_shift: str = "default"
    resnet_act_fn: str = "swish"
    resnet_groups: Optional[int] = 32
    attention_head_dim: int = 1
    output_scale_factor: float = 1.0
    cross_attention_dim: int = 1280
    skip_time_act: bool = False
    only_cross_attention: bool = False
    cross_attention_norm: Optional[str] = None
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x, temb=None, context=None, bias_add=None):
        groups = self.resnet_groups if self.resnet_groups is not None else min(self.in_channels // 4, 32)
        heads = self.in_channels // self.attention_head_dim

        def res(i):
            return ResnetBlock1DFull(
                self.in_channels, self.temb_channels, groups=groups,
                eps=self.resnet_eps, non_linearity=self.resnet_act_fn,
                time_embedding_norm=self.resnet_time_scale_shift,
                output_scale_factor=self.output_scale_factor,
                skip_time_act=self.skip_time_act,
                dtype=self.dtype, name=f"resnets_{i}",
            )

        x = res(0)(x, temb)
        for i in range(self.num_layers):
            x = AddedKVAttention1D(
                self.in_channels, heads, self.attention_head_dim,
                added_kv_proj_dim=self.cross_attention_dim,
                norm_num_groups=groups,
                only_cross_attention=self.only_cross_attention,
                cross_attention_norm=self.cross_attention_norm,
                dtype=self.dtype, attn_impl=self.attn_impl, name=f"attentions_{i}",
            )(x, context, bias_add=bias_add)
            x = res(i + 1)(x, temb)
        return x


# --------------------------------------------------------------------------
# factories (unet_1d_blocks.py:31-423)
# --------------------------------------------------------------------------

DOWN_BLOCK_TYPES = (
    "DownBlock2D", "ResnetDownsampleBlock2D", "AttnDownBlock2D",
    "CrossAttnDownBlock2D", "SimpleCrossAttnDownBlock2D", "SkipDownBlock2D",
    "AttnSkipDownBlock2D", "DownEncoderBlock2D", "AttnDownEncoderBlock2D",
    "KDownBlock2D", "KCrossAttnDownBlock2D",
)
UP_BLOCK_TYPES = (
    "UpBlock2D", "ResnetUpsampleBlock2D", "CrossAttnUpBlock2D",
    "SimpleCrossAttnUpBlock2D", "AttnUpBlock2D", "SkipUpBlock2D",
    "AttnSkipUpBlock2D", "UpDecoderBlock2D", "AttnUpDecoderBlock2D",
    "KUpBlock2D", "KCrossAttnUpBlock2D",
)


def _norm_type(t: str) -> str:
    if t.startswith("UNetRes"):
        t = t[7:]
    return t.replace("1D", "2D")  # accept 1D aliases


def get_down_block(
    down_block_type: str,
    num_layers: int,
    in_channels: int,
    out_channels: int,
    temb_channels: Optional[int],
    add_downsample: bool,
    resnet_eps: float,
    resnet_act_fn: str,
    transformer_layers_per_block: int = 1,
    num_attention_heads: Optional[int] = None,
    resnet_groups: Optional[int] = None,
    cross_attention_dim: Optional[int] = None,
    downsample_padding: Optional[int] = None,
    dual_cross_attention: bool = False,
    use_linear_projection: bool = False,  # param-layout-only in torch; no-op here
    only_cross_attention: bool = False,
    upcast_attention: bool = False,  # softmax is always f32 on this path
    resnet_time_scale_shift: str = "default",
    resnet_skip_time_act: bool = False,
    resnet_out_scale_factor: float = 1.0,
    cross_attention_norm: Optional[str] = None,
    attention_head_dim: Optional[int] = None,
    downsample_type: Optional[str] = None,
    skip_channels: int = 1,
    dtype: jnp.dtype = jnp.float32,
    attn_impl: str = "xla",
    name: Optional[str] = None,
) -> nn.Module:
    """Mirror of the reference `get_down_block` (unet_1d_blocks.py:31-224);
    same dispatch names and defaulting (attention_head_dim falls back to
    num_attention_heads).  `in_channels` is implied by the channels-last input
    at call time; it is accepted for signature parity."""
    del in_channels, use_linear_projection, upcast_attention
    if attention_head_dim is None:
        attention_head_dim = num_attention_heads
    t = _norm_type(down_block_type)
    groups = resnet_groups if resnet_groups is not None else 32
    pad = downsample_padding if downsample_padding is not None else 1
    common = dict(num_layers=num_layers, resnet_eps=resnet_eps,
                  resnet_act_fn=resnet_act_fn, dtype=dtype, name=name)
    if t == "DownBlock2D":
        return DownBlock1D(
            out_channels, temb_channels, resnet_groups=groups,
            resnet_time_scale_shift=resnet_time_scale_shift,
            add_downsample=add_downsample, downsample_padding=pad, **common)
    if t == "ResnetDownsampleBlock2D":
        return ResnetDownsampleBlock1D(
            out_channels, temb_channels, resnet_groups=groups,
            resnet_time_scale_shift=resnet_time_scale_shift,
            add_downsample=add_downsample, skip_time_act=resnet_skip_time_act,
            output_scale_factor=resnet_out_scale_factor, **common)
    if t == "AttnDownBlock2D":
        ds = None if not add_downsample else (downsample_type or "conv")
        return AttnDownBlock1D(
            out_channels, temb_channels, resnet_groups=groups,
            resnet_time_scale_shift=resnet_time_scale_shift,
            attention_head_dim=attention_head_dim, downsample_padding=pad,
            downsample_type=ds, attn_impl=attn_impl, **common)
    if t == "CrossAttnDownBlock2D":
        if cross_attention_dim is None:
            raise ValueError("cross_attention_dim must be specified for CrossAttnDownBlock2D")
        return CrossAttnDownBlock1D(
            out_channels, temb_channels, resnet_groups=groups,
            transformer_layers_per_block=transformer_layers_per_block,
            resnet_time_scale_shift=resnet_time_scale_shift,
            num_attention_heads=num_attention_heads,
            cross_attention_dim=cross_attention_dim,
            downsample_padding=pad, add_downsample=add_downsample,
            dual_cross_attention=dual_cross_attention,
            only_cross_attention=only_cross_attention,
            attn_impl=attn_impl, **common)
    if t == "SimpleCrossAttnDownBlock2D":
        if cross_attention_dim is None:
            raise ValueError("cross_attention_dim must be specified for SimpleCrossAttnDownBlock2D")
        return SimpleCrossAttnDownBlock1D(
            out_channels, temb_channels, resnet_groups=groups,
            resnet_time_scale_shift=resnet_time_scale_shift,
            attention_head_dim=attention_head_dim,
            cross_attention_dim=cross_attention_dim,
            add_downsample=add_downsample, skip_time_act=resnet_skip_time_act,
            output_scale_factor=resnet_out_scale_factor,
            only_cross_attention=only_cross_attention,
            cross_attention_norm=cross_attention_norm,
            attn_impl=attn_impl, **common)
    if t == "SkipDownBlock2D":
        return SkipDownBlock1D(
            out_channels, temb_channels, skip_channels=skip_channels,
            resnet_time_scale_shift=resnet_time_scale_shift,
            add_downsample=add_downsample, **common)
    if t == "AttnSkipDownBlock2D":
        return SkipDownBlock1D(
            out_channels, temb_channels, skip_channels=skip_channels,
            resnet_time_scale_shift=resnet_time_scale_shift,
            add_downsample=add_downsample, with_attention=True,
            attention_head_dim=attention_head_dim, attn_impl=attn_impl, **common)
    if t == "DownEncoderBlock2D":
        return DownEncoderBlock1D(
            out_channels, resnet_groups=groups,
            resnet_time_scale_shift=resnet_time_scale_shift,
            add_downsample=add_downsample, downsample_padding=pad, **common)
    if t == "AttnDownEncoderBlock2D":
        return DownEncoderBlock1D(
            out_channels, resnet_groups=groups,
            resnet_time_scale_shift=resnet_time_scale_shift,
            add_downsample=add_downsample, downsample_padding=pad,
            with_attention=True, attention_head_dim=attention_head_dim,
            attn_impl=attn_impl, **common)
    if t == "KDownBlock2D":
        return KDownBlock1D(
            out_channels, temb_channels, add_downsample=add_downsample, **common)
    if t == "KCrossAttnDownBlock2D":
        return KCrossAttnDownBlock1D(
            out_channels, temb_channels, cross_attention_dim=cross_attention_dim,
            add_downsample=add_downsample, attention_head_dim=attention_head_dim or 64,
            add_self_attention=not add_downsample, attn_impl=attn_impl, **common)
    raise ValueError(f"{down_block_type} does not exist.")


def get_up_block(
    up_block_type: str,
    num_layers: int,
    in_channels: int,
    out_channels: int,
    prev_output_channel: int,
    temb_channels: Optional[int],
    add_upsample: bool,
    resnet_eps: float,
    resnet_act_fn: str,
    transformer_layers_per_block: int = 1,
    num_attention_heads: Optional[int] = None,
    resnet_groups: Optional[int] = None,
    cross_attention_dim: Optional[int] = None,
    dual_cross_attention: bool = False,
    use_linear_projection: bool = False,
    only_cross_attention: bool = False,
    upcast_attention: bool = False,
    resnet_time_scale_shift: str = "default",
    resnet_skip_time_act: bool = False,
    resnet_out_scale_factor: float = 1.0,
    cross_attention_norm: Optional[str] = None,
    attention_head_dim: Optional[int] = None,
    upsample_type: Optional[str] = None,
    skip_channels: int = 1,
    dtype: jnp.dtype = jnp.float32,
    attn_impl: str = "xla",
    name: Optional[str] = None,
) -> nn.Module:
    """Mirror of the reference `get_up_block` (unet_1d_blocks.py:226-423)."""
    del prev_output_channel, use_linear_projection, upcast_attention
    if attention_head_dim is None:
        attention_head_dim = num_attention_heads
    t = _norm_type(up_block_type)
    groups = resnet_groups if resnet_groups is not None else 32
    common = dict(num_layers=num_layers, resnet_eps=resnet_eps,
                  resnet_act_fn=resnet_act_fn, dtype=dtype, name=name)
    if t == "UpBlock2D":
        return UpBlock1D(
            out_channels, temb_channels, resnet_groups=groups,
            resnet_time_scale_shift=resnet_time_scale_shift,
            add_upsample=add_upsample, **common)
    if t == "ResnetUpsampleBlock2D":
        return ResnetUpsampleBlock1D(
            out_channels, temb_channels, resnet_groups=groups,
            resnet_time_scale_shift=resnet_time_scale_shift,
            add_upsample=add_upsample, skip_time_act=resnet_skip_time_act,
            output_scale_factor=resnet_out_scale_factor, **common)
    if t == "CrossAttnUpBlock2D":
        if cross_attention_dim is None:
            raise ValueError("cross_attention_dim must be specified for CrossAttnUpBlock2D")
        return CrossAttnUpBlock1D(
            out_channels, temb_channels, resnet_groups=groups,
            transformer_layers_per_block=transformer_layers_per_block,
            resnet_time_scale_shift=resnet_time_scale_shift,
            num_attention_heads=num_attention_heads,
            cross_attention_dim=cross_attention_dim,
            add_upsample=add_upsample, dual_cross_attention=dual_cross_attention,
            only_cross_attention=only_cross_attention, attn_impl=attn_impl, **common)
    if t == "SimpleCrossAttnUpBlock2D":
        if cross_attention_dim is None:
            raise ValueError("cross_attention_dim must be specified for SimpleCrossAttnUpBlock2D")
        return SimpleCrossAttnUpBlock1D(
            out_channels, temb_channels, resnet_groups=groups,
            resnet_time_scale_shift=resnet_time_scale_shift,
            attention_head_dim=attention_head_dim,
            cross_attention_dim=cross_attention_dim,
            add_upsample=add_upsample, skip_time_act=resnet_skip_time_act,
            output_scale_factor=resnet_out_scale_factor,
            only_cross_attention=only_cross_attention,
            cross_attention_norm=cross_attention_norm, attn_impl=attn_impl, **common)
    if t == "AttnUpBlock2D":
        us = None if not add_upsample else (upsample_type or "conv")
        return AttnUpBlock1D(
            out_channels, temb_channels, resnet_groups=groups,
            resnet_time_scale_shift=resnet_time_scale_shift,
            attention_head_dim=attention_head_dim, upsample_type=us,
            attn_impl=attn_impl, **common)
    if t == "SkipUpBlock2D":
        return SkipUpBlock1D(
            out_channels, temb_channels, skip_channels=skip_channels,
            resnet_time_scale_shift=resnet_time_scale_shift,
            add_upsample=add_upsample, **common)
    if t == "AttnSkipUpBlock2D":
        return SkipUpBlock1D(
            out_channels, temb_channels, skip_channels=skip_channels,
            resnet_time_scale_shift=resnet_time_scale_shift,
            add_upsample=add_upsample, with_attention=True,
            attention_head_dim=attention_head_dim, attn_impl=attn_impl, **common)
    if t == "UpDecoderBlock2D":
        return UpDecoderBlock1D(
            out_channels, temb_channels, resnet_groups=groups,
            resnet_time_scale_shift=resnet_time_scale_shift,
            add_upsample=add_upsample, **common)
    if t == "AttnUpDecoderBlock2D":
        return UpDecoderBlock1D(
            out_channels, temb_channels, resnet_groups=groups,
            resnet_time_scale_shift=resnet_time_scale_shift,
            add_upsample=add_upsample, with_attention=True,
            attention_head_dim=attention_head_dim, attn_impl=attn_impl, **common)
    if t == "KUpBlock2D":
        return KUpBlock1D(
            in_channels, out_channels, temb_channels,
            add_upsample=add_upsample, **common)
    if t == "KCrossAttnUpBlock2D":
        return KCrossAttnUpBlock1D(
            in_channels, out_channels, temb_channels,
            cross_attention_dim=cross_attention_dim,
            attention_head_dim=attention_head_dim or 1,
            add_upsample=add_upsample, attn_impl=attn_impl, **common)
    raise ValueError(f"{up_block_type} does not exist.")


def get_mid_block(
    mid_block_type: Optional[str],
    in_channels: int,
    temb_channels: Optional[int],
    resnet_eps: float = 1e-5,
    resnet_act_fn: str = "silu",
    resnet_groups: Optional[int] = 32,
    num_attention_heads: int = 1,
    attention_head_dim: Optional[int] = None,
    cross_attention_dim: Optional[int] = None,
    transformer_layers_per_block: int = 1,
    dual_cross_attention: bool = False,
    only_cross_attention: bool = False,
    resnet_time_scale_shift: str = "default",
    resnet_skip_time_act: bool = False,
    mid_block_scale_factor: float = 1.0,
    cross_attention_norm: Optional[str] = None,
    dtype: jnp.dtype = jnp.float32,
    attn_impl: str = "xla",
    name: Optional[str] = None,
) -> Optional[nn.Module]:
    """Mid-block dispatch (unet_1d_condition.py:426-470 equivalent)."""
    if mid_block_type is None:
        return None
    t = _norm_type(mid_block_type)
    if t == "UNetMidBlock2D":
        return MidBlock1D(
            in_channels, temb_channels, resnet_eps=resnet_eps,
            resnet_act_fn=resnet_act_fn, resnet_groups=resnet_groups,
            resnet_time_scale_shift=resnet_time_scale_shift,
            attention_head_dim=attention_head_dim,
            output_scale_factor=mid_block_scale_factor,
            dtype=dtype, attn_impl=attn_impl, name=name)
    if t == "UNetMidBlock2DCrossAttn":
        return MidBlock1DCrossAttn(
            in_channels, temb_channels, resnet_eps=resnet_eps,
            resnet_act_fn=resnet_act_fn, resnet_groups=resnet_groups,
            resnet_time_scale_shift=resnet_time_scale_shift,
            transformer_layers_per_block=transformer_layers_per_block,
            num_attention_heads=num_attention_heads,
            cross_attention_dim=cross_attention_dim,
            dual_cross_attention=dual_cross_attention,
            only_cross_attention=only_cross_attention,
            output_scale_factor=mid_block_scale_factor,
            dtype=dtype, attn_impl=attn_impl, name=name)
    if t == "UNetMidBlock2DSimpleCrossAttn":
        return MidBlock1DSimpleCrossAttn(
            in_channels, temb_channels, resnet_eps=resnet_eps,
            resnet_act_fn=resnet_act_fn, resnet_groups=resnet_groups,
            resnet_time_scale_shift=resnet_time_scale_shift,
            attention_head_dim=attention_head_dim or 1,
            cross_attention_dim=cross_attention_dim,
            skip_time_act=resnet_skip_time_act,
            only_cross_attention=only_cross_attention,
            cross_attention_norm=cross_attention_norm,
            output_scale_factor=mid_block_scale_factor,
            dtype=dtype, attn_impl=attn_impl, name=name)
    raise ValueError(f"unknown mid_block_type : {mid_block_type}")
