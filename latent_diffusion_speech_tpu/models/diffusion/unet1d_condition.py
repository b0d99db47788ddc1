"""General conditional UNet-1D assembled from the full block zoo.

This is the framework's counterpart of the reference's complete
`UNet1DConditionModel` (`diffusion/unet1d/unet_1d_condition.py:61-1036`) —
the *configurable* model the diffusers surface exposes, of which the flagship
`UNet1D` (`unet1d.py`) is the single perf-tuned instantiation Unit2Mel uses.
Anything the reference config could reach is buildable here: every
`down_block_types`/`up_block_types` entry from the factory
(`unet_1d_blocks.py:31-423`), all three mid blocks, class embeddings
(timestep/identity/projection/simple_projection/label,
`unet_1d_condition.py:328-360`), SDXL-style `addition_embed_type='text_time'`
(`:373-380, 908-925`), `encoder_hid_proj` text projection (`:296-300`),
ControlNet / T2I-adapter residual hooks (`:946-997`), and 0/1 attention masks
converted to -10000 biases (`:888-903`).

Scope notes (accounted in PARITY.md):
* Kandinsky image-conditioned embeddings (`text_image`, `image`, `image_hint`
  addition embeds; `text_image_proj`/`image_proj` hid projections) require
  CLIP-style image encoders that have no counterpart in this TTS stack —
  constructing them raises with that message.
* `attention-pooled addition_embed_type='text'` likewise targets T2I models;
  not constructed.
* Inputs must be length-divisible by 2**num_upsamplers (the flagship path
  pads to that grid in GaussianDiffusion; the reference's `forward_upsample_
  size` interpolation escape hatch is an image-resolution concern).

Param names mirror the torch module paths, so a complete reference
`UNet1DConditionModel.state_dict()` loads through the one generic converter
(`import_torch.block_params_from_torch`) — parity-tested in
tests/test_unet_blocks.py for an SD-style two-type config with real
encoder states.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from latent_diffusion_speech_tpu.models.diffusion import blocks as bl
from latent_diffusion_speech_tpu.models.diffusion.unet1d import Conv1dSame

__all__ = ["UNet1DConditionConfig", "UNet1DCondition"]

_SKIP_TYPES = {"SkipDownBlock2D", "AttnSkipDownBlock2D", "SkipUpBlock2D", "AttnSkipUpBlock2D"}
_K_TYPES = {"KDownBlock2D", "KCrossAttnDownBlock2D", "KUpBlock2D", "KCrossAttnUpBlock2D"}
_NO_SKIP_UP = {"UpDecoderBlock2D", "AttnUpDecoderBlock2D"}


def _tup(v, n):
    return tuple(v) if isinstance(v, (tuple, list)) else (v,) * n


@dataclass(frozen=True)
class UNet1DConditionConfig:
    in_channels: int = 4
    out_channels: int = 4
    center_input_sample: bool = False
    flip_sin_to_cos: bool = True
    freq_shift: int = 0
    down_block_types: Tuple[str, ...] = (
        "CrossAttnDownBlock2D", "CrossAttnDownBlock2D", "CrossAttnDownBlock2D", "DownBlock2D",
    )
    mid_block_type: Optional[str] = "UNetMidBlock2DCrossAttn"
    up_block_types: Tuple[str, ...] = (
        "UpBlock2D", "CrossAttnUpBlock2D", "CrossAttnUpBlock2D", "CrossAttnUpBlock2D",
    )
    only_cross_attention: Union[bool, Tuple[bool, ...]] = False
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: Union[int, Tuple[int, ...]] = 2
    downsample_padding: int = 1
    mid_block_scale_factor: float = 1.0
    act_fn: str = "silu"
    norm_num_groups: Optional[int] = 32
    norm_eps: float = 1e-5
    cross_attention_dim: Union[int, Tuple[int, ...]] = 1280
    transformer_layers_per_block: Union[int, Tuple[int, ...]] = 1
    encoder_hid_dim: Optional[int] = None
    encoder_hid_dim_type: Optional[str] = None  # 'text_proj' only (see module doc)
    attention_head_dim: Union[int, Tuple[int, ...]] = 8
    dual_cross_attention: bool = False
    class_embed_type: Optional[str] = None
    addition_embed_type: Optional[str] = None  # 'text_time' only (see module doc)
    addition_time_embed_dim: Optional[int] = None
    num_class_embeds: Optional[int] = None
    resnet_time_scale_shift: str = "default"
    resnet_skip_time_act: bool = False
    resnet_out_scale_factor: float = 1.0
    time_embedding_type: str = "positional"  # 'positional' | 'fourier'
    time_embedding_dim: Optional[int] = None
    time_embedding_act_fn: Optional[str] = None
    timestep_post_act: Optional[str] = None
    time_cond_proj_dim: Optional[int] = None
    conv_in_kernel: int = 3
    conv_out_kernel: int = 3
    projection_class_embeddings_input_dim: Optional[int] = None
    class_embeddings_concat: bool = False
    mid_block_only_cross_attention: Optional[bool] = None
    cross_attention_norm: Optional[str] = None
    skip_channels: Optional[int] = None  # Skip blocks' pyramid width (default: in_channels)

    def __post_init__(self):
        if self.encoder_hid_dim_type not in (None, "text_proj"):
            raise NotImplementedError(
                f"encoder_hid_dim_type={self.encoder_hid_dim_type!r} needs a CLIP-style "
                "image encoder (Kandinsky surface) — out of scope for the TTS stack"
            )
        if self.addition_embed_type not in (None, "text_time"):
            raise NotImplementedError(
                f"addition_embed_type={self.addition_embed_type!r} targets image-conditioned "
                "T2I models — only the SDXL 'text_time' form is built here"
            )
        if len(self.down_block_types) != len(self.up_block_types):
            raise ValueError("down_block_types and up_block_types must have equal length")
        if len(self.block_out_channels) != len(self.down_block_types):
            raise ValueError("block_out_channels must match down_block_types")

    @property
    def num_upsamplers(self) -> int:
        return len(self.up_block_types) - 1


def _timesteps_embedding(t, dim, flip_sin_to_cos, freq_shift, max_period=10000.0):
    """diffusers `Timesteps`/`get_timestep_embedding` (embeddings.py:24-66)."""
    half = dim // 2
    exponent = -jnp.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - freq_shift)
    freqs = jnp.exp(exponent)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin], -1) if flip_sin_to_cos else jnp.concatenate([sin, cos], -1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class GaussianFourierProjection1D(nn.Module):
    """GaussianFourierProjection (embeddings.py): fixed random frequencies."""

    embedding_size: int
    scale: float = 16.0
    flip_sin_to_cos: bool = False

    @nn.compact
    def __call__(self, t):
        w = self.param(
            "weight",
            lambda key, shape: self.scale * jax.random.normal(key, shape),
            (self.embedding_size,),
        )
        # the frequencies are a frozen draw (requires_grad=False in torch)
        w = jax.lax.stop_gradient(w)
        args = t.astype(jnp.float32)[:, None] * w[None, :] * 2 * jnp.pi
        sin, cos = jnp.sin(args), jnp.cos(args)
        return jnp.concatenate([cos, sin], -1) if self.flip_sin_to_cos else jnp.concatenate([sin, cos], -1)


class TimestepEmbedding1D(nn.Module):
    """TimestepEmbedding MLP (embeddings.py:157-203): linear_1 -> act ->
    linear_2, with the optional cond_proj added to the input and optional
    post-activation."""

    time_embed_dim: int
    act_fn: str = "silu"
    post_act_fn: Optional[str] = None
    cond_proj_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample, condition=None):
        if condition is not None:
            sample = sample + nn.Dense(
                sample.shape[-1], use_bias=False, dtype=self.dtype, name="cond_proj"
            )(condition)
        h = nn.Dense(self.time_embed_dim, dtype=self.dtype, name="linear_1")(sample)
        h = bl.get_activation(self.act_fn)(h)
        h = nn.Dense(self.time_embed_dim, dtype=self.dtype, name="linear_2")(h)
        if self.post_act_fn is not None:
            h = bl.get_activation(self.post_act_fn)(h)
        return h


class UNet1DCondition(nn.Module):
    cfg: UNet1DConditionConfig
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,  # (B, T, in_channels) channels-last
        timestep: jnp.ndarray,  # (B,) or scalar
        encoder_hidden_states: Optional[jnp.ndarray] = None,  # (B, S, D)
        class_labels: Optional[jnp.ndarray] = None,
        timestep_cond: Optional[jnp.ndarray] = None,
        attention_mask: Optional[jnp.ndarray] = None,  # (B, T) 0/1
        encoder_attention_mask: Optional[jnp.ndarray] = None,  # (B, S) 0/1
        added_cond_kwargs: Optional[dict] = None,
        down_block_additional_residuals: Optional[Tuple[jnp.ndarray, ...]] = None,
        mid_block_additional_residual: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        cfg = self.cfg
        n = len(cfg.down_block_types)
        boc = cfg.block_out_channels
        heads = _tup(cfg.attention_head_dim, n)  # diffusers' historical naming: these ARE the head counts
        head_dims = _tup(cfg.attention_head_dim, n)
        cross_dims = _tup(cfg.cross_attention_dim, n)
        layers = _tup(cfg.layers_per_block, n)
        tf_layers = _tup(cfg.transformer_layers_per_block, n)
        only_cross = _tup(cfg.only_cross_attention, n)
        mid_only_cross = (
            cfg.mid_block_only_cross_attention
            if cfg.mid_block_only_cross_attention is not None
            else (cfg.only_cross_attention if isinstance(cfg.only_cross_attention, bool) else False)
        )
        skip_ch = cfg.skip_channels or cfg.in_channels

        if sample.shape[1] % (2 ** cfg.num_upsamplers) != 0:
            raise ValueError(
                f"T={sample.shape[1]} must be divisible by 2**{cfg.num_upsamplers} "
                "(pad upstream, as GaussianDiffusion does)"
            )

        # masks -> -10000 biases with a singleton query axis (ref :888-903)
        bias_add = None
        if attention_mask is not None:
            bias_add = ((1 - attention_mask.astype(jnp.float32)) * -10000.0)[:, None, None, :]
        ctx_bias = None
        if encoder_attention_mask is not None:
            ctx_bias = ((1 - encoder_attention_mask.astype(jnp.float32)) * -10000.0)[:, None, None, :]

        if cfg.center_input_sample:
            sample = 2 * sample - 1.0

        # 1. time
        t = jnp.atleast_1d(jnp.asarray(timestep))
        t = jnp.broadcast_to(t, (sample.shape[0],))
        if cfg.time_embedding_type == "fourier":
            time_embed_dim = cfg.time_embedding_dim or boc[0] * 2
            t_emb = GaussianFourierProjection1D(
                time_embed_dim // 2, flip_sin_to_cos=cfg.flip_sin_to_cos, name="time_proj"
            )(t)
        else:
            time_embed_dim = cfg.time_embedding_dim or boc[0] * 4
            t_emb = _timesteps_embedding(t, boc[0], cfg.flip_sin_to_cos, cfg.freq_shift)
        emb = TimestepEmbedding1D(
            time_embed_dim, act_fn=cfg.act_fn, post_act_fn=cfg.timestep_post_act,
            cond_proj_dim=cfg.time_cond_proj_dim, dtype=self.dtype, name="time_embedding",
        )(t_emb.astype(self.dtype), timestep_cond)

        # class conditioning (ref :328-360, 848-866)
        if cfg.class_embed_type is None and cfg.num_class_embeds is not None:
            class_emb = nn.Embed(cfg.num_class_embeds, time_embed_dim, name="class_embedding")(class_labels)
        elif cfg.class_embed_type == "timestep":
            ce_in = _timesteps_embedding(class_labels, boc[0], cfg.flip_sin_to_cos, cfg.freq_shift)
            class_emb = TimestepEmbedding1D(
                time_embed_dim, act_fn=cfg.act_fn, dtype=self.dtype, name="class_embedding"
            )(ce_in.astype(self.dtype))
        elif cfg.class_embed_type == "identity":
            class_emb = class_labels.astype(self.dtype)
        elif cfg.class_embed_type == "projection":
            class_emb = TimestepEmbedding1D(
                time_embed_dim, act_fn=cfg.act_fn, dtype=self.dtype, name="class_embedding"
            )(class_labels.astype(self.dtype))
        elif cfg.class_embed_type == "simple_projection":
            class_emb = nn.Dense(time_embed_dim, dtype=self.dtype, name="class_embedding")(
                class_labels.astype(self.dtype)
            )
        else:
            class_emb = None
        if class_emb is not None:
            emb = jnp.concatenate([emb, class_emb], -1) if cfg.class_embeddings_concat else emb + class_emb

        # SDXL text_time addition embedding (ref :373-380, 908-925)
        if cfg.addition_embed_type == "text_time":
            text_embeds = added_cond_kwargs["text_embeds"]
            time_ids = added_cond_kwargs["time_ids"]
            time_embeds = _timesteps_embedding(
                time_ids.reshape(-1), cfg.addition_time_embed_dim, cfg.flip_sin_to_cos, cfg.freq_shift
            ).reshape(text_embeds.shape[0], -1)
            add_embeds = jnp.concatenate([text_embeds, time_embeds], -1).astype(self.dtype)
            emb = emb + TimestepEmbedding1D(
                time_embed_dim, act_fn=cfg.act_fn, dtype=self.dtype, name="add_embedding"
            )(add_embeds)

        if cfg.time_embedding_act_fn is not None:
            emb = bl.get_activation(cfg.time_embedding_act_fn)(emb)

        if cfg.encoder_hid_dim_type == "text_proj":
            encoder_hidden_states = nn.Dense(
                cross_dims[0], dtype=self.dtype, name="encoder_hid_proj"
            )(encoder_hidden_states)

        # 2. conv_in — the score-SDE skip pyramid rides the RAW input (that is
        # why the reference's skip_conv maps image channels, unet_1d_blocks.py:1455)
        sample = sample.astype(self.dtype)
        has_skip_pyramid = any(t in _SKIP_TYPES for t in cfg.down_block_types + cfg.up_block_types)
        skip_sample = sample if has_skip_pyramid else None
        sample = Conv1dSame(boc[0], cfg.conv_in_kernel, dtype=self.dtype, name="conv_in")(sample)

        is_controlnet = (
            mid_block_additional_residual is not None and down_block_additional_residuals is not None
        )
        is_adapter = (
            mid_block_additional_residual is None and down_block_additional_residuals is not None
        )
        adapter_residuals = list(down_block_additional_residuals or ())

        # 3. down
        res_samples = [sample]
        res_counts = [1]
        out_ch = boc[0]
        for i, bt in enumerate(cfg.down_block_types):
            in_ch = out_ch
            out_ch = boc[i]
            is_final = i == n - 1
            block = bl.get_down_block(
                bt, num_layers=layers[i], in_channels=in_ch, out_channels=out_ch,
                temb_channels=time_embed_dim * (2 if cfg.class_embeddings_concat else 1),
                add_downsample=not is_final, resnet_eps=cfg.norm_eps, resnet_act_fn=cfg.act_fn,
                transformer_layers_per_block=tf_layers[i],
                num_attention_heads=heads[i], resnet_groups=cfg.norm_num_groups,
                cross_attention_dim=cross_dims[i], downsample_padding=cfg.downsample_padding,
                dual_cross_attention=cfg.dual_cross_attention,
                only_cross_attention=only_cross[i],
                resnet_time_scale_shift=cfg.resnet_time_scale_shift,
                resnet_skip_time_act=cfg.resnet_skip_time_act,
                resnet_out_scale_factor=cfg.resnet_out_scale_factor,
                cross_attention_norm=cfg.cross_attention_norm,
                attention_head_dim=head_dims[i] if head_dims[i] is not None else out_ch,
                skip_channels=skip_ch, dtype=self.dtype, attn_impl=self.attn_impl,
                name=f"down_blocks_{i}",
            )
            base = _norm(bt)
            if base in _SKIP_TYPES:
                sample, skips, skip_sample = block(sample, emb, skip_sample=skip_sample)
            elif base == "CrossAttnDownBlock2D":
                extra = adapter_residuals.pop(0) if (is_adapter and adapter_residuals) else None
                sample, skips = block(
                    sample, emb, encoder_hidden_states, bias_add, ctx_bias,
                    additional_residuals=extra,
                )
            elif base == "KCrossAttnDownBlock2D":
                sample, skips = block(sample, emb, encoder_hidden_states, bias_add, ctx_bias)
            elif base == "SimpleCrossAttnDownBlock2D":
                sample, skips = block(
                    sample, emb, encoder_hidden_states,
                    bias_add=ctx_bias if encoder_hidden_states is not None else bias_add,
                )
            else:
                sample, skips = block(sample, emb)
                if is_adapter and adapter_residuals:
                    sample = sample + adapter_residuals.pop(0)
            res_samples.extend(skips)
            res_counts.append(len(skips))

        if is_controlnet:
            res_samples = [r + c for r, c in zip(res_samples, down_block_additional_residuals)]

        # 4. mid
        mid = bl.get_mid_block(
            cfg.mid_block_type, in_channels=boc[-1],
            temb_channels=time_embed_dim * (2 if cfg.class_embeddings_concat else 1),
            resnet_eps=cfg.norm_eps, resnet_act_fn=cfg.act_fn, resnet_groups=cfg.norm_num_groups,
            num_attention_heads=heads[-1], attention_head_dim=head_dims[-1],
            cross_attention_dim=cross_dims[-1], transformer_layers_per_block=tf_layers[-1],
            dual_cross_attention=cfg.dual_cross_attention,
            only_cross_attention=mid_only_cross,
            resnet_time_scale_shift=cfg.resnet_time_scale_shift,
            resnet_skip_time_act=cfg.resnet_skip_time_act,
            mid_block_scale_factor=cfg.mid_block_scale_factor,
            cross_attention_norm=cfg.cross_attention_norm,
            dtype=self.dtype, attn_impl=self.attn_impl, name="mid_block",
        )
        if mid is not None:
            mt = _norm(cfg.mid_block_type)
            if mt == "UNetMidBlock2DCrossAttn":
                sample = mid(sample, emb, encoder_hidden_states, bias_add, ctx_bias)
            elif mt == "UNetMidBlock2DSimpleCrossAttn":
                sample = mid(
                    sample, emb, encoder_hidden_states,
                    bias_add=ctx_bias if encoder_hidden_states is not None else bias_add,
                )
            else:
                sample = mid(sample, emb)
        if is_controlnet:
            sample = sample + mid_block_additional_residual

        # 5. up — the up-path skip pyramid is a FRESH accumulator (first Skip
        # up block sees None): each level contributes skip_conv(act(norm(h)))
        # at its own resolution, FIR-upsampled level to level (UNet2DModel
        # wiring; the down pyramid above fed only the down blocks)
        skip_sample = None if has_skip_pyramid else skip_sample
        rev_boc = list(reversed(boc))
        rev_heads = list(reversed(heads))
        rev_head_dims = list(reversed(head_dims))
        rev_layers = list(reversed(layers))
        rev_cross = list(reversed(cross_dims))
        rev_tf = list(reversed(tf_layers))
        rev_only_cross = list(reversed(only_cross))
        out_ch = rev_boc[0]
        for i, bt in enumerate(cfg.up_block_types):
            is_final = i == n - 1
            prev_ch = out_ch
            out_ch = rev_boc[i]
            in_ch = rev_boc[min(i + 1, n - 1)]
            base = _norm(bt)
            num_layers = rev_layers[i] + 1
            if base in _NO_SKIP_UP:
                n_skips = 0
            elif base in _K_TYPES:
                n_skips = num_layers - 1
            else:
                n_skips = num_layers
            skips = tuple(res_samples[len(res_samples) - n_skips :]) if n_skips else ()
            if n_skips:
                del res_samples[len(res_samples) - n_skips :]
            block = bl.get_up_block(
                bt, num_layers=num_layers, in_channels=in_ch, out_channels=out_ch,
                prev_output_channel=prev_ch,
                temb_channels=time_embed_dim * (2 if cfg.class_embeddings_concat else 1),
                add_upsample=not is_final, resnet_eps=cfg.norm_eps, resnet_act_fn=cfg.act_fn,
                transformer_layers_per_block=rev_tf[i],
                num_attention_heads=rev_heads[i], resnet_groups=cfg.norm_num_groups,
                cross_attention_dim=rev_cross[i],
                dual_cross_attention=cfg.dual_cross_attention,
                only_cross_attention=rev_only_cross[i],
                resnet_time_scale_shift=cfg.resnet_time_scale_shift,
                resnet_skip_time_act=cfg.resnet_skip_time_act,
                resnet_out_scale_factor=cfg.resnet_out_scale_factor,
                cross_attention_norm=cfg.cross_attention_norm,
                attention_head_dim=rev_head_dims[i] if rev_head_dims[i] is not None else out_ch,
                skip_channels=skip_ch, dtype=self.dtype, attn_impl=self.attn_impl,
                name=f"up_blocks_{i}",
            )
            if base in _SKIP_TYPES:
                sample, skip_sample = block(sample, skips, emb, skip_sample=skip_sample)
            elif base in ("CrossAttnUpBlock2D", "KCrossAttnUpBlock2D"):
                sample = block(sample, skips, emb, encoder_hidden_states, bias_add, ctx_bias)
            elif base == "SimpleCrossAttnUpBlock2D":
                sample = block(
                    sample, skips, emb, encoder_hidden_states,
                    bias_add=ctx_bias if encoder_hidden_states is not None else bias_add,
                )
            elif base in _NO_SKIP_UP:
                sample = block(sample, emb)
            else:
                sample = block(sample, skips, emb)

        # 6. out
        if cfg.norm_num_groups is not None:
            sample = nn.GroupNorm(
                num_groups=cfg.norm_num_groups, epsilon=cfg.norm_eps, name="conv_norm_out"
            )(sample).astype(self.dtype)
            sample = bl.get_activation(cfg.act_fn)(sample)
        sample = Conv1dSame(cfg.out_channels, cfg.conv_out_kernel, dtype=self.dtype, name="conv_out")(sample)
        if skip_sample is not None and isinstance(skip_sample, jnp.ndarray) and skip_sample.shape == sample.shape:
            # score-SDE skip pyramid terminates on the output (UNet2DModel wiring)
            sample = sample + skip_sample
        return sample


def _norm(t: str) -> str:
    if t.startswith("UNetRes"):
        t = t[7:]
    return t.replace("1D", "2D")
