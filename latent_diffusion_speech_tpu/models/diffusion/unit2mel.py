"""Unit2Mel: condition builder + UNet denoiser as one flax module.

Parity with the *intended* reference `Unit2Mel` (`diffusion/unit2mel.py:51-88`
with the 2.9 fixes applied: the constructor takes `use_pitch_aug`, gating an
aug-shift embedding; `is_tts` selects the no-volume conditioning path):

condition = unit_embed(units) [+ volume_embed(volume)] [+ spk_embed(spk_id-1)]
            [+ aug_shift_embed(aug_shift / 5)]

The diffusion process itself lives in `GaussianDiffusion`; this module holds
parameters and exposes `condition` / `denoise` methods for it.  Use
`Unit2MelSystem` for a reference-shaped forward(units, ..., infer=...) facade.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from latent_diffusion_speech_tpu.models.diffusion.gaussian import GaussianDiffusion
from latent_diffusion_speech_tpu.models.diffusion.unet1d import UNet1D, UNet1DConfig

__all__ = ["Unit2MelConfig", "Unit2Mel", "Unit2MelSystem"]


@dataclass(frozen=True)
class Unit2MelConfig:
    input_channel: int = 1280        # unit encoder dim (whisper_large_v3)
    n_spk: int = 323
    use_pitch_aug: bool = True
    out_dims: int = 128              # vocoder latent bins fed to diffusion
    n_layers: int = 2
    block_out_channels: Tuple[int, ...] = (256, 384, 512, 512)
    n_heads: int = 8
    n_hidden: int = 256
    acoustic_scale: float = 1.0
    is_tts: bool = True              # TTS mode: no volume conditioning
    timesteps: int = 1000
    k_step: int = 1000
    max_beta: float = 0.02
    conv_impl: str = "xla"           # UNet conv lowering: 'xla' | 'matmul'
    attn_impl: str = "xla"           # UNet attention: 'xla' | 'fused' (opt-in Pallas)
    gelu: str = "auto"               # GEGLU gelu: 'auto' (tanh iff B>=128) | 'exact' | 'tanh'
    qkv: str = "split"               # q/k/v projections: 'split' | 'fused'
    # Denoiser backbone: 'flagship' = the perf-tuned effective architecture
    # (UNet1D); 'general' = the full diffusers-style block-graph builder
    # (UNet1DCondition) — lets a config swap any factory block type in
    # (down/up/mid overrides below; None = the reference's effective types).
    denoiser: str = "flagship"
    down_block_types: Optional[Tuple[str, ...]] = None
    up_block_types: Optional[Tuple[str, ...]] = None
    mid_block_type: Optional[str] = "UNetMidBlock2DCrossAttn"

    def unet_config(self, remat: bool = False) -> UNet1DConfig:
        return UNet1DConfig(
            in_channels=self.out_dims + self.n_hidden,
            out_channels=self.out_dims,
            block_out_channels=self.block_out_channels,
            layers_per_block=self.n_layers,
            n_heads=self.n_heads,
            remat=remat,
            conv_impl=self.conv_impl,
            attn_impl=self.attn_impl,
            gelu=self.gelu,
            qkv=self.qkv,
        )

    def general_unet_config(self):
        """UNet1DConditionConfig equivalent of the effective architecture,
        with any block-type overrides applied (Unit2Mel pins
        only_cross_attention=True + scale_shift, `unit2mel.py:62-71`)."""
        from latent_diffusion_speech_tpu.models.diffusion.unet1d_condition import (
            UNet1DConditionConfig,
        )

        n = len(self.block_out_channels)
        down = self.down_block_types or (
            ("CrossAttnDownBlock2D",) * (n - 1) + ("DownBlock2D",)
        )
        up = self.up_block_types or (
            ("UpBlock2D",) + ("CrossAttnUpBlock2D",) * (n - 1)
        )
        return UNet1DConditionConfig(
            in_channels=self.out_dims + self.n_hidden,
            out_channels=self.out_dims,
            block_out_channels=self.block_out_channels,
            down_block_types=tuple(down),
            up_block_types=tuple(up),
            mid_block_type=self.mid_block_type,
            layers_per_block=self.n_layers,
            norm_num_groups=8,
            cross_attention_dim=tuple(self.block_out_channels),
            attention_head_dim=self.n_heads,
            only_cross_attention=True,
            resnet_time_scale_shift="scale_shift",
        )


class Unit2Mel(nn.Module):
    cfg: Unit2MelConfig
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    def setup(self):
        cfg = self.cfg
        self.unit_embed = nn.Dense(cfg.n_hidden, dtype=self.dtype, name="unit_embed")
        if not cfg.is_tts:
            self.volume_embed = nn.Dense(cfg.n_hidden, dtype=self.dtype, name="volume_embed")
        if cfg.n_spk is not None and cfg.n_spk > 1:
            self.spk_embed = nn.Embed(cfg.n_spk, cfg.n_hidden, name="spk_embed")
        if cfg.use_pitch_aug:
            self.aug_shift_embed = nn.Dense(cfg.n_hidden, use_bias=False, dtype=self.dtype, name="aug_shift_embed")
        if cfg.denoiser == "general":
            from latent_diffusion_speech_tpu.models.diffusion.unet1d_condition import (
                UNet1DCondition,
            )

            self.unet = UNet1DCondition(
                cfg.general_unet_config(), dtype=self.dtype,
                attn_impl=cfg.attn_impl, name="unet",
            )
        else:
            self.unet = UNet1D(cfg.unet_config(self.remat), dtype=self.dtype, name="unet")

    def condition(
        self,
        units: jnp.ndarray,
        volume: Optional[jnp.ndarray] = None,
        spk_id: Optional[jnp.ndarray] = None,
        aug_shift: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """units (B, T, C_in) -> condition (B, T, n_hidden)."""
        cfg = self.cfg
        x = self.unit_embed(units)
        if volume is not None and not cfg.is_tts:
            x = x + self.volume_embed(volume[..., None])
        if cfg.n_spk is not None and cfg.n_spk > 1 and spk_id is not None:
            # reference convention: speaker ids are 1-based (unit2mel.py:82)
            x = x + self.spk_embed(spk_id - 1)
        if cfg.use_pitch_aug and aug_shift is not None:
            x = x + self.aug_shift_embed(aug_shift[..., None] / 5.0)
        return x

    def denoise(self, x: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        return self.unet(x, t)

    def __call__(self, units, volume=None, spk_id=None, aug_shift=None):
        """Init-path: touches every parameter. Returns (cond, eps) shapes."""
        cond = self.condition(units, volume, spk_id, aug_shift)
        B, T = cond.shape[:2]
        x = jnp.zeros((B, T, self.cfg.out_dims + self.cfg.n_hidden), cond.dtype)
        t = jnp.zeros((B,), jnp.int32)
        return self.denoise(x, t)


class Unit2MelSystem:
    """Reference-shaped facade: forward(units, volume, spk_id, aug_shift,
    gt_spec, infer, ...) over (module, params, GaussianDiffusion)."""

    def __init__(
        self,
        cfg: Unit2MelConfig,
        params=None,
        dtype=jnp.float32,
        remat: bool = False,
        seed: int = 0,
        unet_impl: str = "auto",
        weight_quant: Optional[str] = None,
    ):
        """unet_impl: 'pallas' routes single-stream (B=1) sampling through the
        fused Pallas UNet (ops/pallas/unet1d_fused.py; interpret mode
        off-TPU, for tests); 'xla' forces the flax path.  'auto' currently
        means 'xla': the v1 segmented kernel is parity-correct but measured
        slightly SLOWER than XLA in the sampler scan (1.38 ms vs ~0.9 ms per
        step at T=448 — 24 pallas_calls x ~60 us fixed invocation overhead
        dominates; see benchmarks/unet_kernel_bench.py).  'auto' will route
        to the kernel once the single-call streamed-weights version wins.

        weight_quant: 'int8' stores the UNet's matmul kernels as int8 with
        per-output-channel scales during SAMPLING only; dequant runs inside
        the sampler scan body (behind an optimization barrier) and fuses into
        the consuming matmuls, halving the per-step HBM weight stream
        (ops/weight_quant.py).  Measured round 5: a 3.5% LOSS at the flagship
        B=1 serve shape — that step is per-op-overhead-bound, not
        bandwidth-bound (benchmarks/INT8_SERVE_AB.json) — so serve defaults
        stay bf16; the knob remains for bandwidth-bound geometries.  Training
        and p_losses always see full-precision params."""
        self.cfg = cfg
        self.dtype = dtype
        self.unet_impl = unet_impl
        if weight_quant not in (None, "int8"):
            raise ValueError(f"weight_quant must be None or 'int8', got {weight_quant!r}")
        if weight_quant is not None and unet_impl == "pallas":
            raise ValueError("weight_quant applies to the XLA sampling path; not combinable with unet_impl='pallas'")
        if cfg.denoiser == "general" and (unet_impl == "pallas" or weight_quant is not None):
            raise ValueError(
                "the Pallas fused UNet and int8 weight packing target the "
                "flagship layout; use denoiser='flagship' with them"
            )
        self.weight_quant = weight_quant
        self.module = Unit2Mel(cfg, dtype=dtype, remat=remat)
        if params is None:
            probe_units = jnp.zeros((1, 8, cfg.input_channel))
            probe_spk = jnp.zeros((1, 8), jnp.int32) + 1
            probe_scalar = jnp.zeros((1, 8))
            vol = probe_scalar if not cfg.is_tts else None
            aug = probe_scalar if cfg.use_pitch_aug else None

            # one compiled init program: eager flax init dispatches every
            # param-creating op separately (minutes through a tunneled TPU)
            def _init(rng, units, spk):
                return self.module.init(rng, units, volume=vol, spk_id=spk, aug_shift=aug)

            params = jax.jit(_init)(jax.random.PRNGKey(seed), probe_units, probe_spk)["params"]
        self.params = params
        self.diffusion = GaussianDiffusion(
            denoise_fn=self._denoise,
            out_dims=cfg.out_dims,
            timesteps=cfg.timesteps,
            k_step=cfg.k_step,
            max_beta=cfg.max_beta,
            acoustic_scale=cfg.acoustic_scale,
            pad_multiple=2 ** (len(cfg.block_out_channels) - 1),
            prepare_sample_params=self._prepare_sample_params,
        )

    def _pallas_unet_active(self) -> bool:
        # 'auto' deliberately resolves to the XLA path for now: the segmented
        # kernel loses to XLA on per-call invocation overhead (measured —
        # see __init__ docstring).  Explicit 'pallas' is the opt-in.
        return self.unet_impl == "pallas"

    def _prepare_sample_params(self, params):
        """Sampling-only hook, applied once per serve call (before the
        sampler scan): repack UNet weights into the fused-kernel layout, or
        quantize them to int8 for in-scan dequant."""
        if self._pallas_unet_active():
            from latent_diffusion_speech_tpu.ops.pallas.unet1d_fused import pack_unet_params

            return {
                "__unet_packed__": pack_unet_params(params["unet"], self.cfg.unet_config()),
                "raw": params,
            }
        if self.weight_quant == "int8":
            from latent_diffusion_speech_tpu.ops.weight_quant import quantize_tree_int8

            return {"__unet_q__": quantize_tree_int8(params["unet"]), "raw": params}
        return params

    def _denoise(self, params, x, t):
        if isinstance(params, dict) and "__unet_packed__" in params:
            if x.shape[0] == 1:
                from latent_diffusion_speech_tpu.ops.pallas.unet1d_fused import unet_fwd_pallas

                d = jax.devices()[0]
                on_tpu = d.platform == "tpu" or "tpu" in getattr(d, "device_kind", "").lower()
                return unet_fwd_pallas(
                    params["__unet_packed__"], x, t, self.cfg.unet_config(),
                    interpret=not on_tpu,
                )
            params = params["raw"]
        elif isinstance(params, dict) and "__unet_q__" in params:
            # runs INSIDE the sampler scan body: the barrier keeps XLA from
            # hoisting the dequant out of the loop, and convert+scale fuse
            # into the consuming matmuls (no bf16 weight copy materializes)
            from latent_diffusion_speech_tpu.ops.weight_quant import dequantize_tree

            unet = dequantize_tree(params["__unet_q__"], dtype=self.dtype)
            params = {**params["raw"], "unet": unet}
        return self.module.apply({"params": params}, x, t, method=self.module.denoise)

    def condition(self, units, volume=None, spk_id=None, aug_shift=None, params=None):
        params = params if params is not None else self.params
        return self.module.apply(
            {"params": params}, units, volume, spk_id, aug_shift, method=self.module.condition
        )

    def loss(self, params, units, gt_spec, rng, volume=None, spk_id=None, aug_shift=None, k_step=None):
        """Differentiable training loss wrt params."""
        cond = self.condition(units, volume, spk_id, aug_shift, params=params)
        return self.diffusion.p_losses(params, gt_spec, cond, rng, k_step=k_step)

    def infer(
        self,
        units,
        rng,
        volume=None,
        spk_id=None,
        aug_shift=None,
        method: str = "unipc",
        infer_speedup: int = 10,
        gt_spec=None,
        k_step=None,
        params=None,
        x_init=None,
    ):
        params = params if params is not None else self.params
        cond = self.condition(units, volume, spk_id, aug_shift, params=params)
        return self.diffusion.sample(
            params, cond, rng, method=method, infer_speedup=infer_speedup,
            k_step=k_step, gt_spec=gt_spec, x_init=x_init,
        )
