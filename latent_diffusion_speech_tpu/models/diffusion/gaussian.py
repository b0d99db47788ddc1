"""Gaussian diffusion: training losses + sampling dispatch.

Behavior parity with the reference `GaussianDiffusion` (`diffusion/diffusion.py:45-349`):
* linear beta 1e-4 -> max_beta over `timesteps`; eps-prediction L2 (or L1) loss
  with uniform t in [0, k_step).
* inference from pure noise at t = k_step (or from q_sample(gt, k_step) for
  shallow-diffusion), through one of: ddpm | ddim | pndm | dpm-solver | unipc,
  steps = k_step // infer_speedup.
* spec normalization: the reference's effective behavior is the scalar
  `acoustic_scale` lambda (`diffusion.py:86-87`, which shadows the min/max
  method — SURVEY.md 2.9); implemented as such.

Layout: condition (B, T, H), spec (B, T, M); the denoiser input is the
channel-concat [x_t ++ cond] -> (B, T, M+H) (ref `diffusion.py:105-106`).
T is padded to the UNet's downsample grid and cropped back.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from latent_diffusion_speech_tpu.models.diffusion.samplers import (
    ddim_sample,
    ddpm_sample,
    dpmpp_adaptive_sample,
    dpmpp_sample,
    dpmpp_singlestep_sample,
    plms_sample,
    unipc_sample,
    unipc_vary_sample,
)
from latent_diffusion_speech_tpu.models.diffusion.schedule import DiffusionSchedule, NoiseSchedule

__all__ = ["GaussianDiffusion"]


class GaussianDiffusion:
    def __init__(
        self,
        denoise_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
        out_dims: int = 128,
        timesteps: int = 1000,
        k_step: int = 1000,
        max_beta: float = 0.02,
        acoustic_scale: float = 1.0,
        pad_multiple: int = 8,
        prepare_sample_params: Optional[Callable] = None,
    ):
        """denoise_fn: (params, [x_t ++ cond] (B, T, M+H), t (B,)) -> eps (B, T, M).

        Params are threaded explicitly through `p_losses`/`sample` so jitted
        callers keep them as arguments (closures would bake weights into the
        HLO as constants).

        prepare_sample_params: optional once-per-sample transform applied to
        `params` before the sampler scan (e.g. repacking weights into a Pallas
        kernel layout) — it runs outside the scan body, so its cost is paid
        once per serve call rather than per denoiser step. Inference only;
        `p_losses` always sees raw params."""
        self.denoise_fn = denoise_fn
        self.out_dims = out_dims
        self.k_step = k_step
        self.acoustic_scale = acoustic_scale
        self.pad_multiple = pad_multiple
        self.prepare_sample_params = prepare_sample_params
        self.schedule = DiffusionSchedule.linear(timesteps, max_beta)

    def norm_spec(self, x):
        return x * self.acoustic_scale

    def denorm_spec(self, x):
        return x / self.acoustic_scale

    def q_sample(self, x_start: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray) -> jnp.ndarray:
        s = self.schedule
        a = jnp.asarray(s.sqrt_alphas_cumprod)[t][:, None, None]
        b = jnp.asarray(s.sqrt_one_minus_alphas_cumprod)[t][:, None, None]
        return a * x_start + b * noise

    def _eps_fn(self, params, cond: jnp.ndarray):
        def fn(x, t):
            return self.denoise_fn(params, jnp.concatenate([x, cond.astype(x.dtype)], axis=-1), t)

        return fn

    def p_losses(
        self,
        params,
        gt_spec: jnp.ndarray,
        cond: jnp.ndarray,
        rng: jax.Array,
        k_step: Optional[int] = None,
        loss_type: str = "l2",
    ) -> jnp.ndarray:
        """Training loss. gt_spec (B, T, M), cond (B, T, H)."""
        B = gt_spec.shape[0]
        t_max = k_step or self.k_step
        rng_t, rng_n = jax.random.split(rng)
        t = jax.random.randint(rng_t, (B,), 0, t_max)
        x_start = self.norm_spec(gt_spec)
        noise = jax.random.normal(rng_n, x_start.shape, x_start.dtype)
        x_noisy = self.q_sample(x_start, t, noise)

        x_noisy, cond, orig_T = self._pad(x_noisy, cond)
        eps_hat = self._eps_fn(params, cond)(x_noisy, t)[:, :orig_T]
        noise = noise[:, :orig_T]

        if loss_type == "l1":
            return jnp.mean(jnp.abs(noise - eps_hat))
        if loss_type == "l2":
            return jnp.mean((noise - eps_hat) ** 2)
        raise NotImplementedError(loss_type)

    def _pad(self, x, cond):
        """Pad the frame axis to the UNet downsample grid."""
        T = x.shape[1]
        m = self.pad_multiple
        pad = (m - T % m) % m
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
            cond = jnp.pad(cond, ((0, 0), (0, pad), (0, 0)))
        return x, cond, T

    def sample(
        self,
        params,
        cond: jnp.ndarray,
        rng: jax.Array,
        method: str = "unipc",
        infer_speedup: int = 10,
        k_step: Optional[int] = None,
        gt_spec: Optional[jnp.ndarray] = None,
        x_init: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Generate spec (B, T, M) from condition (B, T, H).

        With gt_spec + k_step: shallow diffusion from q_sample(gt, k_step-1)
        (ref diffusion.py:205-212); else from pure noise at t = k_step.
        x_init overrides the drawn x_T (same-noise fidelity comparisons).
        """
        B, T = cond.shape[0], cond.shape[1]
        t_max = k_step if (gt_spec is not None and k_step is not None) else self.k_step

        rng, sub = jax.random.split(rng)
        if x_init is not None:
            x = x_init.astype(cond.dtype)
        elif gt_spec is None or k_step is None:
            x = jax.random.normal(sub, (B, T, self.out_dims), cond.dtype)
        else:
            norm = self.norm_spec(gt_spec)
            noise = jax.random.normal(sub, norm.shape, norm.dtype)
            t0 = jnp.full((B,), t_max - 1, jnp.int32)
            x = self.q_sample(norm, t0, noise)

        x, cond_p, orig_T = self._pad(x, cond)
        if self.prepare_sample_params is not None:
            params = self.prepare_sample_params(params)
        eps_fn = self._eps_fn(params, cond_p)

        if method is None or infer_speedup <= 1:
            rng, sub = jax.random.split(rng)
            x = ddpm_sample(eps_fn, self.schedule, x, t_max, sub)
        elif method == "ddpm":
            rng, sub = jax.random.split(rng)
            x = ddpm_sample(eps_fn, self.schedule, x, t_max, sub)
        elif method == "ddim":
            x = ddim_sample(eps_fn, self.schedule, x, t_max, infer_speedup)
        elif method == "pndm":
            x = plms_sample(eps_fn, self.schedule, x, t_max, infer_speedup)
        elif method == "dpm-solver":
            ns = NoiseSchedule(self.schedule.betas[:t_max])
            x = dpmpp_sample(eps_fn, ns, x, steps=t_max // infer_speedup, order=2)
        elif method == "unipc":
            ns = NoiseSchedule(self.schedule.betas[:t_max])
            x = unipc_sample(eps_fn, ns, x, steps=t_max // infer_speedup, order=2)
        elif method == "dpm-solver-singlestep":
            ns = NoiseSchedule(self.schedule.betas[:t_max])
            x = dpmpp_singlestep_sample(eps_fn, ns, x, steps=t_max // infer_speedup, order=2)
        elif method == "dpm-solver-adaptive":
            ns = NoiseSchedule(self.schedule.betas[:t_max])
            x = dpmpp_adaptive_sample(eps_fn, ns, x, order=2)
        elif method == "unipc-vary":
            ns = NoiseSchedule(self.schedule.betas[:t_max])
            x = unipc_vary_sample(eps_fn, ns, x, steps=t_max // infer_speedup, order=2)
        else:
            raise NotImplementedError(method)

        return self.denorm_spec(x[:, :orig_T])
