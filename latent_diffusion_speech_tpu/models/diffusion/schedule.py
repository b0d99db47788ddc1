"""Diffusion schedules: discrete DDPM coefficients + continuous VP wrapper.

`DiffusionSchedule` holds the precomputed discrete-time arrays the reference
registers as buffers (`diffusion/diffusion.py:50-82`): linear beta 1e-4 -> 0.02
over T=1000, alphas-cumprod and the q/posterior coefficients.

`NoiseSchedule` is the continuous-time VP view used by the fast solvers
(`dpm_solver_pytorch.py:6-168` 'discrete' mode): piecewise-linear
interpolation of 0.5*log(alpha_cumprod) over t in [1/N, 1], giving
alpha(t), sigma(t), lambda(t) = log(alpha/sigma) and the t -> discrete
model-input mapping (t - 1/N) * 1000.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

__all__ = ["linear_beta_schedule", "cosine_beta_schedule", "DiffusionSchedule", "NoiseSchedule"]


def linear_beta_schedule(timesteps: int, max_beta: float = 0.02) -> np.ndarray:
    return np.linspace(1e-4, max_beta, timesteps)


def cosine_beta_schedule(timesteps: int, s: float = 0.008) -> np.ndarray:
    steps = timesteps + 1
    x = np.linspace(0, steps, steps)
    ac = np.cos(((x / steps) + s) / (1 + s) * np.pi * 0.5) ** 2
    ac = ac / ac[0]
    betas = 1 - (ac[1:] / ac[:-1])
    return np.clip(betas, 0, 0.999)


@dataclass(frozen=True)
class DiffusionSchedule:
    betas: np.ndarray
    alphas_cumprod: np.ndarray = field(init=False)
    alphas_cumprod_prev: np.ndarray = field(init=False)
    sqrt_alphas_cumprod: np.ndarray = field(init=False)
    sqrt_one_minus_alphas_cumprod: np.ndarray = field(init=False)
    sqrt_recip_alphas_cumprod: np.ndarray = field(init=False)
    sqrt_recipm1_alphas_cumprod: np.ndarray = field(init=False)
    posterior_variance: np.ndarray = field(init=False)
    posterior_log_variance_clipped: np.ndarray = field(init=False)
    posterior_mean_coef1: np.ndarray = field(init=False)
    posterior_mean_coef2: np.ndarray = field(init=False)

    def __post_init__(self):
        betas = np.asarray(self.betas, np.float64)
        alphas = 1.0 - betas
        ac = np.cumprod(alphas)
        ac_prev = np.append(1.0, ac[:-1])
        pv = betas * (1.0 - ac_prev) / (1.0 - ac)

        def setf(name, val):
            object.__setattr__(self, name, np.asarray(val, np.float32))

        setf("betas", betas)
        setf("alphas_cumprod", ac)
        setf("alphas_cumprod_prev", ac_prev)
        setf("sqrt_alphas_cumprod", np.sqrt(ac))
        setf("sqrt_one_minus_alphas_cumprod", np.sqrt(1.0 - ac))
        setf("sqrt_recip_alphas_cumprod", np.sqrt(1.0 / ac))
        setf("sqrt_recipm1_alphas_cumprod", np.sqrt(1.0 / ac - 1.0))
        setf("posterior_variance", pv)
        setf("posterior_log_variance_clipped", np.log(np.maximum(pv, 1e-20)))
        setf("posterior_mean_coef1", betas * np.sqrt(ac_prev) / (1.0 - ac))
        setf("posterior_mean_coef2", (1.0 - ac_prev) * np.sqrt(alphas) / (1.0 - ac))

    @classmethod
    def linear(cls, timesteps: int = 1000, max_beta: float = 0.02) -> "DiffusionSchedule":
        return cls(linear_beta_schedule(timesteps, max_beta))

    @property
    def num_timesteps(self) -> int:
        return len(self.betas)


class NoiseSchedule:
    """Continuous-time VP schedule over a discrete beta array (f64 tables,
    f32 outputs — solver coefficient math stays in high precision while the
    model runs bf16/f32, per SURVEY.md 'Hard parts')."""

    def __init__(self, betas: np.ndarray):
        betas = np.asarray(betas, np.float64)
        self.total_N = len(betas)
        self.T = 1.0
        log_alphas = 0.5 * np.cumsum(np.log(1.0 - betas))
        self.t_array = jnp.asarray((np.arange(self.total_N) + 1.0) / self.total_N)
        self.log_alpha_array = jnp.asarray(log_alphas)

    def marginal_log_mean_coeff(self, t):
        return jnp.interp(t, self.t_array, self.log_alpha_array)

    def marginal_alpha(self, t):
        return jnp.exp(self.marginal_log_mean_coeff(t))

    def marginal_std(self, t):
        return jnp.sqrt(1.0 - jnp.exp(2.0 * self.marginal_log_mean_coeff(t)))

    def marginal_lambda(self, t):
        log_mean = self.marginal_log_mean_coeff(t)
        log_std = 0.5 * jnp.log(1.0 - jnp.exp(2.0 * log_mean))
        return log_mean - log_std

    def to_model_t(self, t):
        """Continuous t in [1/N, 1] -> discrete model input in [0, N-1]
        (dpm_solver_pytorch.py model_wrapper 'discrete' convention)."""
        return (t - 1.0 / self.total_N) * 1000.0

    def inverse_lambda(self, lamb):
        """Continuous t for a given half-logSNR (dpm_solver_pytorch.py:164-167,
        'discrete' branch: interp over the flipped log-alpha table)."""
        log_alpha = -0.5 * jnp.logaddexp(0.0, -2.0 * lamb)
        return jnp.interp(log_alpha, self.log_alpha_array[::-1], self.t_array[::-1])
