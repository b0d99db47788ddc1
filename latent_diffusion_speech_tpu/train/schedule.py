"""LR schedules.

`warmup_step_decay` reproduces the reference `StepLRWithWarmUp`
(`tools/tools.py:165-183`): linear ramp from start_lr to lr over
warm_up_steps, then lr * gamma^(step // decay_step).
"""

from __future__ import annotations

import optax

__all__ = ["warmup_step_decay"]


def warmup_step_decay(
    lr: float,
    start_lr: float = 1e-5,
    warm_up_steps: int = 1000,
    decay_step: int = 300_000,
    gamma: float = 0.5,
) -> optax.Schedule:
    def schedule(step):
        import jax.numpy as jnp

        warm = start_lr + (lr - start_lr) * (step / max(warm_up_steps, 1))
        decayed = lr * gamma ** (step // decay_step)
        return jnp.where(step < warm_up_steps, warm, decayed)

    return schedule
