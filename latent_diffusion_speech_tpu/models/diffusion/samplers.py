"""Sampler suite as `lax.scan` programs.

Each sampler takes `eps_fn(x, t) -> eps_hat` where `x` is (B, T, M) and `t` is
a (B,) discrete timestep (float for the continuous solvers' fractional map),
plus the schedule, and compiles the whole trajectory into one XLA program —
replacing the reference's Python step loops (`diffusion/diffusion.py:300-341`)
and the DPM-Solver/UniPC classes (`dpm_solver_pytorch.py`, `uni_pc.py`).

Numerical conventions (parity with the reference):
* DDPM ancestral: posterior mean with x0 clamped to [-1, 1], log-variance
  noise, no noise at t=0 (`diffusion.py:104-121`).
* DDIM: `p_sample_ddim` update (`diffusion.py:123-131`).
* PLMS (PNDM): Adams-Bashforth eps extrapolation with the 1/2, 3/2-1/2,
  23/12-16/12+5/12, 55/24-59/24+37/24-9/24 ladders (`diffusion.py:133-167`).
* DPM-Solver++ multistep order 2, time_uniform, lower-order final step
  (`dpm_solver_pytorch.py:547-955`, driven as in `diffusion.py:215-257`).
* UniPC bh2 order 2 predictor-corrector, no corrector at the last step
  (`uni_pc.py:471-589,590-660`).

Solver coefficient math runs in f32/f64 tables regardless of model dtype.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from latent_diffusion_speech_tpu.models.diffusion.schedule import DiffusionSchedule, NoiseSchedule

EpsFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def _bt(a, t):
    """Gather schedule coeff at t and broadcast over (B, T, M)."""
    return a[t][:, None, None]


# ---------------------------------------------------------------------------
# DDPM ancestral
# ---------------------------------------------------------------------------

def ddpm_sample(
    eps_fn: EpsFn, sched: DiffusionSchedule, x: jnp.ndarray, t_max: int, rng: jax.Array
) -> jnp.ndarray:
    B = x.shape[0]
    sqrt_recip = jnp.asarray(sched.sqrt_recip_alphas_cumprod)
    sqrt_recipm1 = jnp.asarray(sched.sqrt_recipm1_alphas_cumprod)
    pm1 = jnp.asarray(sched.posterior_mean_coef1)
    pm2 = jnp.asarray(sched.posterior_mean_coef2)
    plv = jnp.asarray(sched.posterior_log_variance_clipped)

    def step(carry, i):
        x, rng = carry
        t = jnp.full((B,), i, jnp.int32)
        eps = eps_fn(x, t)
        x0 = _bt(sqrt_recip, t) * x - _bt(sqrt_recipm1, t) * eps
        x0 = jnp.clip(x0, -1.0, 1.0)
        mean = _bt(pm1, t) * x0 + _bt(pm2, t) * x
        rng, sub = jax.random.split(rng)
        noise = jax.random.normal(sub, x.shape, x.dtype)
        nonzero = (i > 0).astype(x.dtype)
        x = mean + nonzero * jnp.exp(0.5 * _bt(plv, t)) * noise
        return (x, rng), None

    (x, _), _ = jax.lax.scan(step, (x, rng), jnp.arange(t_max - 1, -1, -1))
    return x


# ---------------------------------------------------------------------------
# DDIM
# ---------------------------------------------------------------------------

def ddim_sample(
    eps_fn: EpsFn, sched: DiffusionSchedule, x: jnp.ndarray, t_max: int, speedup: int
) -> jnp.ndarray:
    B = x.shape[0]
    ac = jnp.asarray(sched.alphas_cumprod)

    def step(x, i):
        t = jnp.full((B,), i, jnp.int32)
        a_t = _bt(ac, t)
        a_prev = _bt(ac, jnp.maximum(t - speedup, 0))
        eps = eps_fn(x, t)
        x = jnp.sqrt(a_prev) * (
            x / jnp.sqrt(a_t)
            + (jnp.sqrt((1 - a_prev) / a_prev) - jnp.sqrt((1 - a_t) / a_t)) * eps
        )
        return x, None

    x, _ = jax.lax.scan(step, x, jnp.arange(t_max - speedup, -1, -speedup))
    return x


# ---------------------------------------------------------------------------
# PLMS / PNDM
# ---------------------------------------------------------------------------

def plms_sample(
    eps_fn: EpsFn, sched: DiffusionSchedule, x: jnp.ndarray, t_max: int, speedup: int
) -> jnp.ndarray:
    B = x.shape[0]
    ac = jnp.asarray(sched.alphas_cumprod)

    def x_pred(x, noise_t, t):
        a_t = _bt(ac, t)
        a_prev = _bt(ac, jnp.maximum(t - speedup, 0))
        a_t_sq, a_prev_sq = jnp.sqrt(a_t), jnp.sqrt(a_prev)
        x_delta = (a_prev - a_t) * (
            (1.0 / (a_t_sq * (a_t_sq + a_prev_sq))) * x
            - 1.0
            / (a_t_sq * (jnp.sqrt((1 - a_prev) * a_t) + jnp.sqrt((1 - a_t) * a_prev)))
            * noise_t
        )
        return x + x_delta

    def step(carry, args):
        x, e1, e2, e3, count = carry
        i = args
        t = jnp.full((B,), i, jnp.int32)
        eps = eps_fn(x, t)

        # first step: second eval at t - interval for a 2-point average
        def first_eps_prime():
            xp = x_pred(x, eps, t)
            t_prev = jnp.maximum(t - speedup, 0)
            eps_prev = eps_fn(xp, t_prev)
            return (eps + eps_prev) / 2

        # Adams-Bashforth ladders
        ab1 = (3 * eps - e1) / 2
        ab2 = (23 * eps - 16 * e1 + 5 * e2) / 12
        ab3 = (55 * eps - 59 * e1 + 37 * e2 - 9 * e3) / 24
        eps_prime = jax.lax.switch(
            jnp.minimum(count, 3),
            [first_eps_prime, lambda: ab1, lambda: ab2, lambda: ab3],
        )
        x = x_pred(x, eps_prime, t)
        return (x, eps, e1, e2, count + 1), None

    zeros = jnp.zeros_like(x)
    (x, *_), _ = jax.lax.scan(
        step, (x, zeros, zeros, zeros, jnp.int32(0)), jnp.arange(t_max - speedup, -1, -speedup)
    )
    return x


# ---------------------------------------------------------------------------
# continuous-time helpers (shared by DPM-Solver++ and UniPC)
# ---------------------------------------------------------------------------

def _data_pred_fn(eps_fn: EpsFn, ns: NoiseSchedule, B: int):
    """x0-prediction wrapper (dpmsolver++ / predict_x0 convention)."""

    def fn(x, t_cont):
        t_model = jnp.full((B,), ns.to_model_t(t_cont), jnp.float32)
        eps = eps_fn(x, t_model)
        alpha = ns.marginal_alpha(t_cont).astype(x.dtype)
        sigma = ns.marginal_std(t_cont).astype(x.dtype)
        return (x - sigma * eps) / alpha

    return fn


# ---------------------------------------------------------------------------
# DPM-Solver++ (2M: multistep, order 2, time_uniform)
# ---------------------------------------------------------------------------

def dpmpp_sample(
    eps_fn: EpsFn, ns: NoiseSchedule, x: jnp.ndarray, steps: int, order: int = 2,
    return_trajectory: bool = False,
) -> jnp.ndarray:
    """Multistep DPM-Solver++ orders 1-3 (dpm_solver_pytorch.py:547-955).

    return_trajectory=True additionally returns the (steps, *x.shape) stack of
    post-update states x_1..x_steps (diagnostics: numerics divergence studies,
    benchmarks/fidelity_divergence.py)."""
    assert order in (1, 2, 3)
    B = x.shape[0]
    model = _data_pred_fn(eps_fn, ns, B)
    ts = jnp.linspace(ns.T, 1.0 / ns.total_N, steps + 1)
    lambdas = ns.marginal_lambda(ts)
    sigmas = ns.marginal_std(ts)
    alphas = ns.marginal_alpha(ts)

    m0 = model(x, ts[0])

    def update(x, m_0, m_1, m_2, h_prev, h_prev2, idx):
        """One multistep DPM-Solver++ x-update (no model eval).
        m_0 newest; h_prev = λ_{i-1}-λ_{i-2}, h_prev2 = λ_{i-2}-λ_{i-3}."""
        lam_t, lam_s = lambdas[idx + 1], lambdas[idx]
        sig_t, sig_s = sigmas[idx + 1], sigmas[idx]
        alpha_t = alphas[idx + 1]
        h = lam_t - lam_s
        phi_1 = jnp.expm1(-h)
        r0 = h_prev / h
        r1 = h_prev2 / h
        safe = lambda v: jnp.where(v == 0, 1.0, v)
        D1_0 = (m_0 - m_1) / safe(r0)
        D1_1 = (m_1 - m_2) / safe(r1)
        # order per step: builds up over the first steps; lowered at the final
        # steps only when steps < 10 (dpm_solver_pytorch.py:1197-1198)
        step_order = jnp.minimum(idx + 1, order)
        if steps < 10:
            step_order = jnp.minimum(step_order, steps - idx)
        use_d1 = (step_order >= 2).astype(x.dtype)
        use_d2 = (step_order >= 3).astype(x.dtype)

        base = (sig_t / sig_s) * x - (alpha_t * phi_1) * m_0
        # order-2 term
        o2 = -0.5 * (alpha_t * phi_1) * D1_0
        # order-3 terms (multistep_dpm_solver_third_update, dpmsolver++)
        D1 = D1_0 + (r0 / safe(r0 + r1)) * (D1_0 - D1_1)
        D2 = (D1_0 - D1_1) / safe(r0 + r1)
        phi_2 = phi_1 / jnp.where(h == 0, 1.0, h) + 1.0
        phi_3 = phi_2 / jnp.where(h == 0, 1.0, h) - 0.5
        o3 = alpha_t * phi_2 * D1 - alpha_t * phi_3 * D2

        x = base + jnp.where(use_d2 > 0, o3, use_d1 * o2)
        return x, h

    # scan over the first steps-1 iterations (each evaluates the model once);
    # the final update needs no model eval and runs outside the scan — this
    # keeps the model call unconditional in the scan body (a lax.cond around
    # the whole UNet doubles the compiled body)
    def step2(carry, idx):
        x, m_0, m_1, m_2, h_prev, h_prev2 = carry
        x, h = update(x, m_0, m_1, m_2, h_prev, h_prev2, idx)
        m_new = model(x, ts[idx + 1])
        return (x, m_new, m_0, m_1, h, h_prev), (x if return_trajectory else None)

    one = jnp.array(1.0, lambdas.dtype)
    carry = (x, m0, jnp.zeros_like(m0), jnp.zeros_like(m0), one, one)
    traj = None
    if steps > 1:
        carry, traj = jax.lax.scan(step2, carry, jnp.arange(steps - 1))
    x, m_0, m_1, m_2, h_prev, h_prev2 = carry
    x, _ = update(x, m_0, m_1, m_2, h_prev, h_prev2, jnp.asarray(steps - 1))
    if return_trajectory:
        tail = x[None]
        traj = tail if traj is None else jnp.concatenate([traj, tail], axis=0)
        return x, traj
    return x


# ---------------------------------------------------------------------------
# UniPC (bh2, multistep order 2, predictor-corrector)
# ---------------------------------------------------------------------------

def unipc_sample(
    eps_fn: EpsFn, ns: NoiseSchedule, x: jnp.ndarray, steps: int, order: int = 2, variant: str = "bh2"
) -> jnp.ndarray:
    assert order in (1, 2)
    B = x.shape[0]
    model = _data_pred_fn(eps_fn, ns, B)
    ts = jnp.linspace(ns.T, 1.0 / ns.total_N, steps + 1)
    lambdas = ns.marginal_lambda(ts)
    sigmas = ns.marginal_std(ts)
    alphas = ns.marginal_alpha(ts)

    m0 = model(x, ts[0])

    def coeffs(x, m_0, m_1, lam_prev_1, idx):
        """Predictor state + shared coefficients for step idx -> idx+1."""
        lam_t, lam_s = lambdas[idx + 1], lambdas[idx]
        sig_t, sig_s = sigmas[idx + 1], sigmas[idx]
        alpha_t = alphas[idx + 1]
        h = lam_t - lam_s
        hh = -h
        h_phi_1 = jnp.expm1(hh)
        B_h = jnp.expm1(hh) if variant == "bh2" else hh

        step_order = jnp.minimum(jnp.minimum(idx + 1, order), steps - idx)
        is_order2 = (step_order >= 2).astype(x.dtype)

        r0 = (lam_prev_1 - lam_s) / h
        r0_safe = jnp.where(r0 == 0, 1.0, r0)
        D1_0 = (m_1 - m_0) / r0_safe  # (model_prev_i - model_prev_0)/rk

        # b coefficients (bh variant recurrence, uni_pc.py:500-522)
        h_phi_k1 = h_phi_1 / hh - 1.0
        b1 = h_phi_k1 * 1.0 / B_h
        h_phi_k2 = h_phi_k1 / hh - 0.5
        b2 = h_phi_k2 * 2.0 / B_h

        x_t_ = (sig_t / sig_s) * x - (alpha_t * h_phi_1) * m_0
        # predictor: order2 rhos_p = [0.5]; order1 has no D1 term
        x_pred = x_t_ - is_order2 * (alpha_t * B_h) * (0.5 * D1_0)
        return x_t_, x_pred, (alpha_t, B_h, r0, b1, b2, is_order2, D1_0)

    # scan over steps-1 iterations with the corrector (one model eval each);
    # the final step has no corrector (uni_pc.py:640-644) and runs outside —
    # keeping the UNet call unconditional in the scan body
    def step(carry, idx):
        x, m_0, m_1, lam_prev_1 = carry
        x_t_, x_pred, (alpha_t, B_h, r0, b1, b2, is_order2, D1_0) = coeffs(
            x, m_0, m_1, lam_prev_1, idx
        )
        m_t = model(x_pred, ts[idx + 1])
        # corrector: order2 solves [[1,1],[r0,1]] rhos = [b1,b2]; order1 uses [0.5]
        denom = jnp.where(1.0 - r0 == 0, 1.0, 1.0 - r0)
        rc0_o2 = (b1 - b2) / denom
        rc1_o2 = b2 - rc0_o2 * r0
        rc_d1 = is_order2 * rc0_o2
        rc_dt = is_order2 * rc1_o2 + (1 - is_order2) * 0.5
        x_new = x_t_ - (alpha_t * B_h) * (rc_d1 * D1_0 + rc_dt * (m_t - m_0))
        return (x_new, m_t, m_0, lambdas[idx]), None

    carry = (x, m0, jnp.zeros_like(m0), lambdas[0])
    if steps > 1:
        carry, _ = jax.lax.scan(step, carry, jnp.arange(steps - 1))
    x, m_0, m_1, lam_prev_1 = carry
    _, x_pred, _ = coeffs(x, m_0, m_1, lam_prev_1, jnp.asarray(steps - 1))
    return x_pred


# ---------------------------------------------------------------------------
# DPM-Solver++ singlestep ("DPM-Solver-fast": mixed orders 1-3)
# ---------------------------------------------------------------------------

def _singlestep_updates(model, ns: NoiseSchedule):
    """The three dpmsolver++ singlestep updates (dpm_solver_pytorch.py:547-846,
    solver_type='dpmsolver').  Each takes scalar continuous times (s, t) and
    runs its own intermediate model evals."""

    def first(x, s, t, model_s=None):
        lam_s, lam_t = ns.marginal_lambda(s), ns.marginal_lambda(t)
        sig_s, sig_t = ns.marginal_std(s), ns.marginal_std(t)
        alpha_t = ns.marginal_alpha(t)
        phi_1 = jnp.expm1(-(lam_t - lam_s))
        if model_s is None:
            model_s = model(x, s)
        return (sig_t / sig_s) * x - (alpha_t * phi_1) * model_s, model_s

    def second(x, s, t, r1=0.5, model_s=None):
        lam_s, lam_t = ns.marginal_lambda(s), ns.marginal_lambda(t)
        h = lam_t - lam_s
        s1 = ns.inverse_lambda(lam_s + r1 * h)
        sig_s, sig_s1, sig_t = ns.marginal_std(s), ns.marginal_std(s1), ns.marginal_std(t)
        alpha_s1, alpha_t = ns.marginal_alpha(s1), ns.marginal_alpha(t)
        phi_11 = jnp.expm1(-r1 * h)
        phi_1 = jnp.expm1(-h)
        if model_s is None:
            model_s = model(x, s)
        x_s1 = (sig_s1 / sig_s) * x - (alpha_s1 * phi_11) * model_s
        model_s1 = model(x_s1, s1)
        x_t = (
            (sig_t / sig_s) * x
            - (alpha_t * phi_1) * model_s
            - (0.5 / r1) * (alpha_t * phi_1) * (model_s1 - model_s)
        )
        return x_t, (model_s, model_s1)

    def third(x, s, t, r1=1.0 / 3, r2=2.0 / 3, model_s=None, model_s1=None):
        lam_s, lam_t = ns.marginal_lambda(s), ns.marginal_lambda(t)
        h = lam_t - lam_s
        s1 = ns.inverse_lambda(lam_s + r1 * h)
        s2 = ns.inverse_lambda(lam_s + r2 * h)
        sig_s, sig_s1, sig_s2, sig_t = (
            ns.marginal_std(s), ns.marginal_std(s1), ns.marginal_std(s2), ns.marginal_std(t)
        )
        alpha_s1, alpha_s2, alpha_t = (
            ns.marginal_alpha(s1), ns.marginal_alpha(s2), ns.marginal_alpha(t)
        )
        phi_11 = jnp.expm1(-r1 * h)
        phi_12 = jnp.expm1(-r2 * h)
        phi_1 = jnp.expm1(-h)
        phi_22 = jnp.expm1(-r2 * h) / (r2 * h) + 1.0
        phi_2 = phi_1 / h + 1.0
        if model_s is None:
            model_s = model(x, s)
        if model_s1 is None:
            x_s1 = (sig_s1 / sig_s) * x - (alpha_s1 * phi_11) * model_s
            model_s1 = model(x_s1, s1)
        x_s2 = (
            (sig_s2 / sig_s) * x
            - (alpha_s2 * phi_12) * model_s
            + (r2 / r1) * (alpha_s2 * phi_22) * (model_s1 - model_s)
        )
        model_s2 = model(x_s2, s2)
        x_t = (
            (sig_t / sig_s) * x
            - (alpha_t * phi_1) * model_s
            + (1.0 / r2) * (alpha_t * phi_2) * (model_s2 - model_s)
        )
        return x_t, (model_s, model_s1)

    return first, second, third


def singlestep_orders(steps: int, order: int):
    """Order list for DPM-Solver-fast (dpm_solver_pytorch.py:482-540)."""
    if order == 3:
        K = steps // 3 + 1
        if steps % 3 == 0:
            return [3] * (K - 2) + [2, 1]
        if steps % 3 == 1:
            return [3] * (K - 1) + [1]
        return [3] * (K - 1) + [2]
    if order == 2:
        if steps % 2 == 0:
            return [2] * (steps // 2)
        return [2] * (steps // 2) + [1]
    if order == 1:
        return [1] * steps
    raise ValueError("'order' must be 1, 2 or 3")


def dpmpp_singlestep_sample(
    eps_fn: EpsFn, ns: NoiseSchedule, x: jnp.ndarray, steps: int, order: int = 2
) -> jnp.ndarray:
    """Singlestep DPM-Solver++ ("DPM-Solver-fast", dpm_solver_pytorch.py
    sample(method='singlestep'), time_uniform): `steps` model evals split
    into blocks of the given max order.  The order pattern is static, so the
    mixed-order trajectory compiles as straight-line XLA."""
    B = x.shape[0]
    model = _data_pred_fn(eps_fn, ns, B)
    first, second, third = _singlestep_updates(model, ns)
    orders = singlestep_orders(steps, order)
    import numpy as _np

    t_seq = jnp.linspace(ns.T, 1.0 / ns.total_N, steps + 1)
    outer = t_seq[_np.cumsum([0] + orders)]
    for i, o in enumerate(orders):
        s, t = outer[i], outer[i + 1]
        # r1/r2 come from the lambda spacing of a time-uniform inner grid
        # (dpm_solver_pytorch.py:1223-1227), not the fixed 0.5 / (1/3, 2/3)
        inner = jnp.linspace(s, t, o + 1)
        lam = ns.marginal_lambda(inner)
        h = lam[-1] - lam[0]
        if o == 1:
            x, _ = first(x, s, t)
        elif o == 2:
            x, _ = second(x, s, t, r1=(lam[1] - lam[0]) / h)
        else:
            x, _ = third(x, s, t, r1=(lam[1] - lam[0]) / h, r2=(lam[2] - lam[0]) / h)
    return x


def dpmpp_adaptive_sample(
    eps_fn: EpsFn,
    ns: NoiseSchedule,
    x: jnp.ndarray,
    order: int = 2,
    h_init: float = 0.05,
    atol: float = 0.0078,
    rtol: float = 0.05,
    theta: float = 0.9,
    t_err: float = 1e-5,
    max_iters: int = 200,
) -> jnp.ndarray:
    """Adaptive step-size DPM-Solver++ (dpm_solver_pytorch.py:956-1045) as a
    `lax.while_loop`: embedded (order-1, order-2) or (order-2, order-3) pairs,
    step accepted when the scaled local-error RMS is <= 1, logSNR step adapted
    by theta * E^(-1/order).  `max_iters` bounds the compiled loop as a safety
    net (the reference loops unboundedly)."""
    assert order in (2, 3)
    B = x.shape[0]
    model = _data_pred_fn(eps_fn, ns, B)
    first, second, third = _singlestep_updates(model, ns)
    t_0 = 1.0 / ns.total_N
    lambda_0 = ns.marginal_lambda(jnp.asarray(t_0))

    def lower_higher(x, s, t):
        if order == 2:
            x_low, model_s = first(x, s, t)
            x_high, _ = second(x, s, t, model_s=model_s)
        else:
            # r1=1/3 so the lower update's intermediate eval is shared with
            # the third-order update (dpm_solver_adaptive, :1000-1004)
            x_low, (model_s, model_s1) = second(x, s, t, r1=1.0 / 3)
            x_high, _ = third(x, s, t, model_s=model_s, model_s1=model_s1)
        return x_low, x_high

    def cond(carry):
        x, x_prev, s, h, it = carry
        return jnp.logical_and(jnp.abs(s - t_0) > t_err, it < max_iters)

    def body(carry):
        x, x_prev, s, h, it = carry
        lam_s = ns.marginal_lambda(s)
        t = ns.inverse_lambda(lam_s + h)
        x_low, x_high = lower_higher(x, s, t)
        delta = jnp.maximum(atol, rtol * jnp.maximum(jnp.abs(x_low), jnp.abs(x_prev)))
        err = ((x_high - x_low) / delta).reshape(B, -1)
        E = jnp.max(jnp.sqrt(jnp.mean(err**2, axis=-1)))
        accept = E <= 1.0
        x = jnp.where(accept, x_high, x)
        x_prev = jnp.where(accept, x_low, x_prev)
        s_new = jnp.where(accept, t, s)
        lam_new = ns.marginal_lambda(s_new)
        h = jnp.minimum(theta * h * E ** (-1.0 / order), lambda_0 - lam_new)
        return (x, x_prev, s_new, h, it + 1)

    carry = (x, x, jnp.asarray(ns.T, jnp.float32), jnp.asarray(h_init, jnp.float32),
             jnp.int32(0))
    x, *_ = jax.lax.while_loop(cond, body, carry)
    return x


# ---------------------------------------------------------------------------
# UniPC vary-coeff (order 2)
# ---------------------------------------------------------------------------

def unipc_vary_sample(
    eps_fn: EpsFn, ns: NoiseSchedule, x: jnp.ndarray, steps: int, order: int = 2
) -> jnp.ndarray:
    """UniPC variant='vary_coeff' (uni_pc.py:368-470), multistep order <= 2,
    predict_x0, corrector on every step but the last — same driver shape as
    `unipc_sample`, different (Vandermonde-solved) coefficients.

    Order-2 closed forms: C = [[1, r0/2], [1, 1/2]], A_p = [[1]],
    A_c = inv(C); phi_k recurrence phi_{k+1} = phi_k / (-h) - 1/k!."""
    assert order in (1, 2)
    B = x.shape[0]
    model = _data_pred_fn(eps_fn, ns, B)
    ts = jnp.linspace(ns.T, 1.0 / ns.total_N, steps + 1)
    lambdas = ns.marginal_lambda(ts)
    sigmas = ns.marginal_std(ts)
    alphas = ns.marginal_alpha(ts)

    m0 = model(x, ts[0])

    def coeffs(x, m_0, m_1, lam_prev_1, idx):
        lam_t, lam_s = lambdas[idx + 1], lambdas[idx]
        sig_t, sig_s = sigmas[idx + 1], sigmas[idx]
        alpha_t = alphas[idx + 1]
        h = lam_t - lam_s
        hh = -h
        phi_1 = jnp.expm1(hh)
        phi_2 = phi_1 / hh - 1.0
        phi_3 = phi_2 / hh - 0.5

        step_order = jnp.minimum(jnp.minimum(idx + 1, order), steps - idx)
        is2 = (step_order >= 2).astype(x.dtype)

        r0 = (lam_prev_1 - lam_s) / h
        r0_safe = jnp.where(r0 == 0, 0.5, r0)
        D1_0 = (m_1 - m_0) / r0_safe

        x_t_ = (sig_t / sig_s) * x - (alpha_t * phi_1) * m_0
        # predictor: A_p = [[1]] -> one phi_2 D1_0 residual (order 2 only)
        x_pred = x_t_ - is2 * (alpha_t * phi_2) * D1_0
        # corrector rows of A_c = inv([[1, r0/2], [1, 1/2]])
        det = jnp.where(1.0 - r0_safe == 0, 1.0, (1.0 - r0_safe) / 2.0)
        a00 = 0.5 / det       # coefficient on D1_0 (phi_2 term)
        a01 = -r0_safe / (2.0 * det)  # coefficient on D1_t (phi_3 term)
        return x_t_, x_pred, (alpha_t, phi_2, phi_3, a00, a01, is2, D1_0)

    def step(carry, idx):
        x, m_0, m_1, lam_prev_1 = carry
        x_t_, x_pred, (alpha_t, phi_2, phi_3, a00, a01, is2, D1_0) = coeffs(
            x, m_0, m_1, lam_prev_1, idx
        )
        m_t = model(x_pred, ts[idx + 1])
        D1_t = m_t - m_0
        x_o2 = x_t_ - (alpha_t * phi_2) * (a00 * D1_0) - (alpha_t * phi_3) * (a01 * D1_t)
        x_o1 = x_t_ - (alpha_t * phi_2) * D1_t  # K=1 corrector: A_c = [[1]]
        x_new = is2 * x_o2 + (1 - is2) * x_o1
        return (x_new, m_t, m_0, lambdas[idx]), None

    carry = (x, m0, jnp.zeros_like(m0), lambdas[0])
    if steps > 1:
        carry, _ = jax.lax.scan(step, carry, jnp.arange(steps - 1))
    x, m_0, m_1, lam_prev_1 = carry
    _, x_pred, _ = coeffs(x, m_0, m_1, lam_prev_1, jnp.asarray(steps - 1))
    return x_pred
