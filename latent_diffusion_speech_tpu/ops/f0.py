"""Frame-wise F0 (pitch) extraction — YIN, vectorized in JAX.

The reference *uses* an `extract_f0` (`tools/infer_tools.py:88`) that is never
defined (SVC residue, SURVEY.md 2.9); this implements the intended capability:
per-frame fundamental frequency + voicing for the SVC conditioning path.

Algorithm: YIN (de Cheveigné & Kawahara 2002) — cumulative-mean-normalized
difference over candidate lags, absolute threshold with argmin fallback,
parabolic interpolation.  The difference function is computed for all frames
at once via batched FFT autocorrelation (MXU/VPU friendly; no per-frame loop).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["extract_f0"]


@partial(jax.jit, static_argnames=("sr", "hop_size", "win_size", "f0_min", "f0_max", "threshold"))
def extract_f0(
    audio: jnp.ndarray,
    sr: int = 44100,
    hop_size: int = 512,
    win_size: int = 2048,
    f0_min: float = 40.0,
    f0_max: float = 1200.0,
    threshold: float = 0.15,
):
    """audio (..., T) -> (f0 (..., n_frames), voiced (..., n_frames) bool).

    n_frames = T // hop_size + 1 (the pipeline's latent frame convention);
    unvoiced frames report f0 = 0.
    """
    squeeze = audio.ndim == 1
    if squeeze:
        audio = audio[None]
    B, T = audio.shape

    n_frames = T // hop_size + 1
    pad = win_size  # center frames; reflect where possible
    x = jnp.pad(audio, ((0, 0), (pad // 2, pad)), mode="constant")
    starts = jnp.arange(n_frames) * hop_size
    idx = starts[:, None] + jnp.arange(win_size)[None, :]
    frames = x[:, idx]  # (B, n_frames, win)
    frames = frames - jnp.mean(frames, axis=-1, keepdims=True)

    tau_max = min(int(sr / f0_min), win_size // 2)
    tau_min = max(int(sr / f0_max), 2)

    # difference function d(tau) = sum_j (x_j - x_{j+tau})^2 over a fixed
    # integration window W = win - tau_max, via FFT cross-correlation:
    # d(tau) = e0 + e_tau - 2 * sum_j x_j x_{j+tau}
    W = win_size - tau_max
    n_fft = 1 << (win_size * 2 - 1).bit_length()
    spec = jnp.fft.rfft(frames, n=n_fft)
    head = jnp.fft.rfft(frames[..., :W], n=n_fft)
    corr = jnp.fft.irfft(spec * jnp.conj(head), n=n_fft)[..., : tau_max + 1]  # (B,F,tau)

    csq = jnp.cumsum(frames**2, axis=-1)
    e0 = csq[..., W - 1]  # energy of x[0:W]
    # energy of x[tau : tau+W] for each tau
    pad_csq = jnp.pad(csq, ((0, 0), (0, 0), (1, 0)))
    taus = jnp.arange(tau_max + 1)
    e_tau = pad_csq[..., taus + W] - pad_csq[..., taus]
    d = e0[..., None] + e_tau - 2.0 * corr  # (B, F, tau+1)
    d = jnp.maximum(d, 0.0)

    # cumulative mean normalized difference
    cum = jnp.cumsum(d[..., 1:], axis=-1)
    cmnd = d[..., 1:] * jnp.arange(1, tau_max + 1) / jnp.maximum(cum, 1e-12)
    cmnd = jnp.concatenate([jnp.ones_like(d[..., :1]), cmnd], axis=-1)

    # candidate range mask
    lag_ok = (taus >= tau_min) & (taus <= tau_max - 1)
    masked = jnp.where(lag_ok, cmnd, jnp.inf)

    # YIN lag choice: first threshold crossing, then descend to the local
    # minimum of that dip (the crossing itself is early-biased); fall back to
    # the global argmin when nothing crosses
    below = masked < threshold
    first_below = jnp.argmax(below, axis=-1)
    any_below = jnp.any(below, axis=-1)
    # window [fc, 1.4*fc): contains the dip bottom, excludes the next period
    lo = first_below[..., None]
    hi = jnp.minimum((first_below * 7) // 5 + 2, tau_max)[..., None]
    in_dip = (taus >= lo) & (taus < hi)
    dip_min = jnp.argmin(jnp.where(in_dip, masked, jnp.inf), axis=-1)
    best = jnp.where(any_below, dip_min, jnp.argmin(masked, axis=-1))

    # parabolic interpolation around the chosen lag
    b0 = jnp.clip(best, 1, tau_max - 1)
    dm = jnp.take_along_axis(cmnd, (b0 - 1)[..., None], axis=-1)[..., 0]
    dc = jnp.take_along_axis(cmnd, b0[..., None], axis=-1)[..., 0]
    dp = jnp.take_along_axis(cmnd, (b0 + 1)[..., None], axis=-1)[..., 0]
    denom = dm - 2 * dc + dp
    shift = jnp.where(jnp.abs(denom) > 1e-12, 0.5 * (dm - dp) / denom, 0.0)
    tau_refined = b0.astype(jnp.float32) + jnp.clip(shift, -1.0, 1.0)

    f0 = sr / jnp.maximum(tau_refined, 1.0)
    min_cmnd = jnp.take_along_axis(cmnd, best[..., None], axis=-1)[..., 0]
    energy = e0 / W
    voiced = (min_cmnd < jnp.maximum(threshold * 2.0, 0.3)) & (energy > 1e-6) & (f0 >= f0_min) & (f0 <= f0_max)
    f0 = jnp.where(voiced, f0, 0.0)

    if squeeze:
        return f0[0], voiced[0]
    return f0, voiced
