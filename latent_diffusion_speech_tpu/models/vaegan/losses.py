"""GAN / VAE / spectral losses for codec training.

Parity with the reference (`modules/losses.py`, `modules/models.py:305-334`):
LSGAN discriminator/generator losses, x2-weighted feature-matching loss,
KL(q(z|x) || N(0,1)) summed over channels, and single/random-scale spectral
losses.  RSS uses a fixed set of scales (static shapes; the reference's
per-step random FFT sizes would force an XLA recompile per step — scales are
drawn once per training run instead).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

from latent_diffusion_speech_tpu.ops.stft import stft, hann_window

__all__ = [
    "discriminator_loss",
    "generator_loss",
    "feature_loss",
    "kl_loss",
    "sss_loss",
    "rss_loss",
]


def discriminator_loss(real_logits: List[jnp.ndarray], fake_logits: List[jnp.ndarray]):
    """LSGAN: real -> 1, fake -> 0 (ref losses.py:16-29)."""
    loss = 0.0
    per_disc = []
    for dr, dg in zip(real_logits, fake_logits):
        r = jnp.mean((1.0 - dr.astype(jnp.float32)) ** 2)
        g = jnp.mean(dg.astype(jnp.float32) ** 2)
        loss = loss + r + g
        per_disc.append((r, g))
    return loss, per_disc


def generator_loss(fake_logits: List[jnp.ndarray]):
    """LSGAN generator: fake -> 1 (ref losses.py:31-40)."""
    loss = 0.0
    per_disc = []
    for dg in fake_logits:
        l = jnp.mean((1.0 - dg.astype(jnp.float32)) ** 2)
        loss = loss + l
        per_disc.append(l)
    return loss, per_disc


def feature_loss(fmap_real, fmap_fake) -> jnp.ndarray:
    """L1 feature matching over all layers of all discs, x2 (ref losses.py:6-14).
    Real features are treated as constants (stop_gradient = .detach())."""
    loss = 0.0
    for fr, fg in zip(fmap_real, fmap_fake):
        for rl, gl in zip(fr, fg):
            rl = jax.lax.stop_gradient(rl.astype(jnp.float32))
            loss = loss + jnp.mean(jnp.abs(rl - gl.astype(jnp.float32)))
    return loss * 2.0


def kl_loss(logs: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """0.5 * sum_c (m^2 + e^logs - logs - 1), mean over batch/time
    (ref losses.py:42-45; note the reference uses exp(logs) i.e. logs = log-var/std
    convention kept verbatim)."""
    kl = 0.5 * jnp.sum(m**2 + jnp.exp(logs) - logs - 1.0, axis=-1)
    return jnp.mean(kl)


def sss_loss(x_true: jnp.ndarray, x_pred: jnp.ndarray, n_fft: int, alpha: float = 1.0, eps: float = 1e-7) -> jnp.ndarray:
    """Single-scale spectral loss (ref losses.py:47-72): normalized magnitude
    STFT (center=False, hop = n_fft), spectral-convergence + log-L1 terms."""
    window = hann_window(n_fft)
    norm = jnp.sqrt(jnp.sum(window**2))

    def mag(x):
        s = stft(x, n_fft, n_fft, window=window, center=False)
        # smoothed magnitude: |.| has a NaN gradient at exactly 0 (silence)
        m = jnp.sqrt(s.real**2 + s.imag**2 + 1e-12)
        return m / norm + eps

    st, sp = mag(x_true), mag(x_pred)
    converge = jnp.mean(
        jnp.linalg.norm((st - sp).reshape(st.shape[0], -1), axis=-1)
        / jnp.linalg.norm((st + sp).reshape(st.shape[0], -1), axis=-1)
    )
    log_term = jnp.mean(jnp.abs(jnp.log(st) - jnp.log(sp)))
    return converge + alpha * log_term


def rss_loss(
    x_pred: jnp.ndarray,
    x_true: jnp.ndarray,
    scales: Sequence[int] = (64, 128, 256, 512, 1024, 2048),
    alpha: float = 1.0,
) -> jnp.ndarray:
    """Multi-scale spectral loss (static-shape stand-in for the reference's
    random-scale RSSLoss, losses.py:75-93). Scales longer than the signal are
    skipped (they would produce zero frames)."""
    usable = [s for s in scales if s <= x_true.shape[-1]]
    if not usable:
        raise ValueError(f"no usable FFT scale for signal length {x_true.shape[-1]}")
    total = 0.0
    for n_fft in usable:
        total = total + sss_loss(x_true, x_pred, n_fft, alpha=alpha)
    return total / len(usable)
