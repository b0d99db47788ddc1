"""Fidelity metrics.

`mcd` — mel-cepstral distortion in dB between two log-mel sequences, the
BASELINE.md fidelity target (MCD <= 0.5 dB vs the PyTorch reference).  Standard
definition: DCT-II of the log-mel frames, euclidean distance over cepstral
coefficients 1..K, scaled by 10*sqrt(2)/ln(10).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["mcd", "log_spectral_distance"]

_MCD_SCALE = 10.0 * np.sqrt(2.0) / np.log(10.0)


def _dct2(x: jnp.ndarray) -> jnp.ndarray:
    """Orthonormal DCT-II along the last axis."""
    n = x.shape[-1]
    k = jnp.arange(n)
    basis = jnp.cos(jnp.pi / n * (jnp.arange(n)[:, None] + 0.5) * k[None, :])  # (n, K)
    out = x @ basis
    scale = jnp.where(k == 0, jnp.sqrt(1.0 / (4 * n)), jnp.sqrt(1.0 / (2 * n))) * 2.0
    return out * scale


def mcd(log_mel_a: jnp.ndarray, log_mel_b: jnp.ndarray, n_coeffs: int = 13) -> jnp.ndarray:
    """Mean MCD in dB over frames. Inputs (..., T, n_mels) natural-log mel."""
    ca = _dct2(log_mel_a)[..., 1 : n_coeffs + 1]
    cb = _dct2(log_mel_b)[..., 1 : n_coeffs + 1]
    dist = jnp.sqrt(jnp.sum((ca - cb) ** 2, axis=-1))
    return _MCD_SCALE * jnp.mean(dist)


def log_spectral_distance(log_mel_a: jnp.ndarray, log_mel_b: jnp.ndarray) -> jnp.ndarray:
    """RMS log-spectral distance in dB over frames (secondary fidelity metric)."""
    diff_db = (log_mel_a - log_mel_b) * (10.0 / np.log(10.0))
    return jnp.mean(jnp.sqrt(jnp.mean(diff_db**2, axis=-1)))
