"""Unit/frame alignment + segment stitching.

`units_forced_alignment` re-times semantic units (encoder frame rate, e.g.
16 kHz / 320) onto the vocoder latent grid (44.1 kHz / 512), matching the
reference (`tools/tools.py:193-223`): 'nearest'/'linear' interpolation over the
frame axis (torch F.interpolate semantics), and 'left' gather mode.

`cross_fade` is the long-audio stitcher (`tools/tools.py:231-238`), host-side
numpy, used by the streaming serve path.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["units_forced_alignment", "cross_fade"]


def _interp_nearest(units: jnp.ndarray, n_frames: int) -> jnp.ndarray:
    """torch F.interpolate(mode='nearest') over axis 1 of (B, T, C)."""
    T = units.shape[1]
    idx = jnp.floor(jnp.arange(n_frames) * (T / n_frames)).astype(jnp.int32)
    idx = jnp.clip(idx, 0, T - 1)
    return units[:, idx, :]


def _interp_linear(units: jnp.ndarray, n_frames: int) -> jnp.ndarray:
    """torch F.interpolate(mode='linear', align_corners=False) over axis 1."""
    T = units.shape[1]
    scale = T / n_frames
    pos = (jnp.arange(n_frames) + 0.5) * scale - 0.5
    pos = jnp.clip(pos, 0.0, T - 1.0)
    i0 = jnp.floor(pos).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, T - 1)
    w = (pos - i0)[None, :, None]
    return units[:, i0, :] * (1 - w) + units[:, i1, :] * w


def units_forced_alignment(
    units,
    n_frames: int | None = None,
    audio_len: int | None = None,
    hop_size: int | None = None,
    scale_factor: float | None = None,
    mode: str = "nearest",
):
    """Align units (..., T_units, C) to n_frames along the time axis.

    n_frames defaults to audio_len // hop_size + 1 (the latent frame count
    convention used throughout the reference pipeline).
    """
    if n_frames is None:
        if audio_len is not None and hop_size is not None:
            n_frames = int(audio_len // hop_size + 1)
        elif scale_factor is not None:
            n_frames = int(units.shape[-2] * scale_factor)
        else:
            raise ValueError("need n_frames, (audio_len, hop_size), or scale_factor")

    was_numpy = isinstance(units, np.ndarray)
    x = jnp.asarray(units)
    squeezed = x.ndim == 2
    if squeezed:
        x = x[None]

    if mode == "left":
        sf = scale_factor if scale_factor is not None else x.shape[1] / n_frames
        idx = jnp.clip(jnp.round(sf * jnp.arange(n_frames)).astype(jnp.int32), 0, x.shape[1] - 1)
        out = x[:, idx, :]
    elif mode in ("nearest", "rfa441to512", "rfa512to441"):
        out = _interp_nearest(x, n_frames)
    elif mode == "linear":
        out = _interp_linear(x, n_frames)
    else:
        raise ValueError(f"unknown units_forced_mode: {mode!r}")

    if squeezed:
        out = out[0]
    return np.asarray(out) if was_numpy else out


def cross_fade(a: np.ndarray, b: np.ndarray, idx: int) -> np.ndarray:
    """Linear cross-fade of segment b into a starting at sample idx
    (reference `tools/tools.py:231-238`)."""
    result = np.zeros(idx + b.shape[0], dtype=np.result_type(a, b))
    fade_len = a.shape[0] - idx
    result[:idx] = a[:idx]
    k = np.linspace(0, 1.0, num=fade_len, endpoint=True)
    result[idx : a.shape[0]] = (1 - k) * a[idx:] + k * b[:fade_len]
    result[a.shape[0] :] = b[fade_len:]
    return result
