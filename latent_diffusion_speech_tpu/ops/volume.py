"""Frame-RMS volume extraction + voiced mask.

Semantics of the reference `Volume_Extractor` (`tools/tools.py:12-41`):
frame mean of x^2 over reflect-padded audio, sqrt; mask = dB threshold,
9-tap max smoothing with edge padding, then linear upsample to sample rate.
Implemented as vectorized JAX (no Python per-frame loop).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["extract_volume", "get_volume_mask", "upsample_frames"]


def extract_volume(audio: jnp.ndarray, hop_size: int = 512) -> jnp.ndarray:
    """Input (..., T); output (..., T // hop + 1) frame RMS."""
    n_frames = audio.shape[-1] // hop_size + 1
    audio2 = audio**2
    pad = [(0, 0)] * (audio.ndim - 1) + [(hop_size // 2, (hop_size + 1) // 2)]
    audio2 = jnp.pad(audio2, pad, mode="reflect")
    # frame means: cumsum difference
    usable = audio2[..., : n_frames * hop_size]
    frames = usable.reshape(audio.shape[:-1] + (n_frames, hop_size))
    return jnp.sqrt(jnp.mean(frames, axis=-1))


def upsample_frames(signal: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Frame-rate -> sample-rate linear upsampling (reference `tools/tools.py:225-229`):
    append last frame, align_corners linear interp to T*factor+1, drop last.
    Input (B, T, C); output (B, T*factor, C)."""
    B, T, C = signal.shape
    x = jnp.concatenate([signal, signal[:, -1:, :]], axis=1)  # (B, T+1, C)
    # positions of output samples in input coordinates (align_corners=True)
    out_len = T * factor + 1
    pos = jnp.arange(out_len - 1) * (T / (out_len - 1))
    i0 = jnp.floor(pos).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, T)
    w = (pos - i0)[None, :, None]
    return x[:, i0, :] * (1 - w) + x[:, i1, :] * w


def get_volume_mask(
    volume: jnp.ndarray, block_size: int = 512, threshold_db: float = -60.0
) -> jnp.ndarray:
    """Voiced mask at sample rate from frame volume (reference
    `tools/tools.py:35-41`). Input (T_frames,) or (B, T_frames);
    output (B, T_frames*block_size)."""
    if volume.ndim == 1:
        volume = volume[None]
    mask = (volume > 10.0 ** (threshold_db / 20.0)).astype(jnp.float32)
    first = mask[:, :1]
    last = mask[:, -1:]
    padded = jnp.concatenate([jnp.repeat(first, 4, axis=1), mask, jnp.repeat(last, 4, axis=1)], axis=1)
    # 9-tap running max
    stacked = jnp.stack([padded[:, n : n + mask.shape[1]] for n in range(9)], axis=0)
    mask = jnp.max(stacked, axis=0)
    up = upsample_frames(mask[:, :, None], block_size)
    return up[..., 0]
