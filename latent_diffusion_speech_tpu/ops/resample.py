"""Rational-rate polyphase sinc resampling as an XLA convolution.

The reference resamples with cached `torchaudio.transforms.Resample` kernels
(`tools/tools.py:80-84`, `diffusion/vocoder.py:24-30`).  Same approach here:
a hann-windowed-sinc polyphase filter bank, built once per (orig, new) rate
pair on host, applied as a strided `lax.conv_general_dilated` — which XLA maps
straight onto the MXU.
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["resample", "resample_kernel"]


@lru_cache(maxsize=64)
def resample_kernel(
    orig_sr: int,
    new_sr: int,
    lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
):
    """Build polyphase kernels. Returns (kernels (new//gcd, 1, width), width, pads)."""
    gcd = math.gcd(orig_sr, new_sr)
    orig = orig_sr // gcd
    new = new_sr // gcd

    base_freq = min(orig, new) * rolloff / 2.0  # cycles per orig-sample * orig
    # cutoff in normalized frequency relative to orig rate:
    cutoff = base_freq / orig
    width = int(math.ceil(lowpass_filter_width / (2.0 * cutoff)))

    # Polyphase tap grid: output sample n = k*new + p lands at input time
    # t_in = k*orig + p*orig/new, so each phase-p kernel must cover
    # [-width, width + orig) around the frame origin k*orig.
    idx = np.arange(-width, width + orig, dtype=np.float64)
    phases = np.arange(new, dtype=np.float64)[:, None] * orig / new
    t = idx[None, :] - phases  # (new, 2*width+orig), units of orig samples

    x = np.clip(2.0 * cutoff * t, -lowpass_filter_width, lowpass_filter_width)
    window = np.cos(np.pi * x / lowpass_filter_width / 2.0) ** 2
    sinc = np.sinc(x)
    kernels = (2.0 * cutoff * window * sinc).astype(np.float32)
    return jnp.asarray(kernels[:, None, :]), width, orig, new


def resample(x: jnp.ndarray, orig_sr: int, new_sr: int, **kw) -> jnp.ndarray:
    """Resample the last axis from orig_sr to new_sr. Input (..., T);
    output (..., ceil(T * new / orig))."""
    if orig_sr == new_sr:
        return x
    kernels, width, orig, new = resample_kernel(orig_sr, new_sr, **kw)

    batch_shape = x.shape[:-1]
    T = x.shape[-1]
    y = x.reshape((-1, 1, T))
    y = jnp.pad(y, ((0, 0), (0, 0), (width, width + orig)))
    out = jax.lax.conv_general_dilated(
        y.astype(jnp.float32),
        kernels,  # (new_phases, 1, 2*width+orig) as OIW
        window_strides=(orig,),
        padding="VALID",
        dimension_numbers=("NCW", "OIW", "NCW"),
    )  # (B, new, frames)
    out = jnp.swapaxes(out, -1, -2).reshape((out.shape[0], -1))
    target_len = int(math.ceil(T * new / orig))
    out = out[:, :target_len]
    return out.reshape(batch_shape + (target_len,)).astype(x.dtype)
