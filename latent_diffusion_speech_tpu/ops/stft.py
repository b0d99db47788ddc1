"""STFT / mel-spectrogram ops in pure JAX.

Bit-matches the reference's two mel front-ends:

* `MelSpectrogram` — the HiFi-VAEGAN mel path
  (`encoder/hifi_vaegan/modules/nvSTFT.py:69-118`): explicit asymmetric
  (win-hop)//2 padding with reflect/constant fallback, torch.stft(center=False),
  magnitude sqrt(re^2+im^2+1e-9), slaney mel, log with 1e-5 clamp, and the
  keyshift/speed resizing rules.
* `whisper_log_mel` — the Whisper front-end (`encoder/whisper/audio.py:62-82`):
  torch.stft(center=True) 400/160, power spectrum with last frame dropped,
  log10 with 1e-10 clamp, max-8 dB floor, (x+4)/4 scaling.

Everything is static-shape and jit-safe; the FFT rides XLA's TPU FFT.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from latent_diffusion_speech_tpu.ops.mel import mel_filterbank

__all__ = ["hann_window", "frame", "stft", "istft", "MelSpectrogram", "whisper_log_mel"]


def hann_window(win_size: int, dtype=jnp.float32) -> jnp.ndarray:
    """Periodic Hann window (torch.hann_window default)."""
    n = jnp.arange(win_size, dtype=jnp.float32)
    w = 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * n / win_size)
    return w.astype(dtype)


def frame(y: jnp.ndarray, frame_length: int, hop: int) -> jnp.ndarray:
    """Frame the last axis into (..., n_frames, frame_length) windows."""
    n_frames = 1 + (y.shape[-1] - frame_length) // hop
    starts = jnp.arange(n_frames) * hop
    idx = starts[:, None] + jnp.arange(frame_length)[None, :]
    return jnp.take(y, idx, axis=-1)


def stft(
    y: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: Optional[int] = None,
    window: Optional[jnp.ndarray] = None,
    center: bool = True,
) -> jnp.ndarray:
    """torch.stft-compatible STFT. Input (..., T), output (..., n_freq, n_frames)
    complex64. onesided, non-normalized."""
    win_length = win_length or n_fft
    if window is None:
        window = hann_window(win_length)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))
    if center:
        pad = n_fft // 2
        y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(pad, pad)], mode="reflect")
    frames = frame(y, n_fft, hop_length)  # (..., n_frames, n_fft)
    frames = frames * window.astype(frames.dtype)
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)  # (..., n_frames, n_freq)
    return jnp.swapaxes(spec, -1, -2)


def istft(
    spec: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: Optional[int] = None,
    window: Optional[jnp.ndarray] = None,
    center: bool = True,
    length: Optional[int] = None,
) -> jnp.ndarray:
    """Inverse STFT via overlap-add with squared-window normalization
    (torch.istft semantics). Input (..., n_freq, n_frames)."""
    win_length = win_length or n_fft
    if window is None:
        window = hann_window(win_length)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))

    frames = jnp.fft.irfft(jnp.swapaxes(spec, -1, -2), n=n_fft, axis=-1)
    frames = frames * window
    n_frames = frames.shape[-2]
    out_len = n_fft + hop_length * (n_frames - 1)

    batch_shape = frames.shape[:-2]
    flat = frames.reshape((-1, n_frames, n_fft))

    def ola(fr):
        buf = jnp.zeros((out_len,), dtype=fr.dtype)

        def body(i, b):
            return jax.lax.dynamic_update_slice(
                b, jax.lax.dynamic_slice(b, (i * hop_length,), (n_fft,)) + fr[i], (i * hop_length,)
            )

        return jax.lax.fori_loop(0, n_frames, body, buf)

    out = jax.vmap(ola)(flat)

    wsq = jnp.zeros((out_len,), dtype=frames.dtype)

    def wbody(i, b):
        return jax.lax.dynamic_update_slice(
            b, jax.lax.dynamic_slice(b, (i * hop_length,), (n_fft,)) + window**2, (i * hop_length,)
        )

    wsq = jax.lax.fori_loop(0, n_frames, wbody, wsq)
    out = out / jnp.maximum(wsq, 1e-11)

    if center:
        out = out[:, n_fft // 2 : out_len - n_fft // 2]
    if length is not None:
        out = out[:, :length]
    return out.reshape(batch_shape + out.shape[1:])


class MelSpectrogram:
    """HiFi-VAEGAN log-mel front-end (reference `nvSTFT.py:55-118`).

    Precomputes mel bases / windows per (keyshift) statically; `__call__` is
    jit-safe for fixed input length.
    """

    def __init__(
        self,
        sr: int = 44100,
        n_mels: int = 128,
        n_fft: int = 2048,
        win_size: int = 2048,
        hop_length: int = 512,
        fmin: float = 40.0,
        fmax: float = 16000.0,
        clip_val: float = 1e-5,
    ):
        self.sr = sr
        self.n_mels = n_mels
        self.n_fft = n_fft
        self.win_size = win_size
        self.hop_length = hop_length
        self.fmin = fmin
        self.fmax = fmax
        self.clip_val = clip_val
        self.mel_basis = jnp.asarray(
            mel_filterbank(sr, n_fft, n_mels, fmin=fmin, fmax=fmax)
        )

    def __call__(
        self, y: jnp.ndarray, keyshift: float = 0.0, speed: float = 1.0
    ) -> jnp.ndarray:
        """Input (B, T) in [-1, 1]; output (B, n_mels, n_frames) log-mel."""
        factor = 2.0 ** (keyshift / 12.0)
        n_fft_new = int(round(self.n_fft * factor))
        win_size_new = int(round(self.win_size * factor))
        hop_new = int(round(self.hop_length * speed))
        window = hann_window(win_size_new)

        pad_left = (win_size_new - hop_new) // 2
        pad_right = max(
            (win_size_new - hop_new + 1) // 2, win_size_new - y.shape[-1] - pad_left
        )
        mode = "reflect" if pad_right < y.shape[-1] else "constant"
        y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(pad_left, pad_right)], mode=mode)

        spec = stft(
            y, n_fft_new, hop_new, win_length=win_size_new, window=window, center=False
        )
        mag = jnp.sqrt(spec.real**2 + spec.imag**2 + 1e-9)
        if keyshift != 0:
            size = self.n_fft // 2 + 1
            resize = mag.shape[-2]
            if resize < size:
                mag = jnp.pad(mag, [(0, 0)] * (mag.ndim - 2) + [(0, size - resize), (0, 0)])
            mag = mag[..., :size, :] * (self.win_size / win_size_new)
        mel = jnp.einsum("mf,...ft->...mt", self.mel_basis, mag)
        return jnp.log(jnp.clip(mel, min=self.clip_val))

    def frames_for_length(self, n_samples: int, speed: float = 1.0) -> int:
        hop_new = int(round(self.hop_length * speed))
        pad_left = (self.win_size - hop_new) // 2
        pad_right = max((self.win_size - hop_new + 1) // 2, self.win_size - n_samples - pad_left)
        return 1 + (n_samples + pad_left + pad_right - self.win_size) // hop_new


# Whisper front-end constants (`encoder/whisper/audio.py:9-13`).
WHISPER_SAMPLE_RATE = 16000
WHISPER_N_FFT = 400
WHISPER_HOP = 160


@partial(jax.jit, static_argnames=("n_mels", "padding"))
def whisper_log_mel(
    audio: jnp.ndarray, n_mels: int = 128, padding: int = 0
) -> jnp.ndarray:
    """Whisper log-mel (`encoder/whisper/audio.py:62-82`). Input (..., T) 16 kHz;
    output (..., n_mels, T // 160)."""
    if padding > 0:
        audio = jnp.pad(audio, [(0, 0)] * (audio.ndim - 1) + [(0, padding)])
    spec = stft(audio, WHISPER_N_FFT, WHISPER_HOP, center=True)
    mag = jnp.abs(spec[..., :-1]) ** 2
    filters = jnp.asarray(
        mel_filterbank(WHISPER_SAMPLE_RATE, WHISPER_N_FFT, n_mels)
    )
    mel = jnp.einsum("mf,...ft->...mt", filters, mag)
    log_spec = jnp.log10(jnp.clip(mel, min=1e-10))
    log_spec = jnp.maximum(log_spec, jnp.max(log_spec) - 8.0)
    return (log_spec + 4.0) / 4.0
