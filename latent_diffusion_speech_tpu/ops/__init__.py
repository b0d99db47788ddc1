"""Core numerical / DSP ops (L0 of the stack).

Everything here is pure-functional JAX (jit-safe, static shapes) except the
explicitly host-side pieces (`slicer`, `audio_io`) which run offline.
"""

from latent_diffusion_speech_tpu.ops.mel import mel_filterbank  # noqa: F401
from latent_diffusion_speech_tpu.ops.stft import (  # noqa: F401
    stft,
    istft,
    MelSpectrogram,
    whisper_log_mel,
)
from latent_diffusion_speech_tpu.ops.resample import resample  # noqa: F401
from latent_diffusion_speech_tpu.ops.volume import extract_volume, get_volume_mask  # noqa: F401
from latent_diffusion_speech_tpu.ops.alignment import (  # noqa: F401
    units_forced_alignment,
    cross_fade,
)
