"""latent_diffusion_speech_tpu — a TPU-native latent-diffusion speech framework.

A ground-up JAX / XLA / Pallas / pjit re-design with the capability surface of the
reference `bfloat16/latent-diffusion-speech` stack (three-stage TTS/SVC:
text -> semantic tokens (AR LM) -> latent via 1-D conditional diffusion UNet ->
waveform via HiFi-VAEGAN decoder).

Layering (bottom-up), mirroring SURVEY.md section 1:
  ops/       - DSP + core numerical ops (STFT/mel, resample, volume, alignment,
               attention, Pallas kernels)
  models/    - neural nets: HiFi-VAEGAN codec, Whisper/HuBERT unit encoders,
               UNet-1D diffusion denoiser, RoFormer/Llama semantic LMs
  quantize/  - k-means fit/predict, Euclidean codebook, EMA cosine VQ
  text/      - text frontend: symbols, cleaners, per-language G2P
  parallel/  - device mesh, shardings, distributed init, collectives
  data/      - datasets over the on-disk npy pipeline layout + native loader
  train/     - training loops (diffusion, LM), schedules, checkpointing
  infer/     - TTS / long-audio serve runtime
  cli/       - numbered pipeline entry points (00..22) matching the reference
"""

__version__ = "0.1.0"

from latent_diffusion_speech_tpu.config import Config, load_config  # noqa: F401
