from latent_diffusion_speech_tpu.models.whisper.model import (  # noqa: F401
    WhisperDims,
    WhisperEncoder,
    whisper_encoder_params_from_torch,
)
