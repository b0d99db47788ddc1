from latent_diffusion_speech_tpu.infer.server import TTSServer  # noqa: F401
from latent_diffusion_speech_tpu.infer.tts import TTSPipeline  # noqa: F401
