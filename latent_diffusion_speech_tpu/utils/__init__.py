from latent_diffusion_speech_tpu.utils.logger import MetricsLogger  # noqa: F401
from latent_diffusion_speech_tpu.utils.profiler import profile_trace  # noqa: F401
