from latent_diffusion_speech_tpu.infer.tts import TTSPipeline  # noqa: F401
