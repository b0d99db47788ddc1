"""Batched-serve scaling: RTF per request vs batch size.

Measured on v5e-1 (2026-08-17, fully primed): B=8 RTF 0.0039 (the decode
kernel's VMEM capacity bound and the throughput optimum), B=16 RTF 0.0049,
B=32 RTF 0.0063 (scan-decoder fallback; diffusion+vocoder are
compute-saturated past B~8 so bigger batches only add latency).
Run: PYTHONPATH=.:/root/.axon_site python benchmarks/serve_scaling.py
"""

import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import jax.numpy as jnp
import numpy as np

from latent_diffusion_speech_tpu.models.diffusion import Unit2MelConfig, Unit2MelSystem
from latent_diffusion_speech_tpu.models.lm.roformer import RoformerConfig, RoformerSystem
from latent_diffusion_speech_tpu.models.vocoder import Vocoder
from latent_diffusion_speech_tpu.infer import TTSPipeline

rng_np = np.random.default_rng(0)
codebook = rng_np.standard_normal((4096, 1280)).astype(np.float32)
pipe = TTSPipeline(
    Unit2MelSystem(Unit2MelConfig(), dtype=jnp.bfloat16),
    Vocoder("hifi-vaegan", dtype=jnp.bfloat16),
    lm=RoformerSystem(RoformerConfig(), dtype=jnp.bfloat16),
    codebook=codebook,
)
N_TOKENS = 430
K = pipe.lm.cfg.semantic_kmeans_num
codebook_arr = jnp.asarray(pipe.codebook.codebook)
tokens_to_units = jax.jit(lambda cb, toks: jnp.take(cb, jnp.minimum(toks, K - 1), axis=0))
phones1 = jnp.asarray(rng_np.integers(1, 100, (1, 48)).astype(np.int32))
tones1 = jnp.asarray(rng_np.integers(0, 5, (1, 48)).astype(np.int32))
audio_seconds = N_TOKENS * 512 / 44100.0

for B in (8, 16, 32):
    phones = jnp.tile(phones1, (B, 1)); tones = jnp.tile(tones1, (B, 1))
    spk = jnp.ones_like(phones)

    def serve(seed):
        toks, _ = pipe.lm.generate(phones, tones, spk_id=spk, max_length=N_TOKENS,
                                   rng=jax.random.PRNGKey(seed), impl=pipe.lm_impl)
        units = tokens_to_units(codebook_arr, toks[:, :N_TOKENS])
        return pipe.infer(units, method="dpm-solver", infer_speedup=50,
                          rng=jax.random.PRNGKey(seed))

    out = serve(0); np.asarray(out[0, 0])
    for i in range(30):  # prime past the relay's slow-start window
        out = serve(10 + i)
    np.asarray(out[0, 0])
    n = 5
    t0 = time.perf_counter()
    for i in range(n):
        out = serve(100 + i)
    np.asarray(out[0, 0])
    dt = (time.perf_counter() - t0) / n
    rtf = dt / (B * audio_seconds)
    print(f"B={B}: {dt*1e3:.1f} ms/batch, RTF {rtf:.5f} ({0.05/rtf:.1f}x target), "
          f"{B*audio_seconds/dt:.0f}x realtime", flush=True)
