"""End-to-end TTS serve benchmark on the flagship configuration.

Measures real-time factor (RTF) of the full serve chain at 20-step
DPM-Solver++ (the BASELINE.md north-star metric): RoFormer AR decode of the
semantic sequence + 20-step latent diffusion + HiFi-VAEGAN decode, ~5 s of
44.1 kHz audio.  Prints ONE JSON line:
{"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}.

vs_baseline = target_rtf / measured_rtf (>1 means faster than the 0.05 target).
"""

from __future__ import annotations

import json
import time

import jax

# persistent compilation cache: the serve program is large; cache compiles
# across bench invocations (driver runs this repeatedly)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np

TARGET_RTF = 0.05  # BASELINE.json: RTF <= 0.05 @ 20-step DPM-Solver++ on v5e-1
N_TOKENS = 430     # ~4.99 s at 86.13 frames/s (44100 / 512)
DIFFUSION_STEPS = 20


def build_pipeline():
    from latent_diffusion_speech_tpu.models.diffusion import Unit2MelConfig, Unit2MelSystem
    from latent_diffusion_speech_tpu.models.lm.roformer import RoformerConfig, RoformerSystem
    from latent_diffusion_speech_tpu.models.vocoder import Vocoder
    from latent_diffusion_speech_tpu.infer import TTSPipeline

    rng = np.random.default_rng(0)
    codebook = rng.standard_normal((4096, 1280)).astype(np.float32)

    diffusion = Unit2MelSystem(Unit2MelConfig(), dtype=jnp.bfloat16)
    vocoder = Vocoder("hifi-vaegan", dtype=jnp.bfloat16)
    lm = RoformerSystem(RoformerConfig(), dtype=jnp.bfloat16)
    return TTSPipeline(diffusion, vocoder, lm=lm, codebook=codebook)


def main():
    pipe = build_pipeline()
    rng = np.random.default_rng(1)
    phones = jnp.asarray(rng.integers(1, 100, (1, 64)), jnp.int32)
    tones = jnp.asarray(rng.integers(0, 6, (1, 64)), jnp.int32)
    spk = jnp.ones((1, 64), jnp.int32)
    tokens = jnp.asarray(rng.integers(0, 4096, (N_TOKENS,)), jnp.int32)
    units = pipe.semantic_to_units(np.asarray(tokens))

    def serve_once(seed):
        # 1. AR decode (the scan always runs max_new_tokens steps -> fixed work)
        toks, _ = pipe.lm.generate(
            phones, tones, spk_id=spk, max_length=N_TOKENS,
            rng=jax.random.PRNGKey(seed),
        )
        toks.block_until_ready()
        # 2. diffusion (20 steps DPM-Solver++) + 3. vocoder decode
        wav = pipe.infer(
            units, method="dpm-solver", infer_speedup=1000 // DIFFUSION_STEPS,
            rng=jax.random.PRNGKey(seed),
        )
        wav.block_until_ready()
        return wav

    # warmup / compile
    wav = serve_once(0)
    audio_seconds = wav.shape[-1] / 44100.0

    times = []
    for i in range(3):
        t0 = time.perf_counter()
        serve_once(i + 1)
        times.append(time.perf_counter() - t0)
    best = min(times)
    rtf = best / audio_seconds

    # stage breakdown (separate timed runs, best-of-2 each)
    def time_stage(fn, n=2):
        fn()  # warm
        vals = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            vals.append(time.perf_counter() - t0)
        return min(vals)

    t_lm = time_stage(lambda: pipe.lm.generate(
        phones, tones, spk_id=spk, max_length=N_TOKENS, rng=jax.random.PRNGKey(9)
    )[0].block_until_ready())
    t_diff_voc = time_stage(lambda: pipe.infer(
        units, method="dpm-solver", infer_speedup=1000 // DIFFUSION_STEPS,
        rng=jax.random.PRNGKey(9),
    ).block_until_ready())

    print(
        json.dumps(
            {
                "metric": "tts_serve_rtf_20step_dpmpp",
                "value": round(rtf, 5),
                "unit": "rtf",
                "vs_baseline": round(TARGET_RTF / rtf, 3),
                "detail": {
                    "audio_seconds": round(audio_seconds, 3),
                    "best_wall_s": round(best, 3),
                    "all_wall_s": [round(t, 3) for t in times],
                    "lm_decode_s": round(t_lm, 3),
                    "diffusion_plus_vocoder_s": round(t_diff_voc, 3),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
