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

    # NOTE on synchronization: through the axon relay, block_until_ready is a
    # no-op (async enqueue); only a data fetch synchronizes with execution.
    # Every timed region below ends in a scalar fetch of the final output.
    def serve_once(seed, sync=True):
        # 1. AR decode (the scan always runs max_new_tokens steps -> fixed work)
        toks, _ = pipe.lm.generate(
            phones, tones, spk_id=spk, max_length=N_TOKENS,
            rng=jax.random.PRNGKey(seed),
        )
        # 2. diffusion (20 steps DPM-Solver++) + 3. vocoder decode
        wav = pipe.infer(
            units, method="dpm-solver", infer_speedup=1000 // DIFFUSION_STEPS,
            rng=jax.random.PRNGKey(seed),
        )
        if sync:
            np.asarray(toks[0, 0])
            np.asarray(wav[0, 0])
        return wav

    # warmup / compile (incl. the sync slice programs)
    wav = serve_once(0)
    audio_seconds = wav.shape[-1] / 44100.0

    # single-request latency (each request fully synced)
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        serve_once(i + 1)
        times.append(time.perf_counter() - t0)
    best = min(times)
    rtf = best / audio_seconds

    # pipelined throughput: enqueue K requests, sync once at the end
    # (single-device execution is in-order, so the final fetch waits for all)
    K = 8
    t0 = time.perf_counter()
    last = None
    for i in range(K):
        last = serve_once(100 + i, sync=False)
    np.asarray(last[0, 0])
    amortized_rtf = (time.perf_counter() - t0) / (K * audio_seconds)

    # stage breakdown (scalar-fetch synced)
    def time_stage(fn, n=2):
        fn()  # warm
        vals = []
        for i in range(n):
            t0 = time.perf_counter()
            fn(i)
            vals.append(time.perf_counter() - t0)
        return min(vals)

    t_lm = time_stage(lambda i=0: np.asarray(pipe.lm.generate(
        phones, tones, spk_id=spk, max_length=N_TOKENS, rng=jax.random.PRNGKey(9 + i)
    )[0][0, 0]))
    t_diff_voc = time_stage(lambda i=0: np.asarray(pipe.infer(
        units, method="dpm-solver", infer_speedup=1000 // DIFFUSION_STEPS,
        rng=jax.random.PRNGKey(9 + i),
    )[0, 0]))

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
                    "pipelined_throughput_rtf": round(amortized_rtf, 5),
                    "lm_decode_s": round(t_lm, 3),
                    "diffusion_plus_vocoder_s": round(t_diff_voc, 3),
                    "sync": "scalar-fetch (relay block_until_ready is async)",
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
