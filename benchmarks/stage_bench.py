"""Per-stage benchmark suite (the BASELINE.json config list).

Prints one JSON line per stage:
1. mel + unit extraction on a 10 s 44.1 kHz clip (scripts 10/11 path)
2. k-means semantic-token quantization over an utterance set
3. latent denoiser: 1000-step DDPM vs 20-step DPM-Solver++ / UniPC
4. RoFormer AR decode with KV cache
5. full TTS serve (batched)

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/stage_bench.py
(driver's headline metric lives in bench.py; this is the drill-down.)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

sys.path.insert(0, str(Path(__file__).parent.parent))
from bench import probe_devices  # noqa: E402

probe_devices(metric="stage_bench")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

RECORDS = []  # every emit() row; dumped to STAGE_BENCH.json at the end


def timed(fn, *args, n=5):
    """Time fn with VARYING inputs per iteration: the serving relay memoizes
    identical (program, inputs) executions, so repeating the same call
    measures the cache, not the device."""
    variants = []
    for i in range(n):
        new_args = []
        for a in args:
            if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating) and a.ndim > 0:
                new_args.append(a + jnp.float32(1e-6 * (i + 1)).astype(a.dtype))
            elif hasattr(a, "dtype") and a.shape == (2,) and a.dtype == jnp.uint32:
                new_args.append(jax.random.fold_in(a, i))
            elif hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.integer) and a.ndim > 1:
                new_args.append(a + (i % 3))  # shift ids slightly (stays in-vocab)
            else:
                new_args.append(a)
        variants.append(tuple(new_args))
    def sync(out):
        # relay block_until_ready is async; only a data fetch synchronizes.
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf.reshape(-1)[0])

    out = fn(*variants[0])
    sync(out)
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(*variants[i])
    sync(out)  # in-order execution: waits for all n enqueued programs
    return (time.perf_counter() - t0) / n


def emit(metric, seconds, unit="s", detail=None):
    rec = {"metric": metric, "value": round(seconds, 5), "unit": unit}
    if detail:
        rec["detail"] = detail
    RECORDS.append(rec)
    print(json.dumps(rec), flush=True)


def main():
    rng = np.random.default_rng(0)
    clip10 = (rng.standard_normal(441000) * 0.1).astype(np.float32)  # 10 s @ 44.1k

    # 1. mel + units on 10 s audio
    from latent_diffusion_speech_tpu.models.units import UnitsEncoder
    from latent_diffusion_speech_tpu.models.vaegan import HifiVAEGAN
    from latent_diffusion_speech_tpu.ops.resample import resample

    codec = HifiVAEGAN.random_init(dtype=jnp.bfloat16)
    t = timed(lambda a: codec.extract(a, only_mean=True), jnp.asarray(clip10)[None])
    emit("vae_latent_extract_10s", t, detail={"frames_per_s_audio": round(10.0 / t, 1)})

    units_enc = UnitsEncoder("whisper_large_v3")  # random-init large-v3 geometry
    audio16 = resample(jnp.asarray(clip10)[None], 44100, 16000)
    t = timed(lambda a: units_enc.encode(a, 16000), audio16)
    emit("whisper_units_extract_10s", t, detail={"xrt": round(10.0 / t, 1)})

    # 2. k-means tokenization (30k frames x 1280 against 4096 centroids)
    from latent_diffusion_speech_tpu.quantize import kmeans_predict

    feats = rng.standard_normal((30000, 1280)).astype(np.float32)
    centroids = rng.standard_normal((4096, 1280)).astype(np.float32)
    t = timed(lambda x, c: kmeans_predict(x, c), jnp.asarray(feats), jnp.asarray(centroids))
    emit("kmeans_tokenize_30k_frames", t, detail={"mframes_per_s": round(0.03 / t, 2)})

    # 3. denoiser: 20-step solvers vs 1000-step DDPM (flagship UNet, T=448)
    from latent_diffusion_speech_tpu.models.diffusion import Unit2MelConfig, Unit2MelSystem

    system = Unit2MelSystem(Unit2MelConfig(), dtype=jnp.bfloat16)
    units = jnp.asarray(rng.standard_normal((1, 448, 1280)).astype(np.float32))
    spk = jnp.ones((1, 1), jnp.int32)

    def sampler(method, speedup):
        def fn(params, units, rng):
            cond = system.module.apply({"params": params}, units, None, spk, None,
                                       method=system.module.condition)
            return system.diffusion.sample(params, cond, rng, method=method, infer_speedup=speedup)
        return jax.jit(fn)

    for method, speedup, label in [("dpm-solver", 50, "dpmpp_20step"), ("unipc", 50, "unipc_20step"),
                                   ("ddpm", 1, "ddpm_1000step")]:
        fn = sampler(method, speedup)
        t = timed(fn, system.params, units, jax.random.PRNGKey(0), n=3)
        emit(f"denoiser_{label}_T448", t)

    # 4. LM AR decode, 430 tokens
    from latent_diffusion_speech_tpu.models.lm.roformer import RoformerConfig, RoformerSystem

    lm = RoformerSystem(RoformerConfig(), dtype=jnp.bfloat16)
    phones = jnp.asarray(rng.integers(1, 100, (1, 64)), jnp.int32)
    tones = jnp.asarray(rng.integers(0, 6, (1, 64)), jnp.int32)
    t = timed(lambda ph: lm.generate(ph, tones, spk_id=1, max_length=430,
                                     rng=jax.random.PRNGKey(0))[0], phones * 1, n=3)
    emit("lm_ar_decode_430_tokens", t, detail={"tokens_per_s": round(430 / t)})

    # 5. full serve, batch of 4
    from latent_diffusion_speech_tpu.infer import TTSPipeline
    from latent_diffusion_speech_tpu.models.vocoder import Vocoder

    pipe = TTSPipeline(system, Vocoder("hifi-vaegan", dtype=jnp.bfloat16), lm=lm,
                       codebook=rng.standard_normal((4096, 1280)).astype(np.float32))
    units_b = jnp.asarray(rng.standard_normal((4, 430, 1280)).astype(np.float32))
    t = timed(lambda u: pipe.infer(u, method="dpm-solver", infer_speedup=50,
                                   rng=jax.random.PRNGKey(0)), units_b, n=3)
    audio_s = 4 * 430 * 512 / 44100
    emit("serve_units_to_wav_batch4", t, detail={"batched_rtf": round(t / audio_s, 5)})

    # persist the whole suite (BASELINE.json configs 1-5) as one artifact
    Path(__file__).parent.joinpath("STAGE_BENCH.json").write_text(json.dumps({
        "bench": "stage_bench (BASELINE.json config list 1-5)",
        "device": str(jax.devices()[0]),
        "stages": RECORDS,
    }, indent=2))


if __name__ == "__main__":
    main()
