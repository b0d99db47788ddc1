"""End-to-end TTS serve benchmark on the flagship configuration.

Measures real-time factor (RTF) of the full *chained* serve path at 20-step
DPM-Solver++ (the BASELINE.md north-star metric): real ZH text frontend
(host) -> RoFormer AR decode -> generated tokens -> centroid embedding
(device) -> 20-step latent diffusion -> HiFi-VAEGAN decode, ~5 s of 44.1 kHz
audio.  The LM's generated tokens ARE the diffusion conditioning (clamped to
the codebook on device); nothing in the chain runs on fixed stand-in inputs.

Also emits the BASELINE.md metric suite: denoiser steps/s, vocoder
mel-frames/s, and analytic MFU (XLA cost-analysis FLOPs / wall / peak) for
both the serve chain and the flagship B=64 train step.

Prints ONE JSON line:
{"metric": ..., "value": ..., "unit": ..., "vs_baseline": ..., "detail": {...}}.
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
TEXT = "今天天气真好,我们一起去公园散步,然后听音乐。"

# bf16 peak FLOP/s by device kind (public figures)
_PEAKS = [("v5 lite", 197e12), ("v5e", 197e12), ("v6", 918e12),
          ("v5p", 459e12), ("v5", 459e12), ("v4", 275e12)]


def peak_flops(device) -> float | None:
    kind = getattr(device, "device_kind", "").lower()
    for sub, peak in _PEAKS:
        if sub in kind:
            return peak
    return None


def compiled_flops(compiled) -> float | None:
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca["flops"])
    except Exception:
        return None


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


def probe_devices(timeout_s: float = 240.0, metric: str = "serve_rtf_chained"):
    """Initialize the device backend with a watchdog.

    The image's TPU-relay PJRT plugin blocks indefinitely inside client
    construction when the relay is unreachable; a hung bench is worse than a
    failed one, so probe in a daemon thread and hard-exit with a parseable
    JSON error line on timeout (the stuck thread is in a C call and cannot
    be interrupted — os._exit is the only clean way out).
    """
    import os
    import threading

    out: dict = {}

    def _probe():
        try:
            out["devices"] = jax.devices()
        except Exception as e:  # pragma: no cover - depends on the relay
            out["error"] = repr(e)

    th = threading.Thread(target=_probe, daemon=True)
    th.start()
    th.join(timeout_s)
    if "devices" not in out:
        print(json.dumps({
            "metric": metric, "value": None, "unit": "RTF",
            "vs_baseline": None,
            "detail": {"error": out.get(
                "error", f"device backend unreachable after {timeout_s:.0f}s "
                         "(TPU relay down?)")},
        }), flush=True)
        os._exit(1)
    return out["devices"]


def main():
    probe_devices()
    pipe = build_pipeline()
    K = pipe.lm.cfg.semantic_kmeans_num

    # real text frontend (host): hanzi -> phones/tones via the vendored G2P
    t0 = time.perf_counter()
    phones_np, tones_np = pipe.text_to_phones(TEXT, "ZH")
    t_frontend = time.perf_counter() - t0  # first call: includes jieba init
    phones = jnp.asarray(phones_np[None])
    tones = jnp.asarray(tones_np[None])
    spk = jnp.ones_like(phones)

    # generated tokens -> conditioning units, on device (BOS/EOS/PAD ids are
    # clamped into the codebook; the serve path strips them on host, but the
    # bench keeps a fixed shape so the work content is identical every call)
    codebook_arr = jnp.asarray(pipe.codebook.codebook)
    tokens_to_units = jax.jit(
        lambda cb, toks: jnp.take(cb, jnp.minimum(toks, K - 1), axis=0)
    )

    # NOTE on synchronization: through the axon relay, block_until_ready is a
    # no-op (async enqueue); only a data fetch synchronizes with execution.
    # Every timed region below ends in a scalar fetch of the final output.
    def serve_once(seed, sync=True):
        # 1. AR decode — whole-decode Pallas kernel on TPU (the serve
        # default; the kernel always runs max_new_tokens steps -> fixed work)
        toks, _ = pipe.lm.generate(
            phones, tones, spk_id=spk, max_length=N_TOKENS,
            rng=jax.random.PRNGKey(seed), impl=pipe.lm_impl,
        )
        # 2. the *generated* tokens become the diffusion conditioning
        units = tokens_to_units(codebook_arr, toks[:, :N_TOKENS])
        # 3. diffusion (20 steps DPM-Solver++) + 4. vocoder decode
        wav = pipe.infer(
            units, method="dpm-solver", infer_speedup=1000 // DIFFUSION_STEPS,
            rng=jax.random.PRNGKey(seed),
        )
        if sync:
            np.asarray(wav[0, 0])
        return wav

    # warmup / compile + PRIME: the relay's first executions of a fresh
    # program run well below steady state (measured: the first ~30 runs of
    # the train step are ~50x slower, then settle) — prime before timing
    wav = serve_once(0)
    audio_seconds = wav.shape[-1] / 44100.0
    last = None
    for i in range(6):
        last = serve_once(50 + i, sync=False)
    np.asarray(last[0, 0])  # barrier on the LAST primed call

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
    KREQ = 8
    t0 = time.perf_counter()
    last = None
    for i in range(KREQ):
        last = serve_once(100 + i, sync=False)
    np.asarray(last[0, 0])
    amortized_rtf = (time.perf_counter() - t0) / (KREQ * audio_seconds)

    # batched serve: B=8 requests in ONE compiled chain (the AR decode runs
    # all streams in lockstep, diffusion/vocoder batch trivially) — the
    # device-throughput counterpart of the per-request latency above
    BREQ = 8
    phones_b = jnp.tile(phones, (BREQ, 1))
    tones_b = jnp.tile(tones, (BREQ, 1))
    spk_b = jnp.ones_like(phones_b)

    def serve_batch(seed):
        toks, _ = pipe.lm.generate(
            phones_b, tones_b, spk_id=spk_b, max_length=N_TOKENS,
            rng=jax.random.PRNGKey(seed), impl=pipe.lm_impl,
        )
        units = tokens_to_units(codebook_arr, toks[:, :N_TOKENS])
        return pipe.infer(
            units, method="dpm-solver", infer_speedup=1000 // DIFFUSION_STEPS,
            rng=jax.random.PRNGKey(seed),
        )

    wav_b = serve_batch(0)
    np.asarray(wav_b[0, 0])  # compile+sync
    t0 = time.perf_counter()
    last = None
    for i in range(3):
        last = serve_batch(200 + i)
    np.asarray(last[0, 0])
    batch_rtf = (time.perf_counter() - t0) / (3 * BREQ * audio_seconds)

    # ---- stage drill-down (scalar-fetch synced) -----------------------------
    system = pipe.diffusion
    units_fixed = tokens_to_units(
        codebook_arr, jnp.asarray(np.random.default_rng(7).integers(0, K, (1, N_TOKENS)))
    )
    spk1 = jnp.ones((1, 1), jnp.int32)

    def diffusion_only(params, units, rng):
        cond = system.module.apply({"params": params}, units, None, spk1, None,
                                   method=system.module.condition)
        return system.diffusion.sample(params, cond, rng,
                                       method="dpm-solver",
                                       infer_speedup=1000 // DIFFUSION_STEPS)

    diff_jit = jax.jit(diffusion_only)
    mel = diff_jit(system.params, units_fixed, jax.random.PRNGKey(0))
    np.asarray(mel[0, 0, 0])

    voc = pipe.vocoder.vocoder
    voc_jit = jax.jit(lambda gp, mel: voc.generator.apply({"params": gp}, mel))
    _ = np.asarray(voc_jit(voc.generator_params, mel)[0, 0])

    def time_fn(fn, n=8, n_prime=20):
        """Chained timing: enqueue n varying executions, fetch once at the end
        (single-device execution is in-order) — amortizes the ~30 ms relay
        round-trip out of the per-call figure.  Inputs vary per iteration
        because the relay memoizes identical executions; a priming chain runs
        first because the relay's first executions of a fresh program are far
        below steady state."""
        out = fn(0)
        np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])  # compile
        for i in range(1, n_prime + 1):
            out = fn(1000 + i)
        np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])  # primed
        t0 = time.perf_counter()
        for i in range(1, n + 1):
            out = fn(i)
        np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
        return (time.perf_counter() - t0) / n

    t_lm = time_fn(lambda i: pipe.lm.generate(
        phones, tones, spk_id=spk, max_length=N_TOKENS,
        rng=jax.random.PRNGKey(9 + i), impl=pipe.lm_impl)[0])
    t_lm_scan = time_fn(lambda i: pipe.lm.generate(
        phones, tones, spk_id=spk, max_length=N_TOKENS,
        rng=jax.random.PRNGKey(9 + i), impl="xla")[0])
    t_diff = time_fn(lambda i: diff_jit(system.params, units_fixed + 1e-6 * (i + 1),
                                        jax.random.PRNGKey(9 + i)))
    t_voc = time_fn(lambda i: voc_jit(voc.generator_params, mel + 1e-6 * (i + 1)))

    denoiser_steps_per_s = DIFFUSION_STEPS / t_diff
    vocoder_mel_frames_per_s = N_TOKENS / t_voc

    # ---- MFU via XLA cost analysis ------------------------------------------
    peak = peak_flops(jax.devices()[0])
    sampling_args = dict(max_length=N_TOKENS)
    from latent_diffusion_speech_tpu.models.lm.sampling import SamplingConfig

    sampling = SamplingConfig(
        max_new_tokens=N_TOKENS, do_sample=True, temperature=1.0, top_k=5,
        top_p=0.8, repetition_penalty=1.2, end_gate_threshold=None,
        eos_token_id=pipe.lm.cfg.semantic_eos, pad_token_id=pipe.lm.cfg.semantic_pad,
        bos_token_id=pipe.lm.cfg.semantic_bos,
    )
    flops_lm = compiled_flops(
        type(pipe.lm)._generate.lower(
            pipe.lm, pipe.lm.params, phones, tones, spk, None, sampling,
            jax.random.PRNGKey(0)).compile()
    )
    flops_diff = compiled_flops(
        diff_jit.lower(system.params, units_fixed, jax.random.PRNGKey(0)).compile()
    )
    flops_voc = compiled_flops(voc_jit.lower(voc.generator_params, mel).compile())

    mfu_serve = None
    if peak and None not in (flops_lm, flops_diff, flops_voc):
        # per-request wall at pipelined throughput (device utilization; the
        # single-stream `best` additionally carries the relay round-trip)
        mfu_serve = (flops_lm + flops_diff + flops_voc) / (
            amortized_rtf * audio_seconds
        ) / peak

    # ---- flagship train step at B=64 (1 s crops) ----------------------------
    from latent_diffusion_speech_tpu.config import Config
    from latent_diffusion_speech_tpu.train.diffusion_trainer import DiffusionTrainer

    cfg = Config()
    trainer = DiffusionTrainer(cfg, dtype=jnp.bfloat16)
    B, T = 64, 88
    rng_np = np.random.default_rng(3)
    batch = trainer.device_put_batch({
        "units": rng_np.standard_normal((B, T, 1280)).astype(np.float32),
        "mel": rng_np.standard_normal((B, T, 128)).astype(np.float32),
        "spk_id": np.ones((B, 1), np.int32),
    })
    flops_train = compiled_flops(
        trainer._train_step.lower(
            trainer.system.params, trainer.opt_state, batch,
            jax.random.PRNGKey(0), trainer.vq_state).compile()
    )
    # warmup/compile + prime (the first ~30 executions of a fresh program
    # through the relay run far below steady state)
    metrics = trainer.train_step(batch, jax.random.PRNGKey(1))
    float(metrics["loss"])  # sync
    for i in range(30):
        metrics = trainer.train_step(batch, jax.random.PRNGKey(200 + i))
    float(metrics["loss"])
    # latency: one step, fetch-synced (includes the ~30 ms relay round-trip)
    steps = []
    for i in range(3):
        t0 = time.perf_counter()
        metrics = trainer.train_step(batch, jax.random.PRNGKey(2 + i))
        float(metrics["loss"])
        steps.append(time.perf_counter() - t0)
    t_train_latency = min(steps)
    # throughput: N chained steps, one sync — the honest device step time
    # (training is a steady stream of steps; the per-sync relay floor is not
    # part of the device's work)
    N_CHAIN = 30
    t0 = time.perf_counter()
    for i in range(N_CHAIN):
        metrics = trainer.train_step(batch, jax.random.PRNGKey(10 + i))
    float(metrics["loss"])
    t_train = (time.perf_counter() - t0) / N_CHAIN
    mfu_train = flops_train / t_train / peak if (peak and flops_train) else None

    # large-batch training point (the reference trains at batch 500; B=256
    # of 1 s crops is the closest production geometry that fits one chip)
    B2 = 256
    batch2 = trainer.device_put_batch({
        "units": rng_np.standard_normal((B2, T, 1280)).astype(np.float32),
        "mel": rng_np.standard_normal((B2, T, 128)).astype(np.float32),
        "spk_id": np.ones((B2, 1), np.int32),
    })
    flops_train_b256 = compiled_flops(
        trainer._train_step.lower(
            trainer.system.params, trainer.opt_state, batch2,
            jax.random.PRNGKey(0), trainer.vq_state).compile()
    )
    metrics = trainer.train_step(batch2, jax.random.PRNGKey(500))
    float(metrics["loss"])
    for i in range(30):
        metrics = trainer.train_step(batch2, jax.random.PRNGKey(600 + i))
    float(metrics["loss"])
    t0 = time.perf_counter()
    for i in range(N_CHAIN):
        metrics = trainer.train_step(batch2, jax.random.PRNGKey(700 + i))
    float(metrics["loss"])
    t_train_b256 = (time.perf_counter() - t0) / N_CHAIN
    mfu_train_b256 = (
        flops_train_b256 / t_train_b256 / peak if (peak and flops_train_b256) else None
    )

    print(
        json.dumps(
            {
                "metric": "tts_serve_rtf_20step_dpmpp",
                "value": round(rtf, 5),
                "unit": "rtf",
                "vs_baseline": round(TARGET_RTF / rtf, 3),
                "detail": {
                    "chained": "text->LM->tokens->embed->diffusion->vocoder (generated tokens are the conditioning)",
                    "text_frontend_s_first_call": round(t_frontend, 3),
                    "audio_seconds": round(audio_seconds, 3),
                    "best_wall_s": round(best, 3),
                    "all_wall_s": [round(t, 3) for t in times],
                    "pipelined_throughput_rtf": round(amortized_rtf, 5),
                    "batch8_throughput_rtf": round(batch_rtf, 5),
                    "lm_decode_s": round(t_lm, 4),
                    "lm_decode_scan_s": round(t_lm_scan, 4),
                    "lm_impl": pipe.lm_impl,
                    "diffusion_20step_s": round(t_diff, 4),
                    "vocoder_decode_s": round(t_voc, 4),
                    "denoiser_steps_per_s": round(denoiser_steps_per_s, 1),
                    "vocoder_mel_frames_per_s": round(vocoder_mel_frames_per_s),
                    "mfu_serve": round(mfu_serve, 4) if mfu_serve else None,
                    "mfu_train_b64": round(mfu_train, 4) if mfu_train else None,
                    "train_step_b64_s": round(t_train, 4),
                    "train_step_b64_latency_s": round(t_train_latency, 4),
                    "train_samples_per_s_b64": round(B / t_train, 1),
                    "mfu_train_b256": round(mfu_train_b256, 4) if mfu_train_b256 else None,
                    "train_step_b256_s": round(t_train_b256, 4),
                    "train_samples_per_s_b256": round(B2 / t_train_b256, 1),
                    "flops": {
                        "lm_generate": flops_lm, "diffusion_20step": flops_diff,
                        "vocoder": flops_voc, "train_step_b64": flops_train,
                        "train_step_b256": flops_train_b256,
                        "peak_bf16": peak,
                    },
                    "sync": "scalar-fetch (relay block_until_ready is async); "
                            "stage times + train step are chained-amortized "
                            "(relay round-trip excluded), serve latency is not",
                    "device": str(jax.devices()[0]),
                    "measured_artifacts": _artifact_summary(),
                },
            }
        )
    )


def _artifact_summary():
    """Key numbers from the standalone on-chip benches (benchmarks/*.json),
    inlined so one bench line carries the round's whole evidence trail."""
    import os

    base = os.path.join(os.path.dirname(os.path.abspath(__file__)), "benchmarks")

    def get(name, *path):
        try:
            with open(os.path.join(base, name)) as f:
                cur = json.load(f)
            for k in path:
                cur = cur[k]
            return cur
        except Exception:
            return None

    return {
        "fidelity_mcd_db_bf16_shipping": get(
            "FIDELITY.json", "detail", "bf16_shipping", "mcd_db"),
        "fidelity_mcd_db_f32": get("FIDELITY.json", "value"),
        "codec_gan_step_s_b16": get("TRAINER_BENCH.json", "codec", "step_s"),
        "codec_gan_mfu": get("TRAINER_BENCH.json", "codec", "mfu"),
        "lm_train_tokens_per_s_b100": get(
            "TRAINER_BENCH.json", "lm_roformer", "tokens_per_s"),
        "diffusion_b500_samples_per_s": get(
            "TRAINER_BENCH.json", "diffusion_b500_reference_batch", "samples_per_s"),
        "serve_long_rtf_under_load": get(
            "SERVE_LOAD_LONG.json", "load", "serve_rtf_under_load"),
        "serve_long_p99_s": get("SERVE_LOAD_LONG.json", "load", "latency_s", "p99"),
        "sustained_b256_samples_per_s": get(
            "TRAIN_SUSTAINED.json", "b256_device_collate_bf16",
            "sustained_samples_per_s"),
        "sustained_note": "tunnel-transfer-bound in this environment; see "
                          "TRAIN_SUSTAINED.json bottleneck_decomposition",
        "ja_g2p_heldout_acc": get("JA_G2P_EVAL.json", "heldout", "phone_accuracy"),
        "zh_g2p_heldout_acc": get("ZH_G2P_EVAL.json", "heldout", "phone_accuracy"),
        "en_lts_oov_phone_acc": get("EN_LTS_EVAL.json", "phone_accuracy"),
        # round-5 additions
        "lm_effective_tokens_per_s_length_sorted": get(
            "TRAINER_BENCH.json", "lm_padding", "length_sorted",
            "effective_tokens_per_s"),
        "lm_epoch_speedup_length_sorted": get(
            "TRAINER_BENCH.json", "lm_padding",
            "epoch_speedup_length_sorted"),
        "stage_whisper_extract_xrt": _stage(get, "whisper_units_extract_10s",
                                            "detail", "xrt"),
        "stage_kmeans_mframes_per_s": _stage(get, "kmeans_tokenize_30k_frames",
                                             "detail", "mframes_per_s"),
        "serve_stream_ttfa_p50_s": get(
            "SERVE_LOAD_LONG.json", "stream", "ttfa_s", "p50"),
        "serve_stream_unloaded_ttfa_over_total": get(
            "SERVE_LOAD_LONG.json", "stream_unloaded", "ttfa_over_total_p50"),
        "int8_serve_adopted": get("INT8_SERVE_AB.json", "detail", "adopted"),
        "pipeline_soak_total_s": get("PIPELINE_SOAK.json", "value"),
        "fidelity_divergence": get("FIDELITY_DIVERGENCE.json", "detail",
                                   "verdict"),
    }


def _stage(get, metric, *path):
    """Pull one stage row out of STAGE_BENCH.json's stages list."""
    stages = get("STAGE_BENCH.json", "stages")
    if not stages:
        return None
    for row in stages:
        if row.get("metric") == metric:
            cur = row
            try:
                for k in path:
                    cur = cur[k]
                return cur
            except Exception:
                return None
    return None


if __name__ == "__main__":
    main()
