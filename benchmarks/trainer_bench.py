"""On-chip step timing for the codec (GAN) and LM trainers.

The diffusion train step has MFU numbers (BENCH_r03, TRAIN_DECOMPOSE); the
other two trainers never did.  This times them at reference training
geometry, chained-amortized through the relay (see bench.py timing notes):

* codec: one alternating D/G step — VAE encoder + generator + MPD 5-period
  bank + MS-STFT discriminators + feature/KL/RSS losses, the FLOPs-heaviest
  loop in the stack (`/root/reference/encoder/hifi_vaegan/modules/
  models.py:69-159,305-334`, `msstftd.py:86-190`).
* LM: the RoFormer enc-dec step at the reference batch 100
  (`/root/reference/configs/config.yaml` text2semantic.train.batch_size,
  `text2semantic/roformer/train.py:73-159`).

Writes benchmarks/TRAINER_BENCH.json.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import sys  # noqa: E402
from pathlib import Path as _Path  # noqa: E402

sys.path.insert(0, str(_Path(__file__).parent.parent))
from bench import probe_devices  # noqa: E402

probe_devices(metric="trainer_bench")  # fail fast if the relay is wedged

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

OUT = Path(__file__).parent / "TRAINER_BENCH.json"

# codec geometry: HiFi-GAN-style random crops; 16384 samples = 32 latent
# frames at hop 512, batch 16 — a standard GAN training shape for this codec
CODEC_B, CODEC_T = 16, 16384
# LM geometry: reference batch 100; ~64 phones conditioning ~448 semantic
# tokens (~5 s of audio at 86 fps)
LM_B, LM_TXT, LM_SEM = 100, 64, 448

N_PRIME, N_CHAIN = 30, 20


def _peak():
    from latent_diffusion_speech_tpu.utils.flops import device_peak_flops

    return device_peak_flops(jax.devices()[0])


def _flops(lowered) -> float | None:
    try:
        ca = lowered.compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca["flops"])
    except Exception:
        return None


def _fetch(tree):
    np.asarray(jax.tree_util.tree_leaves(tree)[0].reshape(-1)[0])


def bench_codec() -> dict:
    from latent_diffusion_speech_tpu.train.codec_trainer import CodecTrainer

    tr = CodecTrainer()
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((CODEC_B, CODEC_T)).astype(np.float32))
    key = jax.random.PRNGKey(0)

    # one combined D+G step as trained (train_step semantics, minus its
    # per-call float() sync)
    def step(i):
        r1, r2 = jax.random.split(jax.random.fold_in(key, i))
        a = audio + 1e-6 * i  # distinct inputs: the relay memoizes repeats
        dp, do, dl = tr._disc_step(tr.disc_params, tr.disc_opt, tr.gen_params, a, r1)
        tr.disc_params, tr.disc_opt = dp, do
        gp, go, gl, aux, vq = tr._gen_step(
            tr.gen_params, tr.gen_opt, tr.disc_params, tr.vq_state, a, r2
        )
        tr.gen_params, tr.gen_opt, tr.vq_state = gp, go, vq
        return gl

    _fetch(step(0))  # compile both programs
    flops_d = _flops(tr._disc_step.lower(
        tr.disc_params, tr.disc_opt, tr.gen_params, audio, key))
    flops_g = _flops(tr._gen_step.lower(
        tr.gen_params, tr.gen_opt, tr.disc_params, tr.vq_state, audio, key))
    for i in range(1, N_PRIME + 1):
        out = step(i)
    _fetch(out)
    t0 = time.perf_counter()
    for i in range(N_PRIME, N_PRIME + N_CHAIN):
        out = step(i)
    _fetch(out)
    dt = (time.perf_counter() - t0) / N_CHAIN

    peak = _peak()
    flops = (flops_d or 0) + (flops_g or 0)
    sec_audio = CODEC_B * CODEC_T / 44100.0
    res = {
        "batch": CODEC_B, "segment": CODEC_T,
        "step_s": round(dt, 4),
        "audio_seconds_per_step": round(sec_audio, 2),
        "audio_seconds_per_s": round(sec_audio / dt, 1),
        "flops_disc_step": flops_d, "flops_gen_step": flops_g,
        "mfu": round(flops / dt / peak, 4) if (peak and flops) else None,
        "loss_finite": bool(np.isfinite(float(out))),
    }
    print("[codec]", json.dumps(res), flush=True)
    return res


def bench_codec_decompose(res: dict) -> dict:
    """Stage timings when the combined MFU is low: encoder, generator, disc
    bank forward each at the training shape (chained, primed)."""
    from latent_diffusion_speech_tpu.train.codec_trainer import CodecTrainer

    tr = CodecTrainer()
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((CODEC_B, CODEC_T)).astype(np.float32))
    z = jnp.asarray(rng.standard_normal(
        (CODEC_B, CODEC_T // tr.cfg.hop_size, tr.cfg.inter_channels)
    ).astype(np.float32))
    key = jax.random.PRNGKey(0)

    enc = jax.jit(lambda p, a, r: tr.encoder.apply(
        {"params": p}, a, rngs={"latent": r})[0])
    gen = jax.jit(lambda p, zz: tr.generator.apply({"params": p}, zz))
    dis = jax.jit(lambda p, a: tr.disc.apply({"params": p}, a)[0])

    def timed(fn, *args, vary):
        out = fn(*args)
        _fetch(out)
        for i in range(12):
            out = fn(*vary(i))
        _fetch(out)
        t0 = time.perf_counter()
        for i in range(12, 12 + 10):
            out = fn(*vary(i))
        _fetch(out)
        return (time.perf_counter() - t0) / 10

    t_enc = timed(enc, tr.gen_params["encoder"], audio, key,
                  vary=lambda i: (tr.gen_params["encoder"], audio + 1e-6 * i,
                                  jax.random.fold_in(key, i)))
    t_gen = timed(gen, tr.gen_params["generator"], z,
                  vary=lambda i: (tr.gen_params["generator"], z + 1e-6 * i))
    t_disc = timed(dis, tr.disc_params, audio,
                   vary=lambda i: (tr.disc_params, audio + 1e-6 * i))
    dec = {
        "encoder_fwd_s": round(t_enc, 4),
        "generator_fwd_s": round(t_gen, 4),
        "disc_bank_fwd_s": round(t_disc, 4),
        "note": "gen_step ~= enc+gen fwd+bwd + 2x disc fwd (+1 bwd-through); "
                "disc_step ~= enc+gen fwd + 2x disc fwd+bwd",
    }
    print("[codec decompose]", json.dumps(dec), flush=True)
    return dec


def bench_lm() -> dict:
    from latent_diffusion_speech_tpu.config import Config
    from latent_diffusion_speech_tpu.train.lm_trainer import LMTrainer

    cfg = Config()
    tr = LMTrainer(cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(1)
    V_PH = tr.lm_cfg.n_phones if hasattr(tr.lm_cfg, "n_phones") else 200
    K = tr.lm_cfg.semantic_kmeans_num
    batch = tr.device_put_batch({
        "phone": rng.integers(1, min(V_PH, 100), (LM_B, LM_TXT)).astype(np.int32),
        "tone": rng.integers(0, 8, (LM_B, LM_TXT)).astype(np.int32),
        "semantic": rng.integers(0, K, (LM_B, LM_SEM)).astype(np.int32),
        "labels": rng.integers(0, K, (LM_B, LM_SEM)).astype(np.int32),
    })
    key = jax.random.PRNGKey(0)

    def step(i):
        p, o, loss, g = tr._train_step(
            tr.system.params, tr.opt_state, batch, jax.random.fold_in(key, i)
        )
        tr.system.params, tr.opt_state = p, o
        return loss

    _fetch(step(0))
    flops = _flops(tr._train_step.lower(
        tr.system.params, tr.opt_state, batch, key))
    for i in range(1, N_PRIME + 1):
        out = step(i)
    _fetch(out)
    t0 = time.perf_counter()
    for i in range(N_PRIME, N_PRIME + N_CHAIN):
        out = step(i)
    _fetch(out)
    dt = (time.perf_counter() - t0) / N_CHAIN

    peak = _peak()
    res = {
        "model": tr.lm_type, "batch": LM_B,
        "text_len": LM_TXT, "semantic_len": LM_SEM,
        "step_s": round(dt, 4),
        "samples_per_s": round(LM_B / dt, 1),
        "tokens_per_s": round(LM_B * LM_SEM / dt),
        "flops_step": flops,
        "mfu": round(flops / dt / peak, 4) if (peak and flops) else None,
        "loss_finite": bool(np.isfinite(float(out))),
    }
    print("[lm]", json.dumps(res), flush=True)
    return res


def main():
    results = {"bench": "codec GAN + RoFormer LM train-step timing "
                        "(chained-amortized, primed, relay-synced by fetch)",
               "device": str(jax.devices()[0])}
    results["codec"] = bench_codec()
    if results["codec"].get("mfu") is not None and results["codec"]["mfu"] < 0.2:
        results["codec"]["decompose"] = bench_codec_decompose(results["codec"])
    results["lm_roformer"] = bench_lm()
    OUT.write_text(json.dumps(results, indent=1))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
