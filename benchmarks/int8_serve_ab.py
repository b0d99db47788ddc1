"""On-chip A/B: int8 weight-quantized UNet sampling vs bf16, B=1 serve.

The B=1 diffusion stage is weight-bandwidth-bound (~187 MB of bf16 UNet
weights re-stream from HBM per solver step — analysis in
ops/pallas/unet1d_stream.py).  `Unit2MelSystem(weight_quant="int8")` halves
that stream by storing matmul kernels as int8 + per-channel scales and
dequantizing inside the sampler scan (ops/weight_quant.py).  This bench
measures what that is actually worth on the chip:

  1. diffusion-only 20-step DPM-Solver++ stage at the serve geometry
     (B=1, T=430 frames), bf16 vs int8, chained-amortized timing;
  2. the full chained serve path (text -> LM -> diffusion -> vocoder)
     with each variant — the headline RTF both ways.

Decision rule (VERDICT round-4 item 1): adopt int8 as the serve default iff
it wins the stage time AND its fidelity row (benchmarks/fidelity_bench.py
--tpu, int8_shipping) stays inside the 0.5 dB MCD budget; otherwise record
the negative result here and keep bf16.

Writes benchmarks/INT8_SERVE_AB.json and prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

sys.path.insert(0, str(Path(__file__).parent.parent))
from bench import probe_devices  # noqa: E402

probe_devices(metric="int8_serve_ab")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

N_TOKENS = 430
DIFFUSION_STEPS = 20
TEXT = "今天天气真好,我们一起去公园散步,然后听音乐。"


def time_chain(fn, n=8, n_prime=25):
    """bench.py's chained timing: prime past the relay's slow-start, then
    enqueue n varying executions and fetch once (in-order execution)."""
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


def build(weight_quant):
    from latent_diffusion_speech_tpu.infer import TTSPipeline
    from latent_diffusion_speech_tpu.models.diffusion import (
        Unit2MelConfig,
        Unit2MelSystem,
    )
    from latent_diffusion_speech_tpu.models.lm.roformer import (
        RoformerConfig,
        RoformerSystem,
    )
    from latent_diffusion_speech_tpu.models.vocoder import Vocoder

    rng = np.random.default_rng(0)
    codebook = rng.standard_normal((4096, 1280)).astype(np.float32)
    diffusion = Unit2MelSystem(
        Unit2MelConfig(), dtype=jnp.bfloat16, weight_quant=weight_quant
    )
    vocoder = Vocoder("hifi-vaegan", dtype=jnp.bfloat16)
    lm = RoformerSystem(RoformerConfig(), dtype=jnp.bfloat16)
    return TTSPipeline(diffusion, vocoder, lm=lm, codebook=codebook)


def main():
    pipes = {"bf16": build(None), "int8": build("int8")}
    # identical weights in both variants — quantization is the only delta
    pipes["int8"].diffusion.params = pipes["bf16"].diffusion.params
    K = pipes["bf16"].lm.cfg.semantic_kmeans_num

    phones_np, tones_np = pipes["bf16"].text_to_phones(TEXT, "ZH")
    phones = jnp.asarray(phones_np[None])
    tones = jnp.asarray(tones_np[None])
    spk = jnp.ones_like(phones)
    spk1 = jnp.ones((1, 1), jnp.int32)

    rng_np = np.random.default_rng(7)
    codebook_arr = jnp.asarray(pipes["bf16"].codebook.codebook)
    units_fixed = jnp.take(
        codebook_arr, jnp.asarray(rng_np.integers(0, K, (1, N_TOKENS))), axis=0
    )

    rows = {}
    for name, pipe in pipes.items():
        system = pipe.diffusion

        def diffusion_only(params, units, rng):
            cond = system.module.apply(
                {"params": params}, units, None, spk1, None,
                method=system.module.condition,
            )
            return system.diffusion.sample(
                params, cond, rng, method="dpm-solver",
                infer_speedup=1000 // DIFFUSION_STEPS,
            )

        diff_jit = jax.jit(diffusion_only)
        t_diff = time_chain(
            lambda i: diff_jit(
                system.params, units_fixed + 1e-6 * (i + 1), jax.random.PRNGKey(9 + i)
            )
        )

        def serve_once(seed):
            toks, _ = pipe.lm.generate(
                phones, tones, spk_id=spk, max_length=N_TOKENS,
                rng=jax.random.PRNGKey(seed), impl=pipe.lm_impl,
            )
            units = jnp.take(codebook_arr, jnp.minimum(toks[:, :N_TOKENS], K - 1), axis=0)
            return pipe.infer(
                units, method="dpm-solver", infer_speedup=1000 // DIFFUSION_STEPS,
                rng=jax.random.PRNGKey(seed),
            )

        # prime, then per-request latency (fetch-synced, like bench.py)
        wav = serve_once(0)
        np.asarray(wav[0, 0])
        audio_seconds = wav.shape[-1] / 44100.0
        last = None
        for i in range(6):
            last = serve_once(50 + i)
        np.asarray(last[0, 0])
        times = []
        for i in range(3):
            t0 = time.perf_counter()
            w = serve_once(i + 1)
            np.asarray(w[0, 0])
            times.append(time.perf_counter() - t0)
        rows[name] = {
            "diffusion_20step_s": round(t_diff, 5),
            "denoiser_steps_per_s": round(DIFFUSION_STEPS / t_diff, 1),
            "serve_best_wall_s": round(min(times), 3),
            "serve_rtf": round(min(times) / audio_seconds, 5),
            "audio_seconds": round(audio_seconds, 3),
        }

    speedup = rows["bf16"]["diffusion_20step_s"] / rows["int8"]["diffusion_20step_s"]
    # fidelity side of the decision rule, if the fidelity bench has run
    mcd = None
    fid = Path(__file__).parent / "FIDELITY.json"
    if fid.exists():
        mcd = (json.loads(fid.read_text())["detail"]
               .get("int8_shipping", {}).get("mcd_db"))
    adopted = bool(speedup > 1.02 and mcd is not None and mcd <= 0.5)
    decision = (
        "ADOPT int8 as serve default" if adopted else
        f"KEEP bf16: stage speedup {speedup:.3f}x "
        + ("(<= noise threshold 1.02; " if speedup <= 1.02 else "(")
        + "the B=1 UNet step sits at the XLA per-op overhead floor "
          "(~100 ops x ~8-22 us/op — see ops/pallas/unet1d_stream.py "
          "analysis), not the HBM weight-stream bound, so halving weight "
          "bytes buys nothing and the in-scan dequant adds ops)"
        + (f"; fidelity int8 MCD {mcd} dB is inside the 0.5 budget"
           if mcd is not None else "")
    )
    result = {
        "metric": "int8_weight_quant_diffusion_speedup",
        "value": round(speedup, 4),
        "unit": "x (bf16_time / int8_time, >1 means int8 faster)",
        "vs_baseline": round(speedup, 4),
        "detail": {
            "bf16": rows["bf16"],
            "int8": rows["int8"],
            "serve_rtf_delta": round(
                rows["bf16"]["serve_rtf"] - rows["int8"]["serve_rtf"], 5
            ),
            "geometry": "flagship B=1, T=430 frames, 20-step DPM-Solver++",
            "same_weights": True,
            "decision_rule": "adopt int8 as serve default iff stage speedup > "
                             "1.02 AND fidelity int8_shipping MCD <= 0.5 dB",
            "int8_mcd_db": mcd,
            "adopted": adopted,
            "decision": decision,
            "device": str(jax.devices()[0]),
        },
    }
    out = Path(__file__).parent / "INT8_SERVE_AB.json"
    out.write_text(json.dumps(result, indent=2))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
