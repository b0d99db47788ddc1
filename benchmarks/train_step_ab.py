"""A/B UNet lowering knobs on the flagship diffusion train step (T=88).

Arms (each a fresh trainer, timed by the relay rules — primed 30, chained 30,
scalar-fetch sync):

* r2-baseline  : attn=xla, gelu=exact   (round-2 BENCH configuration)
* geglu-2x4C   : attn=xla, gelu=exact   + the two-matmul GegluFF (always on
                 now — this arm isolates the split win vs the r2 numbers)
* gelu-tanh    : attn=xla, gelu=tanh    (the bf16-auto default: erf -> tanh,
                 error below bf16 resolution)
* attn-fused   : attn=fused, gelu=tanh  (the Pallas attention kernel, kept as
                 a measured negative result)

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/train_step_ab.py
"""

from __future__ import annotations

import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np

from latent_diffusion_speech_tpu.config import Config
from latent_diffusion_speech_tpu.train.diffusion_trainer import DiffusionTrainer

T = 88
N_PRIME, N_CHAIN = 30, 30


def _note(msg: str) -> None:
    print(f"[train_step_ab] {msg}", file=sys.stderr, flush=True)


def measure(name: str, attn_impl: str, gelu: str, B: int, qkv: str = "split") -> dict:
    _note(f"building {name} (attn={attn_impl} gelu={gelu} qkv={qkv} B={B})")
    cfg = Config()
    cfg.diffusion.model.attn_impl = attn_impl
    cfg.diffusion.model.gelu = gelu
    cfg.diffusion.model.qkv = qkv
    trainer = DiffusionTrainer(cfg, dtype=jnp.bfloat16)
    rng_np = np.random.default_rng(3)
    batch = trainer.device_put_batch({
        "units": rng_np.standard_normal((B, T, 1280)).astype(np.float32),
        "mel": rng_np.standard_normal((B, T, 128)).astype(np.float32),
        "spk_id": np.ones((B, 1), np.int32),
    })
    try:
        ca = trainer._train_step.lower(
            trainer.system.params, trainer.opt_state, batch,
            jax.random.PRNGKey(0), trainer.vq_state).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca["flops"])
    except Exception:
        flops = None

    metrics = trainer.train_step(batch, jax.random.PRNGKey(1))
    float(metrics["loss"])
    for i in range(N_PRIME):
        metrics = trainer.train_step(batch, jax.random.PRNGKey(200 + i))
    float(metrics["loss"])

    t0 = time.perf_counter()
    for i in range(N_CHAIN):
        metrics = trainer.train_step(batch, jax.random.PRNGKey(10 + i))
    loss = float(metrics["loss"])
    step_s = (time.perf_counter() - t0) / N_CHAIN
    row = {"arm": name, "attn_impl": attn_impl, "gelu": gelu, "qkv": qkv, "B": B,
           "step_ms": step_s * 1e3, "samples_per_s": B / step_s,
           "loss": loss, "flops": flops}
    _note(json.dumps(row))
    return row


def main():
    from latent_diffusion_speech_tpu.utils.flops import device_peak_flops

    dev = jax.devices()[0]
    results = []
    for B in (64, 256):
        results.append(measure("geglu-2x4C+exact", "xla", "exact", B))
        results.append(measure("gelu-tanh", "xla", "tanh", B))
        results.append(measure("qkv-fused", "xla", "exact", B, qkv="fused"))
    peak = device_peak_flops(dev)
    for r in results:
        if peak and r["flops"]:
            r["mfu"] = r["flops"] / (r["step_ms"] / 1e3) / peak
    print(json.dumps({"device": str(dev), "T": T, "results": results}))


if __name__ == "__main__":
    main()
