"""A/B the UNet conv lowering on the flagship train step (B=64, 1 s crops).

`conv_impl='xla'` keeps `lax.conv_general_dilated`; `'matmul'` lowers every
UNet conv (fwd AND bwd) to shifted dot_generals — the conv-backward layout
experiment the round-2 train-step decomposition pointed at (fwd 6.4 ms /
bwd ~12.5 ms at ~34% MFU, see TODO.md).

Timing follows the relay rules (prime ~30 executions, chain-amortize, scalar
fetch to sync).  Run on the real chip:

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/train_conv_bench.py
"""

from __future__ import annotations

import json
import sys
import time

import jax


def _note(msg: str) -> None:
    print(f"[train_conv_bench] {msg}", file=sys.stderr, flush=True)

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np

from latent_diffusion_speech_tpu.config import Config
from latent_diffusion_speech_tpu.models.diffusion import Unit2MelConfig
from latent_diffusion_speech_tpu.train.diffusion_trainer import DiffusionTrainer

B, T = 64, 88
N_PRIME, N_CHAIN = 30, 30


def measure(conv_impl: str) -> dict:
    _note(f"building trainer conv_impl={conv_impl}")
    cfg = Config()
    cfg.diffusion.model.conv_impl = conv_impl
    trainer = DiffusionTrainer(cfg, dtype=jnp.bfloat16)
    _note("trainer built; lowering for cost analysis")
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

    _note("cost analysis done; compiling + first step")
    metrics = trainer.train_step(batch, jax.random.PRNGKey(1))
    float(metrics["loss"])  # compile + sync
    _note("first step done; priming")
    for i in range(N_PRIME):
        metrics = trainer.train_step(batch, jax.random.PRNGKey(200 + i))
    float(metrics["loss"])  # primed

    t0 = time.perf_counter()
    for i in range(N_CHAIN):
        metrics = trainer.train_step(batch, jax.random.PRNGKey(10 + i))
    loss = float(metrics["loss"])
    step_s = (time.perf_counter() - t0) / N_CHAIN
    return {"conv_impl": conv_impl, "step_ms": step_s * 1e3,
            "samples_per_s": B / step_s, "loss": loss, "flops": flops}


def main():
    from latent_diffusion_speech_tpu.utils.flops import device_peak_flops

    dev = jax.devices()[0]
    results = [measure("xla"), measure("matmul")]
    peak = device_peak_flops(dev)
    for r in results:
        if peak and r["flops"]:
            r["mfu"] = r["flops"] / (r["step_ms"] / 1e3) / peak
    print(json.dumps({"device": str(dev), "B": B, "T": T, "results": results}))


if __name__ == "__main__":
    main()
