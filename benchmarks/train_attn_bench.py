"""A/B the UNet attention lowering on the flagship diffusion train step.

`attn_impl='xla'` is einsum attention (f32 softmax, (B, H, T, T) logits in
HBM); `'fused'` is the single-block Pallas fused-attention kernel with a
custom-VJP backward (`ops/pallas/fused_attention.py`) — the target the
round-3 train-step decomposition identified (attention blocks: 84% of UNet
forward wall at ~20% MFU, logits-traffic-bound; benchmarks/TRAIN_DECOMPOSE.json).

Timing follows the relay rules (prime ~30 executions, chain-amortize, scalar
fetch to sync).  Run on the real chip:

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/train_attn_bench.py
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
    print(f"[train_attn_bench] {msg}", file=sys.stderr, flush=True)


def measure(attn_impl: str, B: int) -> dict:
    _note(f"building trainer attn_impl={attn_impl} B={B}")
    cfg = Config()
    cfg.diffusion.model.attn_impl = attn_impl
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

    _note("compiling + first step")
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
    row = {"attn_impl": attn_impl, "B": B, "step_ms": step_s * 1e3,
           "samples_per_s": B / step_s, "loss": loss, "flops": flops}
    _note(json.dumps(row))
    return row


def main():
    from latent_diffusion_speech_tpu.utils.flops import device_peak_flops

    dev = jax.devices()[0]
    results = [measure("xla", 64), measure("fused", 64),
               measure("xla", 256), measure("fused", 256)]
    peak = device_peak_flops(dev)
    for r in results:
        if peak and r["flops"]:
            r["mfu"] = r["flops"] / (r["step_ms"] / 1e3) / peak
    print(json.dumps({"device": str(dev), "T": T, "results": results}))


if __name__ == "__main__":
    main()
