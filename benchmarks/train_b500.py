"""Flagship diffusion train step at the REFERENCE production batch (bs 500).

The reference trains the diffusion stage at batch_size 500 of 1 s crops
(`/root/reference/configs/config.yaml:38` train.batch_size: 500); bench.py
covers B=64/256.  This times the exact reference geometry on one chip and
merges the row into benchmarks/TRAINER_BENCH.json.

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/train_b500.py
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

probe_devices(metric="train_b500")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

OUT = Path(__file__).parent / "TRAINER_BENCH.json"
B, T = 500, 88
N_PRIME, N_CHAIN = 30, 20


def main():
    from latent_diffusion_speech_tpu.config import Config
    from latent_diffusion_speech_tpu.train.diffusion_trainer import DiffusionTrainer
    from latent_diffusion_speech_tpu.utils.flops import device_peak_flops

    trainer = DiffusionTrainer(Config(), dtype=jnp.bfloat16)
    rng_np = np.random.default_rng(3)
    batch = trainer.device_put_batch({
        "units": rng_np.standard_normal((B, T, 1280)).astype(np.float32),
        "mel": rng_np.standard_normal((B, T, 128)).astype(np.float32),
        "spk_id": np.ones((B, 1), np.int32),
    })
    flops = None
    try:
        ca = trainer._train_step.lower(
            trainer.system.params, trainer.opt_state, batch,
            jax.random.PRNGKey(0), trainer.vq_state).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca["flops"])
    except Exception:
        pass

    m = trainer.train_step(batch, jax.random.PRNGKey(1))
    float(m["loss"])  # compile + sync
    for i in range(N_PRIME):
        m = trainer.train_step(batch, jax.random.PRNGKey(100 + i))
    float(m["loss"])
    t0 = time.perf_counter()
    for i in range(N_CHAIN):
        m = trainer.train_step(batch, jax.random.PRNGKey(200 + i))
    float(m["loss"])
    dt = (time.perf_counter() - t0) / N_CHAIN

    peak = device_peak_flops(jax.devices()[0])
    row = {
        "batch": B, "frames": T,
        "step_s": round(dt, 4),
        "samples_per_s": round(B / dt, 1),
        "flops_step": flops,
        "mfu": round(flops / dt / peak, 4) if (peak and flops) else None,
        "loss_finite": bool(np.isfinite(float(m["loss"]))),
        "note": "reference production geometry: config.yaml diffusion "
                "train.batch_size 500, 1 s crops",
    }
    print("[diffusion b500]", json.dumps(row), flush=True)
    d = json.loads(OUT.read_text()) if OUT.exists() else {}
    d["diffusion_b500_reference_batch"] = row
    OUT.write_text(json.dumps(d, indent=1))


if __name__ == "__main__":
    main()
