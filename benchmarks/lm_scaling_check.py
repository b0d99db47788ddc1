"""Falsify-or-confirm: is the LM trainer's MFU 0.081 shape-imposed?

TRAINER_BENCH.json explains the RoFormer step's MFU by its geometry (hidden
256: every matmul is (B*T,256)x(256,256), softmax/rotary/LN overhead
proportionally large).  If that is right, the SAME trainer code at hidden
1024 / intermediate 4096 must land near the flagship transformer-block MFU
band; if MFU stays ~0.08 the explanation is wrong and the orchestration is
the problem.  Merges the result into TRAINER_BENCH.json.

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/lm_scaling_check.py
"""

from __future__ import annotations

import json
import sys
import time
from dataclasses import replace
from pathlib import Path

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

sys.path.insert(0, str(Path(__file__).parent.parent))
from bench import probe_devices  # noqa: E402

probe_devices(metric="lm_scaling_check")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

OUT = Path(__file__).parent / "TRAINER_BENCH.json"
B, TXT, SEM = 100, 64, 448
N_PRIME, N_CHAIN = 30, 20


def main():
    from latent_diffusion_speech_tpu.config import Config
    from latent_diffusion_speech_tpu.models.lm.roformer import StackConfig
    from latent_diffusion_speech_tpu.train.lm_trainer import LMTrainer
    from latent_diffusion_speech_tpu.utils.flops import device_peak_flops

    from latent_diffusion_speech_tpu.train.lm_trainer import roformer_config_from

    cfg = Config()
    big = dict(hidden_size=1024, num_attention_heads=16, intermediate_size=4096)
    base = roformer_config_from(cfg)
    sys_cfg = replace(
        base,
        encoder=replace(base.encoder, **big),
        decoder=replace(base.decoder, **big),
    )
    tr = LMTrainer(cfg, lm_cfg=sys_cfg, dtype=jnp.bfloat16)

    rng = np.random.default_rng(1)
    K = tr.system.cfg.semantic_kmeans_num
    batch = tr.device_put_batch({
        "phone": rng.integers(1, 100, (B, TXT)).astype(np.int32),
        "tone": rng.integers(0, 8, (B, TXT)).astype(np.int32),
        "semantic": rng.integers(0, K, (B, SEM)).astype(np.int32),
        "labels": rng.integers(0, K, (B, SEM)).astype(np.int32),
    })
    key = jax.random.PRNGKey(0)

    def step(i):
        p, o, loss, g = tr._train_step(
            tr.system.params, tr.opt_state, batch, jax.random.fold_in(key, i))
        tr.system.params, tr.opt_state = p, o
        return loss

    out = step(0)
    np.asarray(out)  # compile + sync
    flops = None
    try:
        ca = tr._train_step.lower(
            tr.system.params, tr.opt_state, batch, key).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca["flops"])
    except Exception:
        pass
    for i in range(1, N_PRIME + 1):
        out = step(i)
    np.asarray(out)
    t0 = time.perf_counter()
    for i in range(N_PRIME, N_PRIME + N_CHAIN):
        out = step(i)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / N_CHAIN

    peak = device_peak_flops(jax.devices()[0])
    row = {
        "config": "hidden 1024 / heads 16 / intermediate 4096, same layers, "
                  "same trainer code, same B/T",
        "batch": B, "text_len": TXT, "semantic_len": SEM,
        "step_s": round(dt, 4),
        "tokens_per_s": round(B * SEM / dt),
        "flops_step": flops,
        "mfu": round(flops / dt / peak, 4) if (peak and flops) else None,
        "loss_finite": bool(np.isfinite(float(np.asarray(out)))),
        "purpose": "scaling check: confirms the hidden-256 row's MFU is "
                   "shape-imposed, not an orchestration loss",
    }
    print("[lm h1024]", json.dumps(row), flush=True)
    d = json.loads(OUT.read_text()) if OUT.exists() else {}
    d["lm_roformer_h1024_scaling_check"] = row
    OUT.write_text(json.dumps(d, indent=1))


if __name__ == "__main__":
    main()
