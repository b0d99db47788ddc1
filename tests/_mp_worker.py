"""Subprocess worker for the multi-process (multi-host) distributed test.

Launched by tests/test_multiprocess.py with two processes x two virtual CPU
devices each: a real `jax.distributed` cluster (gloo collectives) running the
tiny-geometry DiffusionTrainer DP step over a 4-device global mesh.  Each
process holds only its local half of the global batch — the exact multi-host
shape of a pod run (per-host loader shards + `global_shard_batch` stitching).

argv: <process_id> <num_processes> <coordinator_port> <outdir>
"""

from __future__ import annotations

import json
import os
import sys


def main() -> None:
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    port, outdir = sys.argv[3], sys.argv[4]

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=2"

    from latent_diffusion_speech_tpu.parallel.dist import (
        initialize_distributed,
        is_main_process,
        process_count,
        sync_global_devices,
    )

    initialize_distributed(
        coordinator_address=f"localhost:{port}", num_processes=nproc, process_id=pid
    )

    import jax
    import numpy as np

    assert process_count() == nproc, (process_count(), nproc)
    n_global = jax.device_count()
    n_local = jax.local_device_count()
    assert n_global == nproc * n_local, (n_global, nproc, n_local)

    from latent_diffusion_speech_tpu.config import Config, ParallelConfig
    from latent_diffusion_speech_tpu.models.diffusion import Unit2MelConfig
    from latent_diffusion_speech_tpu.parallel.mesh import build_mesh
    from latent_diffusion_speech_tpu.parallel.multihost import mesh_spans_processes
    from latent_diffusion_speech_tpu.train import DiffusionTrainer

    cfg = Config()
    cfg.parallel = ParallelConfig(data=n_global)
    cfg.diffusion.train.expdir = os.path.join(outdir, "exp")
    mesh = build_mesh(cfg.parallel)
    assert mesh_spans_processes(mesh)

    tiny = Unit2MelConfig(
        input_channel=16, n_spk=4, out_dims=8, n_hidden=16,
        block_out_channels=(16, 16), n_heads=2, timesteps=20, k_step=20,
    )
    trainer = DiffusionTrainer(cfg, model_cfg=tiny, mesh=mesh)

    # Global batch is defined once from a fixed seed; this process takes the
    # *block* of rows owned by its devices (mesh device order = process order).
    rng = np.random.default_rng(0)
    B_global, T = 2 * n_global, 32
    full = {
        "units": rng.standard_normal((B_global, T, 16)).astype(np.float32),
        "mel": rng.standard_normal((B_global, T, 8)).astype(np.float32),
        "spk_id": np.ones((B_global, 1), np.int32),
        "aug_shift": np.zeros((B_global, 1), np.float32),
    }
    rows = B_global // nproc
    local = {k: v[pid * rows : (pid + 1) * rows] for k, v in full.items()}

    losses = []
    for step in range(2):
        batch = trainer.device_put_batch(local)
        metrics = trainer.train_step(batch, jax.random.PRNGKey(step))
        loss = metrics["loss"]
        # scalar loss is fully replicated; fetch via an addressable shard
        losses.append(float(np.asarray(loss.addressable_data(0))))

    # rank-gated checkpoint save (reference: rank-0-only Saver, solver.py:88-91)
    if is_main_process():
        trainer.save()
    sync_global_devices("after-save")

    with open(os.path.join(outdir, f"loss_{pid}.json"), "w") as f:
        json.dump({"losses": losses, "n_local": n_local}, f)


if __name__ == "__main__":
    main()
