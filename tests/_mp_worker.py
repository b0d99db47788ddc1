"""Subprocess worker for the multi-process (multi-host) distributed test.

Launched by tests/test_multiprocess.py with two processes x two virtual CPU
devices each: a real `jax.distributed` cluster (gloo collectives) running the
tiny-geometry DiffusionTrainer DP step over a 4-device global mesh.  Each
process holds only its local half of the global batch — the exact multi-host
shape of a pod run (per-host loader shards + `global_shard_batch` stitching).

Two modes:
  dp (default): 4-device dp4 mesh, 'data' axis crossing the process boundary
    — each process holds only its local half of the global batch.
  tp: 4-device dp2 x tp2 mesh with the 'model' axis crossing the process
    boundary (cross-host tensor parallelism) — params are sharded across
    hosts (non-addressable leaves), each host loads the SAME full batch
    (global_shard_batch's covers-all-data path), the LM train step's
    Megatron collectives ride the inter-process transport, and checkpoint
    save allgathers the cross-host shards before the rank-0 write.

argv: <process_id> <num_processes> <coordinator_port> <outdir> [mode]
"""

from __future__ import annotations

import json
import os
import sys


def main() -> None:
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    port, outdir = sys.argv[3], sys.argv[4]
    mode = sys.argv[5] if len(sys.argv) > 5 else "dp"

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

    if mode in ("tp", "tp_resume"):
        _run_tp(pid, nproc, outdir, resume=mode == "tp_resume")
        return

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


def _run_tp(pid: int, nproc: int, outdir: str, resume: bool = False) -> None:
    """Cross-host tensor parallelism: 'model' axis spans the 2 processes.

    resume=False: 2 train steps, SHARDED checkpoint save (params span
    processes, so trainer.save() takes the per-process-shard path), then a
    3rd continuous step whose loss is the parity target.
    resume=True (a fresh cluster = the restart): trainer.resume() from the
    sharded checkpoint, then the same 3rd step — its loss must equal the
    continuous run's (VERDICT r3 item 3: save->restart->resume parity with
    the 'model' axis spanning hosts)."""
    import jax
    import numpy as np

    from latent_diffusion_speech_tpu.config import Config, ParallelConfig
    from latent_diffusion_speech_tpu.parallel.dist import (
        is_main_process,
        sync_global_devices,
    )
    from latent_diffusion_speech_tpu.parallel.mesh import build_mesh
    from latent_diffusion_speech_tpu.parallel.multihost import mesh_spans_processes
    from latent_diffusion_speech_tpu.train.lm_trainer import LMTrainer

    cfg = Config()
    m = cfg.text2semantic.model
    m.type = "llama"
    m.semantic_kmeans_num = 16
    d = m.decoder
    d.hidden_size, d.num_attention_heads = 32, 2
    d.num_hidden_layers, d.intermediate_size = 2, 48
    cfg.text2semantic.train.gradient_accumulation_steps = 1
    cfg.text2semantic.train.expdir = os.path.join(outdir, "exp_tp")
    cfg.parallel = ParallelConfig(data=2, model=2)

    # jax.devices() orders by process then local id: [p0d0, p0d1, p1d0, p1d1].
    # build_mesh reshapes (data, seq, model, pipe, expert) in order, so the
    # interleaving [p0d0, p1d0, p0d1, p1d1] puts PROCESSES along the 'model'
    # axis and local devices along 'data' — the cross-host-TP layout (on real
    # pods one would keep TP on ICI; this exercises the DCN-spanning case).
    devs = jax.devices()
    assert len(devs) == 4, devs
    mesh = build_mesh(cfg.parallel, devices=[devs[0], devs[2], devs[1], devs[3]])
    assert mesh_spans_processes(mesh)
    model_col = mesh.devices[0, 0, :, 0, 0]
    assert {d.process_index for d in model_col} == {0, 1}, (
        "expected the 'model' axis to span both processes"
    )

    trainer = LMTrainer(cfg, mesh=mesh)
    # proof of cross-host param sharding: at least one leaf is model-sharded
    # and therefore not fully addressable from this process
    sharded = [
        p for p in jax.tree_util.tree_leaves(trainer.system.params)
        if isinstance(p, jax.Array) and not p.is_fully_addressable
        and not p.is_fully_replicated
    ]
    assert sharded, "no param leaf spans processes"

    # cross-host TP: every host loads the SAME full global batch
    rng = np.random.default_rng(0)
    B, L = 4, 16
    ids = rng.integers(0, trainer.lm_cfg.vocab_size, (B, L)).astype(np.int32)
    batch = {"input_ids": ids, "labels": ids.copy(),
             "attention_mask": np.ones_like(ids)}

    def one_step():
        device_batch = trainer.device_put_batch(dict(batch))
        metrics = trainer.train_step(device_batch)
        return float(np.asarray(metrics["loss"].addressable_data(0)))

    if resume:
        # the restart: a fresh cluster restores the cross-host-sharded
        # checkpoint (each leaf placed back under the trainer's sharding)
        # and replays step 3
        assert trainer.resume(), "resume() found no checkpoint"
        assert trainer.step == 2, trainer.step
        sharded = [
            p for p in jax.tree_util.tree_leaves(trainer.system.params)
            if isinstance(p, jax.Array) and not p.is_fully_addressable
            and not p.is_fully_replicated
        ]
        assert sharded, "restored params lost their cross-host sharding"
        loss3 = one_step()
        with open(os.path.join(outdir, f"loss_tp_resume_{pid}.json"), "w") as f:
            json.dump({"loss3": loss3}, f)
        return

    losses = [one_step() for _ in range(2)]

    # params span processes -> save() writes the SHARDED format
    # (shard_p<k>.npz per process + rank-0 index.json, barriers inside)
    trainer.save()
    sync_global_devices("after-tp-save")

    # continuous step 3: the parity target for the resumed run
    losses.append(one_step())

    with open(os.path.join(outdir, f"loss_tp_{pid}.json"), "w") as f:
        json.dump({"losses": losses}, f)


if __name__ == "__main__":
    main()
