"""Sustained-training benchmark: the full host->chip data path under load.

Every prior train number timed a synthetic, device-resident batch — a device
ceiling.  This bench measures what the reference actually runs all day
(`/root/reference/diffusion/data_loaders.py:13-217` npy loads + random crops
feeding `solver.train`): a disk-resident dataset at flagship geometry read by
the real `data/diffusion_dataset.py` fast path (C++ batched cropped reads,
`data/native/npy_batch.cc`) through the prefetching `data/loader.py`,
`device_put` overlapped with compute, DISTINCT batches every step, periodic
validation + checkpoint saves included — for >= 60 s per batch size.

Stages are also measured in isolation so a miss decomposes:
  * host-only loader rate (no device in the loop),
  * host->device transfer bandwidth at batch shapes,
  * the synthetic device-resident step rate (the round-3 ceiling).

Writes benchmarks/TRAIN_SUSTAINED.json.

Usage:
  python benchmarks/train_sustained.py --synth       # build the dataset (CPU)
  python benchmarks/train_sustained.py --host-only   # loader-only rates (CPU)
  python benchmarks/train_sustained.py               # the full TPU run
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path("/tmp/sustained_data")
OUT = Path(__file__).parent / "TRAIN_SUSTAINED.json"

SR = 44100
HOP = 512                  # mel 86.13 frames/s (reference hop)
UNITS_FPS_RATIO = 50.0 / (SR / HOP)   # whisper units at 50 fps
MEL_DIM = 128              # latent channels; npy stores concat([m, logs]) (T, 256)
UNITS_DIM = 1280           # whisper large-v3 encoder width
N_TRAIN = 1024
N_VAL = 16
DUR_RANGE = (3.0, 10.0)    # seconds per clip


def synth(root: Path = ROOT, n_train: int = N_TRAIN, n_val: int = N_VAL,
          seed: int = 0) -> None:
    """Disk-resident synthetic dataset in the reference npy layout:
    audio/<spk>/<name>.wav (keys), mel/... (T, 2*MEL_DIM), units/(Tu, UNITS_DIM).

    Content is random views into one shared entropy pool (content realism is
    irrelevant to the IO path; generating GBs of fresh normals on one core is
    not)."""
    rng = np.random.default_rng(seed)
    pool = rng.standard_normal(1 << 22).astype(np.float32)  # 16 MiB pool

    def take(shape, off):
        n = int(np.prod(shape))
        idx = (off + np.arange(n)) % pool.size
        return pool[idx].reshape(shape)

    for split, n in (("train", n_train), ("val", n_val)):
        base = root / split
        if (base / ".done").exists():
            print(f"[synth] {split} exists, skipping", flush=True)
            continue
        for d in ("audio/1", "mel/1", "units/1"):
            (base / d).mkdir(parents=True, exist_ok=True)
        g = np.random.default_rng([seed, hash(split) & 0xFFFF])
        for i in range(n):
            dur = g.uniform(*DUR_RANGE)
            t_mel = int(dur * SR / HOP)
            t_units = max(int(t_mel * UNITS_FPS_RATIO), 2)
            name = f"clip_{i:05d}"
            (base / "audio/1" / f"{name}.wav").write_bytes(b"RIFF")
            stats = take((t_mel, 2 * MEL_DIM), int(g.integers(0, pool.size)))
            stats[:, MEL_DIM:] = -4.0 + 0.1 * stats[:, MEL_DIM:]  # logs ~ -4
            np.save(base / "mel/1" / f"{name}.wav.npy", stats)
            np.save(base / "units/1" / f"{name}.wav.npy",
                    take((t_units, UNITS_DIM), int(g.integers(0, pool.size))))
            if (i + 1) % 200 == 0:
                print(f"[synth] {split} {i + 1}/{n}", flush=True)
        (base / ".done").touch()
    print("[synth] done", flush=True)


def make_loader(batch_size: int, device_put=None, split: str = "train",
                prefetch: int = 3, device_collate: bool = False,
                transfer_dtype=None, num_workers: int = 0):
    from latent_diffusion_speech_tpu.data import DataLoader, DiffusionDataset

    ds = DiffusionDataset(ROOT / split, waveform_sec=1.0, hop_size=HOP,
                          sample_rate=SR, n_spk=1, seed=1,
                          device_collate=device_collate,
                          transfer_dtype=transfer_dtype)
    return DataLoader(ds, batch_size=batch_size, shuffle=True, drop_last=True,
                      prefetch=prefetch, num_threads=2, device_put=device_put,
                      num_workers=num_workers)


def host_only(batch_sizes=(64, 256), min_s: float = 20.0,
              device_collate: bool = False, transfer_dtype=None,
              num_workers: int = 0) -> dict:
    """Loader-only rate: how fast one host core can assemble distinct batches
    (C++ cropped reads + latent sampling + alignment), no device involved."""
    out = {}
    for B in batch_sizes:
        loader = make_loader(B, device_collate=device_collate,
                             transfer_dtype=transfer_dtype,
                             num_workers=num_workers)
        it = iter(loader)
        first = next(it)  # probe + first batch outside the window
        bpb = int(sum(a.nbytes for a in first.values()
                      if hasattr(a, "nbytes")))
        n, t0 = 0, time.perf_counter()
        epoch = 0
        while time.perf_counter() - t0 < min_s:
            try:
                next(it)
            except StopIteration:
                epoch += 1
                loader.set_epoch(epoch)
                it = iter(loader)
                next(it)
                n += 1
            n += 1
        dt = time.perf_counter() - t0
        out[f"B{B}"] = {
            "batches_per_s": round(n / dt, 2),
            "samples_per_s": round(n * B / dt, 1),
            "bytes_per_batch": bpb,
        }
        print(f"[host-only] B={B}: {out[f'B{B}']}", flush=True)
        loader.close()
    return out


def transfer_bw(trainer, batch_sizes=(64, 256)) -> dict:
    """host->device bandwidth at the exact batch shapes (fetch-synced)."""
    import jax

    out = {}
    rng = np.random.default_rng(5)
    fetch = jax.jit(lambda t: t["mel"].reshape(-1)[0])
    for B in batch_sizes:
        batch = {
            "units": rng.standard_normal((B, 88, UNITS_DIM)).astype(np.float32),
            "mel": rng.standard_normal((B, 88, MEL_DIM)).astype(np.float32),
            "spk_id": np.ones((B, 1), np.int32),
            "aug_shift": np.zeros((B, 1), np.float32),
        }
        nbytes = sum(a.nbytes for a in batch.values())
        d = trainer.device_put_batch(batch)
        np.asarray(fetch(d))  # warm
        ts = []
        for i in range(3):
            batch["mel"][0, 0, 0] = i  # defeat relay memoization
            t0 = time.perf_counter()
            d = trainer.device_put_batch(batch)
            np.asarray(fetch(d))
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        out[f"B{B}"] = {"bytes": nbytes, "best_s": round(best, 4),
                        "MBps": round(nbytes / best / 1e6, 1)}
        print(f"[transfer] B={B}: {out[f'B{B}']}", flush=True)
    return out


class _Recorder:
    """Minimal logger duck-type: records (step, wall, metrics)."""

    def __init__(self):
        self.rows = []

    def log(self, step, metrics):
        self.rows.append((step, time.perf_counter(), dict(metrics)))

    def log_spec_comparison(self, *a, **k):
        pass

    def log_audio(self, *a, **k):
        pass


def sustained(trainer, B: int, min_s: float, interval_val: int,
              synthetic_ceiling: float | None, device_collate: bool = False,
              transfer_dtype=None) -> dict:
    """The real thing: distinct disk batches -> prefetch thread -> device_put
    -> train_step, with val + checkpoint saves at interval_val, measured over
    a >= min_s steady window (compile/prime excluded)."""
    import jax

    tcfg = trainer.cfg.diffusion.train
    tcfg.batch_size = B
    tcfg.interval_log = 10
    tcfg.interval_val = interval_val

    loader = make_loader(B, device_put=trainer.device_put_batch,
                         device_collate=device_collate,
                         transfer_dtype=transfer_dtype)
    val_loader = make_loader(8, split="val")
    rec = _Recorder()

    # Pre-warm every program the loop will hit, OUTSIDE the measured/deadline
    # window: the train step, the _step_mfu cost-analysis lowering (a full
    # remote compile — minutes through the relay on this host), and the
    # validation + checkpoint-save path.  In production these compiles
    # amortize over days; in a 60 s window they would *be* the measurement.
    probe = next(iter(loader))
    rng0 = jax.random.PRNGKey(0)
    trainer.train_step(probe, rng0)
    trainer._step_mfu(probe, rng0, 1.0)
    trainer.validate_full(val_loader, rng0, logger=None)
    trainer.save()

    # warm: compile + relay priming happens inside train() on the first steps;
    # the measured window starts at the first logged step >= warm_steps
    warm_steps = 40
    # the deadline clock starts AFTER the first step returns — remote
    # compilation of a fresh step program (minutes through the relay's
    # remote-compile path) must not eat the measurement window
    deadline = None

    class _Stop:  # GracefulShutdown duck-type with a wall-clock bound
        requested = False

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    stop = _Stop()
    orig_step = trainer.train_step
    state = {"n": 0}

    def counting_step(batch, rng):
        nonlocal deadline
        state["n"] += 1
        if deadline is not None and time.perf_counter() > deadline:
            stop.requested = True
        # primary exit: the steady window is long enough (compile/priming and
        # the first val's own remote compile simply shift the window start)
        trs = [r for r in rec.rows if "train/samples_per_sec" in r[2]]
        if len(trs) >= 2:
            first_step = trs[0][0] - tcfg.interval_log
            win = [r for r in trs if r[0] - first_step >= warm_steps]
            if len(win) >= 2 and win[-1][1] - win[0][1] >= min_s:
                stop.requested = True
        out = orig_step(batch, rng)
        if deadline is None:  # first step done: compile is behind us
            deadline = time.perf_counter() + max(6 * min_s, 1200.0)
        return out

    trainer.train_step = counting_step
    try:
        trainer.train(loader, val_loader=val_loader, logger=rec, shutdown=stop,
                      max_steps=trainer.step + 100_000)
    finally:
        trainer.train_step = orig_step
        loader.close()
        val_loader.close()

    # steady window: logged TRAIN rows past warm_steps (validate_full logs
    # val/* rows through the same recorder — excluded)
    train_rows = [r for r in rec.rows if "train/samples_per_sec" in r[2]]
    first_step = train_rows[0][0] - tcfg.interval_log if train_rows else 0
    rows = [r for r in train_rows if r[0] - first_step >= warm_steps]
    if len(rows) < 2:
        return {"error": "window too short", "rows": len(rec.rows)}
    (s0, t0, _), (s1, t1, _) = rows[0], rows[-1]
    samples_per_s = (s1 - s0) * B / (t1 - t0)
    rates = [m["train/samples_per_sec"] for _, _, m in rows[1:]]
    res = {
        "batch_size": B,
        "steps_measured": s1 - s0,
        "window_s": round(t1 - t0, 1),
        "sustained_samples_per_s": round(samples_per_s, 1),
        "interval_rates_min_max": [round(min(rates), 1), round(max(rates), 1)]
        if rates else None,
        # actual saves: validate_full logs val rows through this recorder at
        # each interval_val save point
        "val_ckpt_saves_in_window": sum(
            1 for s, _, m in rec.rows if "val/loss" in m and s0 <= s <= s1
        ),
        "synthetic_ceiling_samples_per_s": synthetic_ceiling,
        "fraction_of_ceiling": round(samples_per_s / synthetic_ceiling, 3)
        if synthetic_ceiling else None,
    }
    print(f"[sustained] B={B}: {res}", flush=True)
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--synth", action="store_true")
    ap.add_argument("--host-only", action="store_true")
    ap.add_argument("--host-workers", action="store_true",
                    help="worker-count scaling table (CPU only)")
    ap.add_argument("--min-s", type=float, default=60.0)
    ap.add_argument("--only",
                    help="comma list of rows to run (b64_host,b64_dc,b256_dc), "
                         "merging into the existing TRAIN_SUSTAINED.json")
    args = ap.parse_args()
    if args.only:
        args.only = args.only.split(",")

    if args.synth:
        synth()
        return
    if args.host_only:
        import jax

        jax.config.update("jax_platforms", "cpu")
        res = {
            "host_collate": host_only(),
            "device_collate_f32": host_only(device_collate=True),
            "device_collate_bf16": host_only(device_collate=True,
                                             transfer_dtype="bfloat16"),
        }
        print(json.dumps(res))
        return
    if args.host_workers:
        # VERDICT r4 item 3: worker-count scaling of the host stage.  The
        # process pool parallelizes the Python collate across cores; on an
        # N-core host the table should scale ~linearly up to N (this
        # container exposes os.cpu_count() cores — recorded so flat scaling
        # on a 1-core host reads as the core bound it is, not a pool bug).
        import os

        import jax

        jax.config.update("jax_platforms", "cpu")
        scaling = {}
        for w in (0, 1, 2, 4):
            rows = host_only(batch_sizes=(64,), min_s=args.min_s,
                             device_collate=True, transfer_dtype="bfloat16",
                             num_workers=w)
            scaling[f"workers{w}"] = rows["B64"]
            print(f"[host-workers] w={w}: {rows['B64']}", flush=True)
        doc = json.loads(OUT.read_text()) if OUT.exists() else {}
        doc["host_worker_scaling"] = {
            "host_cpu_cores": os.cpu_count(),
            "mode": "device_collate bf16, B=64, distinct batches",
            "note": "workers0 = in-process path (C++ reader releases the GIL); "
                    "workersN = N spawn processes assembling whole batches "
                    "(loader.py). Scaling ceiling is the host core count: on "
                    "a 1-core host workers only add ~14 MB/batch of pickle "
                    "IPC and cannot parallelize, so workers0 wins — the "
                    "process mode pays off only where the PYTHON collate "
                    "binds on a multi-core host (the reference's "
                    "num_workers=8..32 regime, data_loaders.py:30-37).",
            "rates": scaling,
        }
        OUT.write_text(json.dumps(doc, indent=1))
        print(json.dumps(doc["host_worker_scaling"]))
        return

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    # fail fast (with a parseable error line) instead of hanging forever if
    # the TPU relay is wedged — the relay PJRT plugin blocks indefinitely
    # inside client construction when the remote end is unreachable
    sys.path.insert(0, str(Path(__file__).parent.parent))
    from bench import probe_devices

    probe_devices(metric="train_sustained")
    import jax.numpy as jnp

    from latent_diffusion_speech_tpu.config import Config
    from latent_diffusion_speech_tpu.train.diffusion_trainer import DiffusionTrainer

    if not (ROOT / "train" / ".done").exists():
        synth()

    results = {"bench": "sustained training: disk npy -> C++ reader -> "
                        "prefetch -> device_put -> train_step, distinct "
                        "batches, val+ckpt included",
               "dataset": {"n_train": N_TRAIN, "n_val": N_VAL,
                           "mel_dim": MEL_DIM, "units_dim": UNITS_DIM,
                           "dur_s": list(DUR_RANGE)}}

    import tempfile

    cfg = Config()
    cfg.diffusion.train.expdir = tempfile.mkdtemp(prefix="sustained_exp_")
    cfg.diffusion.train.save_opt = False
    trainer = DiffusionTrainer(cfg, dtype=jnp.bfloat16)

    if args.only and OUT.exists():
        results = json.loads(OUT.read_text())

    # round-3 synthetic-batch ceilings (BENCH_r03.json)
    if not args.only:
        results["transfer"] = transfer_bw(trainer)
    if not args.only or "b64_host" in args.only:
        results["b64_host_collate"] = sustained(
            trainer, 64, args.min_s, interval_val=30, synthetic_ceiling=2988.0)
    if not args.only or "b64_dc" in args.only:
        results["b64_device_collate_bf16"] = sustained(
            trainer, 64, args.min_s, interval_val=60, synthetic_ceiling=2988.0,
            device_collate=True, transfer_dtype="bfloat16")
    if not args.only or "b256_dc" in args.only:
        results["b256_device_collate_bf16"] = sustained(
            trainer, 256, args.min_s, interval_val=15, synthetic_ceiling=3296.0,
            device_collate=True, transfer_dtype="bfloat16")
    results["device"] = str(jax.devices()[0])
    OUT.write_text(json.dumps(results, indent=1))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
