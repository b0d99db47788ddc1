"""End-to-end quickstart on synthetic data — no pretrained checkpoints needed.

Builds a miniature dataset (sine tones + hanzi labels), then drives the real
numbered pipeline stages exactly as a user would:

    15 preprocess_text -> 16 preprocess_tts -> 10 preprocess_unit ->
    11 preprocess_mel -> 17 preprocess_cluster -> 19 preprocess_token ->
    20 train_diffusion -> 21 train_lm -> 22 infer_tts

Every model random-initializes when its `pretrain/` blob is absent (the unit
encoder here is `hubert_soft` — whisper-large-v3 pads to 30 s and is slow on
CPU), so the output is NOISE by design: this demonstrates the data contract,
the CLI surfaces, and train/infer mechanics, not audio quality. Substitute
real checkpoints (see docs/MIGRATION.md "Checkpoints & pretrained artifacts")
for a real system.

Run from the repo root (CPU is fine; ~5-10 min):

    JAX_PLATFORMS=cpu PYTHONPATH=. python examples/quickstart_tiny.py [workdir]
"""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))  # self-sufficient: no PYTHONPATH needed
WORK = Path(sys.argv[1]) if len(sys.argv) > 1 else REPO / "examples" / "_quickstart_work"

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
    out_dims: 128            # must match the vocoder latent width
    n_layers: 1
    n_heads: 2
    n_hidden: 32
    block_out_channels: [32, 48]
    timesteps: 50
    k_step_max: 50
  train:
    batch_size: 4
    expdir: {work}/exp/diffusion
    warm_up_steps: 2
    interval_log: 5
    interval_val: 10000
    save_opt: true
text2semantic:
  model:
    semantic_kmeans_num: 16
    codebook_path: {work}/pretrain/semantic_codebook.npz
    encoder: {hidden_size: 32, num_attention_heads: 2, num_hidden_layers: 1,
              intermediate_size: 32, hidden_dropout_prob: 0.0}
    decoder: {hidden_size: 32, num_attention_heads: 2, num_hidden_layers: 1,
              intermediate_size: 32, hidden_dropout_prob: 0.0}
  train:
    batch_size: 4
    expdir: {work}/exp/lm
    warm_up_steps: 2
    interval_log: 5
    interval_val: 10000
    use_units_quantize: true
    units_quantize_type: kmeans
"""

LABELS = ["你好世界", "今天天气好", "我们走吧", "谢谢大家"]


def make_dataset() -> None:
    from latent_diffusion_speech_tpu.ops.audio_io import write_wav

    sr = 44100
    for split, n_files in (("train", 4), ("val", 1)):
        for spk in ("1", "2"):
            adir = WORK / "data" / split / "audio" / spk
            adir.mkdir(parents=True, exist_ok=True)
            for n in range(n_files):
                t = np.arange(int(1.5 * sr)) / sr
                f0 = 180.0 + 40 * int(spk) + 15 * n
                wav = 0.3 * np.sin(2 * np.pi * f0 * t) * (0.6 + 0.4 * np.sin(2 * np.pi * 3 * t))
                write_wav(adir / f"{n}.wav", wav.astype(np.float32), sr)
                (adir / f"{n}.txt").write_text(LABELS[n % len(LABELS)])


def run(stage: str, *extra: str) -> None:
    cmd = [sys.executable, "-m", f"latent_diffusion_speech_tpu.cli.{stage}",
           "-c", str(WORK / "config.yaml"), *extra]
    print(f"\n=== {stage} {' '.join(extra)}")
    env = dict(os.environ, PYTHONPATH=str(REPO), JAX_PLATFORMS="cpu")
    subprocess.run(cmd, check=True, cwd=REPO, env=env)


def main() -> None:
    WORK.mkdir(parents=True, exist_ok=True)
    (WORK / "config.yaml").write_text(CONFIG.replace("{work}", str(WORK)))
    make_dataset()

    run("preprocess_text")
    run("preprocess_tts")
    run("preprocess_unit")
    run("preprocess_mel")
    run("preprocess_cluster")
    run("preprocess_token")
    run("preprocess_val")
    run("train_diffusion", "--max-steps", "10")
    run("train_lm", "--max-steps", "10")

    from latent_diffusion_speech_tpu.train.checkpoint import latest_checkpoint_step

    diff_dir, lm_dir = WORK / "exp" / "diffusion", WORK / "exp" / "lm"
    diff_ckpt = diff_dir / f"model_{latest_checkpoint_step(diff_dir)}.ckpt"
    lm_ckpt = lm_dir / f"model_{latest_checkpoint_step(lm_dir)}.ckpt"
    out = WORK / "quickstart.wav"
    run("infer_tts", "-i", "你好世界", "-o", str(out),
        "--model", str(diff_ckpt), "--lm-model", str(lm_ckpt))

    print("\nDone. Artifacts:")
    print(f"  data tree      {WORK}/data/train/{{audio,units,mel,utt,semantic_token}}/")
    print(f"  codebook       {WORK}/pretrain/semantic_codebook.npz")
    print(f"  checkpoints    {diff_ckpt}\n                 {lm_ckpt}")
    print(f"  synthesized    {out}  (noise — random weights by design)")


if __name__ == "__main__":
    main()
