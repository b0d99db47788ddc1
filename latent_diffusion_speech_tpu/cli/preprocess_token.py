"""Stage 19: units -> semantic token ids (`semantic_token/*.npy`).

Reference `19_preprocess_token.py`: k-means predict (or VQ encode) per file,
spawned over workers.  Here the distance argmin is a single jitted matmul, so
a flat loop feeds the TPU faster than process spawning fed GPUs.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from latent_diffusion_speech_tpu.cli._common import config_parser, load
from latent_diffusion_speech_tpu.data.files import traverse_dir
from latent_diffusion_speech_tpu.quantize import kmeans_predict, load_codebook


def tokenize_units(path_root, codebook: np.ndarray):
    root = Path(path_root)
    files = traverse_dir(root / "units", extensions=("npy",))
    for name in files:
        units = np.load(root / "units" / name).astype(np.float32)
        ids = np.asarray(kmeans_predict(units, codebook), np.int32)
        out = root / "semantic_token" / name
        out.parent.mkdir(parents=True, exist_ok=True)
        np.save(out, ids)
        yield name, ids.shape


def main():
    args = config_parser("units -> semantic tokens (stage 19)").parse_args()
    cfg = load(args)
    codebook = load_codebook(cfg.text2semantic.model.codebook_path)
    for path in (cfg.data.train_path, cfg.data.valid_path):
        for name, shape in tokenize_units(path, codebook):
            print(f"token: {name} -> {shape}")


if __name__ == "__main__":
    main()
