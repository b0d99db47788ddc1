"""Stage 17: fit the k-means semantic codebook over unit files.

Reference `17_preprocess_train_cluster.py`: <=30k unit files, 4096 clusters,
sklearn or KMeansGPU.  Here: the TPU minibatch-EMA k-means (one matmul per
assignment step on the MXU).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from latent_diffusion_speech_tpu.cli._common import config_parser, load
from latent_diffusion_speech_tpu.data.files import traverse_dir
from latent_diffusion_speech_tpu.quantize import kmeans_fit, save_codebook


def fit_codebook(path_root, k=4096, max_files=30000, epochs=4, batch_size=8192, seed=0, verbose=True):
    root = Path(path_root)
    files = traverse_dir(root / "units", extensions=("npy",))[:max_files]
    if not files:
        raise SystemExit(f"[x] no unit files under {root / 'units'}")
    data = np.concatenate([np.load(root / "units" / f) for f in files]).astype(np.float32)
    if verbose:
        print(f"kmeans: {data.shape[0]} frames x {data.shape[1]} dims from {len(files)} files")
    centroids, inertia = kmeans_fit(data, k=k, epochs=epochs, batch_size=batch_size, seed=seed, verbose=verbose)
    return centroids, inertia


def main():
    p = config_parser("fit k-means semantic codebook (stage 17)")
    p.add_argument("--out", type=str, default=None)
    p.add_argument("--epochs", type=int, default=4)
    args = p.parse_args()
    cfg = load(args)
    centroids, inertia = fit_codebook(
        cfg.data.train_path, k=cfg.text2semantic.model.semantic_kmeans_num, epochs=args.epochs
    )
    out = args.out or cfg.text2semantic.model.codebook_path
    save_codebook(out, centroids)
    print(f"saved {centroids.shape} codebook to {out} (inertia/point {inertia:.4f})")


if __name__ == "__main__":
    main()
