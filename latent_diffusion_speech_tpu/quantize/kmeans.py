"""TPU-native k-means: fit + predict as batched matmuls.

The reference's `KMeansGPU` (`cluster/kmeans.py:51-206`) is a torch minibatch
k-means with k-means++ init and EMA-learning-rate centroid updates; distance
computation is chunked to fit GPU memory.  On TPU the distance matrix IS one
matmul on the MXU, so the whole fit is a `lax.scan` over minibatches of a
`jit`-compiled assign+update step — no chunking heuristics needed.

Codebook persistence is sklearn-layout-compatible: the reference stores
`{n_features_in_, _n_threads, cluster_centers_, n_clusters}`
(`17_preprocess_train_cluster.py:46-50`); `load_codebook` reads both that
torch format and this framework's npz.
"""

from __future__ import annotations

from functools import partial
from pathlib import Path
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["kmeans_fit", "kmeans_predict", "save_codebook", "load_codebook", "kmeanspp_init"]


def _sq_dist(x: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """Squared euclidean distances (N, K) via the matmul identity."""
    x2 = jnp.sum(x**2, axis=-1, keepdims=True)
    c2 = jnp.sum(c**2, axis=-1)
    xc = jnp.dot(x, c.T, preferred_element_type=jnp.float32)
    return x2 - 2.0 * xc + c2[None, :]


@partial(jax.jit, static_argnames=("k",))
def _kmeanspp_scan(data: jnp.ndarray, k: int, rng: jax.Array) -> jnp.ndarray:
    """k-means++ seeding (ref `_kpp`, cluster/kmeans.py:10-50) as a scan."""
    n = data.shape[0]
    r0, rng = jax.random.split(rng)
    first = data[jax.random.randint(r0, (), 0, n)]
    init_d = jnp.sum((data - first) ** 2, axis=-1)

    def body(carry, key):
        min_d, centroids, i = carry
        probs = min_d / jnp.maximum(jnp.sum(min_d), 1e-12)
        idx = jax.random.choice(key, n, p=probs)
        c = data[idx]
        centroids = centroids.at[i].set(c)
        min_d = jnp.minimum(min_d, jnp.sum((data - c) ** 2, axis=-1))
        return (min_d, centroids, i + 1), None

    centroids = jnp.zeros((k, data.shape[1]), data.dtype).at[0].set(first)
    keys = jax.random.split(rng, k - 1)
    (_, centroids, _), _ = jax.lax.scan(body, (init_d, centroids, 1), keys)
    return centroids


def kmeanspp_init(data: np.ndarray, k: int, seed: int = 0, sample: int = 65536) -> jnp.ndarray:
    """k-means++ init on a subsample (the O(n*k) part shouldn't see all data)."""
    rng = np.random.default_rng(seed)
    if data.shape[0] > sample:
        data = data[rng.choice(data.shape[0], sample, replace=False)]
    return _kmeanspp_scan(jnp.asarray(data, jnp.float32), k, jax.random.PRNGKey(seed))


@jax.jit
def _assign_update(centroids, counts, batch):
    """One minibatch step: nearest assignment + EMA-lr update
    (ref cluster/kmeans.py:177-202: lr = 1/count per centroid)."""
    d = _sq_dist(batch, centroids)
    assign = jnp.argmin(d, axis=-1)  # (B,)
    onehot = jax.nn.one_hot(assign, centroids.shape[0], dtype=jnp.float32)  # (B, K)
    batch_counts = jnp.sum(onehot, axis=0)  # (K,)
    batch_sums = jnp.dot(onehot.T, batch, preferred_element_type=jnp.float32)  # (K, D)
    new_counts = counts + batch_counts
    lr = jnp.where(batch_counts > 0, batch_counts / jnp.maximum(new_counts, 1.0), 0.0)
    batch_means = batch_sums / jnp.maximum(batch_counts[:, None], 1.0)
    centroids = centroids + lr[:, None] * (batch_means - centroids)
    inertia = jnp.sum(jnp.min(d, axis=-1))
    return centroids, new_counts, inertia


def kmeans_fit(
    data: np.ndarray,
    k: int = 4096,
    epochs: int = 4,
    batch_size: int = 8192,
    seed: int = 0,
    init: Optional[np.ndarray] = None,
    verbose: bool = False,
) -> Tuple[np.ndarray, float]:
    """Minibatch EMA k-means. Returns (centroids (k, D) f32, final inertia/point)."""
    data = np.asarray(data, np.float32)
    n, d = data.shape
    if init is None:
        centroids = jnp.asarray(kmeanspp_init(data, k, seed=seed))
    else:
        centroids = jnp.asarray(init, jnp.float32)
    counts = jnp.zeros((k,), jnp.float32)
    rng = np.random.default_rng(seed)
    n_batches = max(1, n // batch_size)
    inertia = 0.0
    for epoch in range(epochs):
        perm = rng.permutation(n)
        total = 0.0
        for b in range(n_batches):
            idx = perm[b * batch_size : (b + 1) * batch_size]
            if len(idx) < batch_size:  # keep shapes static for jit
                idx = np.concatenate([idx, perm[: batch_size - len(idx)]])
            centroids, counts, bi = _assign_update(centroids, counts, jnp.asarray(data[idx]))
            total += float(bi)
        inertia = total / (n_batches * batch_size)
        if verbose:
            print(f"kmeans epoch {epoch}: inertia/point = {inertia:.4f}")
    return np.asarray(centroids), inertia


@jax.jit
def _predict(x, centroids):
    return jnp.argmin(_sq_dist(x, centroids), axis=-1)


def kmeans_predict(x, centroids) -> jnp.ndarray:
    """Nearest-centroid token ids for x (..., D)."""
    x = jnp.asarray(x, jnp.float32)
    shape = x.shape[:-1]
    ids = _predict(x.reshape(-1, x.shape[-1]), jnp.asarray(centroids, jnp.float32))
    return ids.reshape(shape)


def save_codebook(path: str | Path, centroids: np.ndarray) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(path, cluster_centers_=np.asarray(centroids, np.float32))


def load_codebook(path: str | Path) -> np.ndarray:
    """Load centroids from this framework's npz or the reference's torch dict
    (`semantic_codebook.pt`: sklearn-attrs dict, 17_preprocess_train_cluster.py:46-50)."""
    path = Path(path)
    if path.suffix in (".pt", ".pth"):
        import torch

        obj = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(obj, dict) and "cluster_centers_" in obj:
            c = obj["cluster_centers_"]
        elif hasattr(obj, "cluster_centers_"):
            c = obj.cluster_centers_
        else:
            raise ValueError(f"{path}: unrecognized codebook checkpoint layout")
        c = c.detach().cpu().numpy() if hasattr(c, "detach") else np.asarray(c)
        return np.asarray(c, np.float32)
    with np.load(path) as f:
        return np.asarray(f["cluster_centers_"], np.float32)
