"""Codebooks: frozen Euclidean lookup + learned cosine EMA VQ.

* `EuclideanCodebook` — frozen nearest-centroid snap used to quantize units
  during diffusion training (ref `quantize/kmeans_codebook.py:6-51`,
  used at `diffusion/solver.py:115-117`).
* `VectorQuantize` — the learned alternative, matching the external
  `vector_quantize_pytorch.VectorQuantize` configuration used by the reference
  (`20_train_diffusion.py:49-56`): input dim -> codebook_dim 32 projection,
  cosine similarity (L2-normalized codes + inputs), EMA decay 0.8,
  commitment weight 1.0.  Implemented as a pure function over an explicit
  `VQState` pytree (TPU-native: state threads through the train step, no
  in-place buffers).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

__all__ = ["EuclideanCodebook", "VectorQuantize", "VQState"]


class EuclideanCodebook:
    """Frozen nearest-centroid quantizer around a (K, D) codebook array."""

    def __init__(self, codebook):
        self.codebook = jnp.asarray(codebook, jnp.float32)

    def quantize(self, x: jnp.ndarray) -> jnp.ndarray:
        """(..., D) -> integer ids (...,). argmax of -||x - e||^2 (ref :15-23)."""
        flat = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
        e = self.codebook
        scores = (
            2.0 * jnp.dot(flat, e.T, preferred_element_type=jnp.float32)
            - jnp.sum(e**2, axis=-1)[None, :]
        )
        return jnp.argmax(scores, axis=-1).reshape(x.shape[:-1])

    def dequantize(self, ids: jnp.ndarray) -> jnp.ndarray:
        return jnp.take(self.codebook, ids, axis=0)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """Snap x to nearest centroids (straight lookup, no gradient path)."""
        return self.dequantize(self.quantize(x))


class VQState(NamedTuple):
    """Learnable/EMA state for cosine VQ."""

    codebook: jnp.ndarray       # (K, d_code), L2-normalized rows
    ema_counts: jnp.ndarray     # (K,)
    proj_in: jnp.ndarray        # (D, d_code)
    proj_out: jnp.ndarray       # (d_code, D)


def _l2norm(x, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)


class VectorQuantize:
    def __init__(
        self,
        dim: int,
        codebook_size: int = 4096,
        codebook_dim: int = 32,
        decay: float = 0.8,
        commitment_weight: float = 1.0,
    ):
        self.dim = dim
        self.codebook_size = codebook_size
        self.codebook_dim = codebook_dim
        self.decay = decay
        self.commitment_weight = commitment_weight

    def init(self, rng: jax.Array) -> VQState:
        k1, k2, k3 = jax.random.split(rng, 3)
        scale_in = 1.0 / jnp.sqrt(self.dim)
        scale_out = 1.0 / jnp.sqrt(self.codebook_dim)
        return VQState(
            codebook=_l2norm(jax.random.normal(k1, (self.codebook_size, self.codebook_dim))),
            ema_counts=jnp.zeros((self.codebook_size,)),
            proj_in=jax.random.uniform(k2, (self.dim, self.codebook_dim), minval=-scale_in, maxval=scale_in),
            proj_out=jax.random.uniform(k3, (self.codebook_dim, self.dim), minval=-scale_out, maxval=scale_out),
        )

    def encode(self, state: VQState, x: jnp.ndarray) -> jnp.ndarray:
        """(..., D) -> ids by cosine similarity in the projected space."""
        z = _l2norm(x.reshape(-1, self.dim) @ state.proj_in)
        sims = jnp.dot(z, state.codebook.T, preferred_element_type=jnp.float32)
        return jnp.argmax(sims, axis=-1).reshape(x.shape[:-1])

    def decode(self, state: VQState, ids: jnp.ndarray) -> jnp.ndarray:
        codes = jnp.take(state.codebook, ids, axis=0)
        return codes @ state.proj_out

    def __call__(
        self, state: VQState, x: jnp.ndarray, train: bool = True
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, VQState]:
        """Quantize with straight-through estimator.

        Returns (quantized (..., D), ids, commit_loss, new_state).
        """
        flat = x.reshape(-1, self.dim)
        z = flat @ state.proj_in
        zn = _l2norm(z)
        sims = jnp.dot(zn, state.codebook.T, preferred_element_type=jnp.float32)
        ids = jnp.argmax(sims, axis=-1)
        codes = jnp.take(state.codebook, ids, axis=0)  # (N, d_code) normalized

        commit = jnp.mean(jnp.sum((zn - jax.lax.stop_gradient(codes)) ** 2, axis=-1))
        # straight-through in the projected space, then project out
        q = z + jax.lax.stop_gradient(codes - z)
        out = (q @ state.proj_out).reshape(x.shape)

        if train:
            onehot = jax.nn.one_hot(ids, self.codebook_size, dtype=jnp.float32)
            counts = jnp.sum(onehot, axis=0)
            sums = jnp.dot(onehot.T, jax.lax.stop_gradient(zn), preferred_element_type=jnp.float32)
            new_counts = state.ema_counts * self.decay + counts * (1 - self.decay)
            means = sums / jnp.maximum(counts[:, None], 1.0)
            updated = jnp.where(
                (counts > 0)[:, None],
                _l2norm(state.codebook * self.decay + means * (1 - self.decay)),
                state.codebook,
            )
            state = state._replace(codebook=updated, ema_counts=new_counts)

        return out, ids.reshape(x.shape[:-1]), self.commitment_weight * commit, state

    def utilization(self, state: VQState, thresh: float = 1e-3) -> jnp.ndarray:
        """Fraction of codebook entries with recent usage (logged by the
        reference trainer, diffusion/solver.py:83)."""
        return jnp.mean((state.ema_counts > thresh).astype(jnp.float32))
