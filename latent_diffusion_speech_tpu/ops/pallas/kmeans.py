"""Fused k-means distance + argmin Pallas kernel.

The semantic-token quantization hot loop (reference `KMeansGPU.max_sim`,
`cluster/kmeans.py:117-131`, chunked torch matmuls): for each input frame find
the nearest of K codebook rows.  The Pallas kernel streams codebook blocks
through VMEM and keeps a running (min_dist, argmin) per frame — one pass over
the codebook, distances never materialized in HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["kmeans_argmin"]


def _argmin_kernel(x_ref, cb_ref, cb_sq_ref, out_ref, best_d, best_i, *, block_k: int, k_total: int):
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _init():
        best_d[:] = jnp.full_like(best_d, jnp.inf)
        best_i[:] = jnp.zeros_like(best_i)

    x = x_ref[0].astype(jnp.float32)          # (block_n, D)
    cb = cb_ref[:].astype(jnp.float32)        # (block_k, D)
    cb_sq = cb_sq_ref[:]                      # (1, block_k)

    # dist = ||c||^2 - 2 x.c   (the ||x||^2 term is argmin-invariant)
    xc = jax.lax.dot_general(x, cb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    d = cb_sq - 2.0 * xc                      # (block_n, block_k)

    col = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    d = jnp.where(col < k_total, d, jnp.inf)

    d_min = jnp.min(d, axis=-1, keepdims=True)
    i_min = jnp.argmin(d, axis=-1)[:, None].astype(jnp.int32) + ki * block_k

    better = d_min < best_d[:]
    best_i[:] = jnp.where(better, i_min, best_i[:])
    best_d[:] = jnp.minimum(best_d[:], d_min)

    @pl.when(ki == pl.num_programs(1) - 1)
    def _finish():
        out_ref[pl.program_id(0), :] = best_i[:][:, 0]


@functools.partial(jax.jit, static_argnames=("block_n", "block_k"))
def kmeans_argmin(
    x: jnp.ndarray, codebook: jnp.ndarray, block_n: int = 256, block_k: int = 512
) -> jnp.ndarray:
    """x (N, D), codebook (K, D) -> nearest codebook ids (N,) int32."""
    N, D = x.shape
    K = codebook.shape[0]

    pad_n = (-N) % block_n
    pad_k = (-K) % block_k
    xb = jnp.pad(x, ((0, pad_n), (0, 0)))
    cbb = jnp.pad(codebook, ((0, pad_k), (0, 0)))
    cb_sq = jnp.sum(cbb.astype(jnp.float32) ** 2, axis=-1)[None, :]  # (1, K_p)

    n_blocks = (N + pad_n) // block_n
    k_blocks = (K + pad_k) // block_k
    xb = xb.reshape(n_blocks, block_n, D)

    out = pl.pallas_call(
        functools.partial(_argmin_kernel, block_k=block_k, k_total=K),
        grid=(n_blocks, k_blocks),
        in_specs=[
            pl.BlockSpec((1, block_n, D), lambda ni, ki: (ni, 0, 0)),
            pl.BlockSpec((block_k, D), lambda ni, ki: (ki, 0)),
            pl.BlockSpec((1, block_k), lambda ni, ki: (0, ki)),
        ],
        # whole output resident (rows written per grid cell): satisfies the
        # Mosaic (sublane, lane) block constraints for int32 outputs
        out_specs=pl.BlockSpec((n_blocks, block_n), lambda ni, ki: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_blocks, block_n), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((block_n, 1), jnp.float32),
            pltpu.VMEM((block_n, 1), jnp.int32),
        ],
    )(xb, cbb, cb_sq)
    return out.reshape(-1)[:N]
