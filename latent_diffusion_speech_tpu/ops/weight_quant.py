"""Symmetric per-output-channel int8 weight quantization for serve.

Motivation: the B=1 UNet denoiser step re-streams ~187 MB of bf16 weights
from HBM on every one of the sampler's 20 steps (ops/pallas/unet1d_stream.py).
Storing the big matmul kernels as int8 (+ one bf16 scale per output channel)
halves that traffic; the dequant (convert + scale-multiply) fuses into the
consuming matmul on TPU, so no bf16 copy of the weights is ever
materialized — provided the dequant happens INSIDE the sampler scan body
behind an optimization barrier (otherwise XLA hoists it out as
loop-invariant and serves bf16 anyway).

MEASURED OUTCOME (round 5, benchmarks/INT8_SERVE_AB.json): int8 is 3.5%
SLOWER than bf16 at the flagship B=1/T=430 serve shape (16.4 vs 15.8 ms per
20-step chain) — that step sits at the XLA per-op overhead floor (~100 ops
x ~8-22 us), not the HBM bound, so halving weight bytes buys nothing and
the in-scan dequant adds ops.  Fidelity is fine (MCD 0.347 dB on-chip vs
the 0.5 budget, FIDELITY.json int8_shipping), so the feature stays
available for bandwidth-bound geometries (bigger UNets / longer T), but
bf16 remains the serve default.

Quality is a measured contract, not an assumption: `tests/test_weight_quant.py`
bounds the end-to-end sampler deviation, and `benchmarks/fidelity_bench.py`
carries the MCD target (0.5 dB budget vs the reference — int8's whole-chain
MCD must stay far inside it).

Usage: serve-only, opt-in (`Unit2MelSystem(weight_quant="int8")`); training
always sees full-precision params.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

__all__ = ["QuantizedLeaf", "quantize_tree_int8", "dequantize_tree"]


@jax.tree_util.register_pytree_node_class
class QuantizedLeaf:
    """int8 tensor + per-output-channel (last axis) bf16 scale."""

    def __init__(self, q: jnp.ndarray, scale: jnp.ndarray):
        self.q = q
        self.scale = scale

    def tree_flatten(self):
        return (self.q, self.scale), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def __repr__(self):
        return f"QuantizedLeaf(q={self.q.shape}, scale={self.scale.shape})"


def _is_quantizable(x, min_size: int) -> bool:
    return (
        hasattr(x, "ndim")
        and x.ndim >= 2
        and x.size >= min_size
        and jnp.issubdtype(x.dtype, jnp.floating)
    )


def quantize_tree_int8(params: Any, min_size: int = 4096) -> Any:
    """Replace every float kernel with ndim>=2 and size>=min_size by a
    QuantizedLeaf (symmetric, per-last-axis scale).  Small leaves (norm
    scales, biases) pass through untouched.  Pure jnp ops — safe inside jit
    (it runs once per serve call via `prepare_sample_params`)."""

    def quant(x):
        if not _is_quantizable(x, min_size):
            return x
        xf = jnp.asarray(x, jnp.float32)
        axes = tuple(range(x.ndim - 1))
        amax = jnp.max(jnp.abs(xf), axis=axes, keepdims=True)
        scale = jnp.maximum(amax, 1e-8) / 127.0
        q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
        return QuantizedLeaf(q, scale.astype(jnp.bfloat16))

    return jax.tree_util.tree_map(quant, params)


def dequantize_tree(qparams: Any, dtype=jnp.bfloat16, barrier: bool = True) -> Any:
    """Inverse of `quantize_tree_int8`, preserving non-quantized leaves.

    barrier=True wraps each int8 tensor in `jax.lax.optimization_barrier`;
    REQUIRED when dequantizing inside a sampler scan body — without it XLA
    hoists the (loop-invariant) dequant out of the loop and materializes the
    full-precision weights, defeating the bandwidth saving."""

    def dequant(x):
        if not isinstance(x, QuantizedLeaf):
            return x
        q = jax.lax.optimization_barrier(x.q) if barrier else x.q
        return q.astype(dtype) * x.scale.astype(dtype)

    return jax.tree_util.tree_map(
        dequant, qparams, is_leaf=lambda x: isinstance(x, QuantizedLeaf)
    )
