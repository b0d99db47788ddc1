"""Device-mesh construction and sharding helpers.

The reference's only parallelism is DDP data-parallel via HF accelerate
(`20_train_diffusion.py:22`, `tools/saver.py:97-98`).  Here a single
`jax.sharding.Mesh` with axes ("data", "seq", "model", "pipe", "expert") carries data-,
sequence-, tensor-, pipeline- and expert-parallelism; gradient averaging is an XLA
`psum` inserted by `jit` from sharding annotations, not a backward hook.

ICI vs DCN: within a slice, axes ride ICI; the optional `dcn_data` factor in
`ParallelConfig` places extra data-parallel replicas across slices on DCN via
`jax.experimental.mesh_utils.create_hybrid_device_mesh`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from latent_diffusion_speech_tpu.config import ParallelConfig

__all__ = [
    "MeshSpec",
    "build_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "with_sharding",
]

AXIS_DATA = "data"
AXIS_SEQ = "seq"
AXIS_MODEL = "model"
AXIS_PIPE = "pipe"
AXIS_EXPERT = "expert"
AXES = (AXIS_DATA, AXIS_SEQ, AXIS_MODEL, AXIS_PIPE, AXIS_EXPERT)


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    """Resolved mesh geometry: (data, seq, model, pipe, expert) axis sizes."""

    data: int
    seq: int
    model: int
    pipe: int = 1
    expert: int = 1

    @property
    def total(self) -> int:
        return self.data * self.seq * self.model * self.pipe * self.expert


def _resolve_spec(cfg: ParallelConfig, n_devices: int) -> MeshSpec:
    model = max(1, cfg.model)
    seq = max(1, cfg.seq)
    pipe = max(1, getattr(cfg, "pipe", 1))
    expert = max(1, getattr(cfg, "expert", 1))
    denom = model * seq * pipe * expert
    if n_devices % denom != 0:
        raise ValueError(
            f"mesh: {n_devices} devices not divisible by "
            f"model({model})*seq({seq})*pipe({pipe})*expert({expert})"
        )
    data = cfg.data if cfg.data > 0 else n_devices // denom
    if data * denom != n_devices:
        raise ValueError(
            f"mesh: data({data})*seq({seq})*model({model})*pipe({pipe})"
            f"*expert({expert}) != devices({n_devices})"
        )
    return MeshSpec(data=data, seq=seq, model=model, pipe=pipe, expert=expert)


def build_mesh(
    cfg: Optional[ParallelConfig] = None,
    devices: Optional[Sequence[Any]] = None,
) -> Mesh:
    """Build the global mesh.  With `dcn_data > 1`, lays out a hybrid
    (DCN outer data axis x ICI inner axes) mesh for multi-slice training."""
    cfg = cfg or ParallelConfig()
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)

    if cfg.dcn_data > 1:
        from jax.experimental import mesh_utils

        per_slice = n // cfg.dcn_data
        inner = _resolve_spec(cfg, per_slice)
        dev_mesh = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(inner.data, inner.seq, inner.model, inner.pipe, inner.expert),
            dcn_mesh_shape=(cfg.dcn_data, 1, 1, 1, 1),
            devices=devices,
        )
        return Mesh(dev_mesh, AXES)

    spec = _resolve_spec(cfg, n)
    dev_mesh = np.asarray(devices).reshape(
        spec.data, spec.seq, spec.model, spec.pipe, spec.expert
    )
    return Mesh(dev_mesh, AXES)


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis; replicate rest."""
    spec = P(AXIS_DATA, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Device-put a host pytree with batch-dim sharding over the data axis.
    Arrays whose batch dim does not divide the data-axis size are replicated
    (correct, just not sharded — keeps small/ragged eval batches working).

    When the mesh spans multiple processes the batch is interpreted as this
    process's *local* shard and stitched into a global array (multi-host DP:
    each host loads `paths[process_index::process_count]`, so no host ever
    holds the global batch)."""
    from latent_diffusion_speech_tpu.parallel.multihost import (
        global_shard_batch,
        mesh_spans_processes,
    )

    if mesh_spans_processes(mesh):
        return global_shard_batch(mesh, batch)
    data_size = mesh.shape[AXIS_DATA]

    def put(x):
        if hasattr(x, "sharding"):  # already on device
            return x
        x = np.asarray(x)
        if x.ndim >= 1 and x.shape[0] % data_size == 0:
            return jax.device_put(x, batch_sharding(mesh, x.ndim))
        return jax.device_put(x, replicated(mesh))

    return jax.tree_util.tree_map(put, batch)


def with_sharding(mesh: Mesh, tree: Any, spec_tree: Any) -> Any:
    """Apply `jax.lax.with_sharding_constraint` with PartitionSpecs over `mesh`."""

    def constrain(x, spec):
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(constrain, tree, spec_tree)
