"""Multi-process (multi-host) array assembly.

In a multi-process run each host loads only its own slice of the global batch
(`data/*_dataset.py` shard `paths[process_index::process_count]`, the
reference's accelerate striding, `diffusion/data_loaders.py:101-102`).  A
plain `jax.device_put(local, sharding)` cannot express that: a sharding that
spans non-addressable devices treats its input as the *global* value.  The
host-local -> global conversion is `jax.make_array_from_process_local_data`,
which stitches each process's rows into one global `jax.Array` whose
addressable shards are backed by the local data (zero-copy per device shard).

This module is the single place that conversion happens; `mesh.shard_batch`
dispatches here whenever the mesh spans more than one process.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np

from latent_diffusion_speech_tpu.parallel import mesh as mesh_lib

__all__ = ["mesh_spans_processes", "global_shard_batch", "gather_to_host"]


def gather_to_host(tree: Any) -> Any:
    """Materialize a pytree on the host for checkpointing.

    Leaves sharded across processes (cross-host 'model'/'pipe'/'expert'
    layouts) are allgathered — a COLLECTIVE: every process must call this,
    then typically only rank 0 writes.  Fully-replicated and fully-addressable
    leaves fetch locally with no communication (the multi-host-DP fast path,
    where params are replicated and only rank 0 needs to do anything)."""

    def to_host(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            if x.is_fully_replicated:
                return np.asarray(x)
            from jax.experimental import multihost_utils

            return np.asarray(multihost_utils.process_allgather(x, tiled=True))
        return x

    return jax.tree_util.tree_map(to_host, tree)


def mesh_spans_processes(mesh) -> bool:
    """True when `mesh` contains devices owned by more than one process."""
    if jax.process_count() <= 1:
        return False
    procs = {d.process_index for d in mesh.devices.flat}
    return len(procs) > 1


def _local_data_coords(mesh) -> set:
    """Data-axis coordinates whose devices include one owned by this process."""
    me = jax.process_index()
    axis = mesh.axis_names.index(mesh_lib.AXIS_DATA)
    coords = set()
    for i in range(mesh.devices.shape[axis]):
        sl = [slice(None)] * mesh.devices.ndim
        sl[axis] = i
        if any(d.process_index == me for d in mesh.devices[tuple(sl)].flat):
            coords.add(i)
    return coords


def global_shard_batch(mesh, batch: Any) -> Any:
    """Assemble a global batch from per-process local shards.

    Arrays with a leading batch dim become global arrays sharded over the
    'data' axis.  Two multi-host layouts are handled:

    * the 'data' axis crosses process boundaries (classic multi-host DP):
      each process contributes its `local_B` rows and the global batch is
      stitched in mesh device order (host h's rows precede host h+1's);
    * a *model* axis ('model'/'pipe'/'expert') crosses processes while every
      data-axis coordinate is addressable from every process (cross-host
      tensor/pipeline parallelism): each process must then load the SAME
      full batch, which is device_put with global semantics.

    0-d arrays (step counters, flags) are replicated and MUST be identical
    on every process.
    """
    data_size = mesh.shape[mesh_lib.AXIS_DATA]
    covers_all_data = len(_local_data_coords(mesh)) == data_size

    def put(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return x  # already global
        x = np.asarray(x)
        if x.ndim >= 1:
            sharding = mesh_lib.batch_sharding(mesh, x.ndim)
            try:
                if covers_all_data:
                    # the local batch IS the global batch (model axes span hosts)
                    return jax.device_put(x, sharding)
                return jax.make_array_from_process_local_data(sharding, x)
            except ValueError as e:
                raise ValueError(
                    f"global_shard_batch: local batch shape {x.shape} does not "
                    f"tile the 'data' axis (size {data_size}) of the "
                    f"multi-process mesh: {e}"
                ) from None
        if covers_all_data:
            return jax.device_put(x, mesh_lib.replicated(mesh))
        return jax.make_array_from_process_local_data(mesh_lib.replicated(mesh), x)

    return jax.tree_util.tree_map(put, batch)
