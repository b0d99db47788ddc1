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

__all__ = ["mesh_spans_processes", "global_shard_batch"]


def mesh_spans_processes(mesh) -> bool:
    """True when `mesh` contains devices owned by more than one process."""
    if jax.process_count() <= 1:
        return False
    procs = {d.process_index for d in mesh.devices.flat}
    return len(procs) > 1


def global_shard_batch(mesh, batch: Any) -> Any:
    """Assemble a global batch from per-process local shards.

    Arrays with a leading batch dim become global arrays sharded over the
    'data' axis: each process contributes `local_B` rows and the global batch
    is `local_B * (data_axis_size / local_data_devices)` rows, in mesh device
    order (host h's rows precede host h+1's).  0-d arrays (step counters,
    flags) are replicated and MUST be identical on every process.
    """
    data_size = mesh.shape[mesh_lib.AXIS_DATA]

    def put(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return x  # already global
        x = np.asarray(x)
        if x.ndim >= 1:
            sharding = mesh_lib.batch_sharding(mesh, x.ndim)
            try:
                return jax.make_array_from_process_local_data(sharding, x)
            except ValueError as e:
                raise ValueError(
                    f"global_shard_batch: local batch shape {x.shape} does not "
                    f"tile the 'data' axis (size {data_size}) of the "
                    f"multi-process mesh: {e}"
                ) from None
        return jax.make_array_from_process_local_data(mesh_lib.replicated(mesh), x)

    return jax.tree_util.tree_map(put, batch)
