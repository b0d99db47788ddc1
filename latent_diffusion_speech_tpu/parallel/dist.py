"""Multi-host runtime: init, rank queries, barriers.

TPU-native replacement for the accelerate surface the reference used
(`Accelerator()`, `is_main_process`, `wait_for_everyone()`,
`process_index/num_processes` — SURVEY.md section 5 "Distributed communication
backend").
"""

from __future__ import annotations

import os
from typing import Optional

import jax

__all__ = [
    "initialize_distributed",
    "process_index",
    "process_count",
    "is_main_process",
    "sync_global_devices",
    "local_device_count",
]

_initialized = False


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialise `jax.distributed` once per host.  No-op for single-process
    runs (the common case on one chip or under the CPU-simulated mesh)."""
    global _initialized
    if _initialized:
        return
    # Only init when a coordinator is configured (env or args); otherwise JAX
    # runs single-process and multi-device locally.
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator_address:
        # Cross-process collectives on the CPU backend need a real transport;
        # jaxlib ships gloo.  Harmless for TPU (ICI collectives don't use it),
        # required for the multi-process CPU-simulated mesh used in tests.
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:
            pass  # older/newer jaxlib without the option
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    _initialized = True


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    return jax.process_index() == 0


def local_device_count() -> int:
    return jax.local_device_count()


def sync_global_devices(name: str = "barrier") -> None:
    """Cross-host barrier (reference: `accelerator.wait_for_everyone()`)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)
