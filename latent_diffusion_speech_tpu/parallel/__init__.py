"""Device mesh, shardings, and distributed runtime.

Replaces the reference's HF-accelerate DDP layer (SURVEY.md section 2.8) with a
declarative JAX mesh: named axes ("data", "seq", "model", "pipe"),
NamedShardings, and XLA-compiled collectives instead of NCCL allreduce hooks.
Pipeline parallelism (GPipe microbatching over the 'pipe' axis) lives in
`parallel.pipeline`.
"""

from latent_diffusion_speech_tpu.parallel.mesh import (  # noqa: F401
    MeshSpec,
    build_mesh,
    batch_sharding,
    replicated,
    shard_batch,
    with_sharding,
)
from latent_diffusion_speech_tpu.parallel.dist import (  # noqa: F401
    initialize_distributed,
    is_main_process,
    process_count,
    process_index,
    sync_global_devices,
)
from latent_diffusion_speech_tpu.parallel.pipeline import (  # noqa: F401
    pipeline_apply,
    stack_stage_params,
)
