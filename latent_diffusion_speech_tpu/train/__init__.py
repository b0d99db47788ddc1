"""Training runtime (L7).

Optax-based trainers with pjit/NamedSharding data parallelism over the device
mesh — the TPU-native replacement for the reference's accelerate-DDP loops
(`diffusion/solver.py:87-152`, `text2semantic/roformer/train.py:73-159`).
"""

from latent_diffusion_speech_tpu.train.schedule import warmup_step_decay  # noqa: F401
from latent_diffusion_speech_tpu.train.checkpoint import (  # noqa: F401
    latest_checkpoint_step,
    load_checkpoint,
    save_checkpoint,
)
from latent_diffusion_speech_tpu.train.debug import (  # noqa: F401
    NonFiniteError,
    assert_tree_finite,
    check_step,
    install,
)
from latent_diffusion_speech_tpu.train.diffusion_trainer import DiffusionTrainer  # noqa: F401
from latent_diffusion_speech_tpu.train.lm_trainer import LMTrainer  # noqa: F401
