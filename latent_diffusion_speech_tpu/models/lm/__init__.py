"""Text -> semantic AR language models (L5).

Parity surface with the reference `text2semantic/`: RoFormer encoder-decoder
(`roformer/roformer.py:59-255`) and Llama decoder-only (`llama/llama.py:23-184`),
with HF-`generate`-equivalent sampling re-expressed as a `lax.scan` over a
preallocated TPU-resident KV cache.
"""

from latent_diffusion_speech_tpu.models.lm.roformer import (  # noqa: F401
    Roformer,
    RoformerConfig,
    RoformerSystem,
)
from latent_diffusion_speech_tpu.models.lm.llama import (  # noqa: F401
    Llama,
    LlamaConfig,
    LlamaSystem,
)
from latent_diffusion_speech_tpu.models.lm.sampling import SamplingConfig  # noqa: F401
