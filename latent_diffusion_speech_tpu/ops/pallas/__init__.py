"""Pallas TPU kernels (the CUDA-library-equivalent tier).

The reference leaned on flash-attn CUDA kernels and cuBLAS/cuDNN
(SURVEY.md 2.8); here the hand-written tier is Pallas:
* `roformer_decode_pallas` — the ENTIRE AR decode loop (embedding, rotary,
  KV-cache attention, cross-attention, FFN, LM head, top-k/top-p sampling)
  as one kernel with VMEM-resident weights; the TPU serve default.
* `flash_attention` — tiled online-softmax attention, VMEM-resident blocks.
* `kmeans_argmin` — fused distance + argmin against a large codebook.
All kernels have XLA fallbacks behind the same signatures.
"""

from latent_diffusion_speech_tpu.ops.pallas.ar_decode import roformer_decode_pallas  # noqa: F401
from latent_diffusion_speech_tpu.ops.pallas.flash_attention import flash_attention  # noqa: F401
from latent_diffusion_speech_tpu.ops.pallas.kmeans import kmeans_argmin  # noqa: F401
