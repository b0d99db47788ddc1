"""Quantization / clustering (L3).

Parity surface with the reference `cluster/` + `quantize/` packages:
k-means fit (minibatch EMA, the `KMeansGPU` algorithm re-done as XLA matmuls),
predict, frozen `EuclideanCodebook`, and the learned cosine EMA `VectorQuantize`
path configured at `20_train_diffusion.py:49-56`.
"""

from latent_diffusion_speech_tpu.quantize.kmeans import (  # noqa: F401
    kmeans_fit,
    kmeans_predict,
    load_codebook,
    save_codebook,
)
from latent_diffusion_speech_tpu.quantize.codebook import (  # noqa: F401
    EuclideanCodebook,
    VectorQuantize,
    VQState,
)
