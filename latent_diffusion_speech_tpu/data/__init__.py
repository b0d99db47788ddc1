"""Data pipeline (L7 input side).

Datasets over the on-disk npy pipeline layout shared with the reference
(`data/{train,val}/{audio,units,mel,aug_mel,utt,semantic_token}/...` —
SURVEY.md section 1), per-host sharding, static-shape batching for XLA, and a
prefetching host->device loader (with an optional C++ fast-path reader).
"""

from latent_diffusion_speech_tpu.data.files import traverse_dir, speaker_id_map  # noqa: F401
from latent_diffusion_speech_tpu.data.diffusion_dataset import DiffusionDataset  # noqa: F401
from latent_diffusion_speech_tpu.data.lm_dataset import (  # noqa: F401
    TextDataset,
    collate_llama_batch,
    collate_text_batch,
)
from latent_diffusion_speech_tpu.data.loader import DataLoader  # noqa: F401
