"""Migration path: build the serve pipeline straight from reference-format
torch checkpoints (synthesized with the reference's own modules)."""

import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "diffusion")), reason="reference not mounted"
)


@pytest.fixture(scope="module")
def reference_artifacts(tmp_path_factory, rng=np.random.default_rng(0)):
    """Write reference-format checkpoints: diffusion model_<step>.pt +
    config.yaml, lm model_<step>.pt, semantic_codebook.pt, vaegan enc/dec."""
    torch = pytest.importorskip("torch")
    root = tmp_path_factory.mktemp("ref_exp")

    # stub heavy deps so reference modules import (see test_unit2mel_import)
    import types, importlib.machinery

    for name in ("torchaudio", "torchaudio.transforms", "librosa", "librosa.filters",
                 "librosa.core", "fairseq", "pynvml", "vector_quantize_pytorch", "soundfile"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
            sys.modules[name] = mod
    sys.modules["torchaudio"].transforms = sys.modules["torchaudio.transforms"]
    sys.modules["torchaudio.transforms"].Resample = object
    sys.modules["librosa"].filters = sys.modules["librosa.filters"]
    sys.modules["librosa.filters"].mel = lambda **kw: None
    sys.modules["vector_quantize_pytorch"].VectorQuantize = object
    sys.modules["fairseq"].checkpoint_utils = types.SimpleNamespace()
    sys.modules["librosa"].core = sys.modules["librosa.core"]
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)

    import yaml

    cfg = {
        "data": {"encoder": "whisper_large_v3", "acoustic_scale": 1.0, "block_size": 512,
                 "sampling_rate": 44100, "encoder_sample_rate": 16000, "encoder_hop_size": 320,
                 "units_forced_mode": "nearest", "extensions": ["wav"],
                 "train_path": "data/train", "valid_path": "data/val", "duration": 1},
        "common": {"n_spk": 4, "vocoder": {"type": "hifi-vaegan", "ckpt": str(root / "vaegan"),
                   "only_mean": True, "clamp": 10.0}, "infer": {"method": "ddim", "speedup": 100}},
        "diffusion": {"model": {"block_out_channels": [16, 24, 32, 32], "n_layers": 1,
                                "n_heads": 4, "n_hidden": 12, "use_pitch_aug": False, "n_chans": 32},
                      "train": {"expdir": str(root / "diffusion")}},
        "text2semantic": {"model": {"mode": "phone", "semantic_kmeans_num": 32,
                                    "codebook_path": str(root / "semantic_codebook.pt"),
                                    "type": "roformer",
                                    "decoder": {"hidden_size": 16, "num_attention_heads": 2,
                                                "num_hidden_layers": 1, "intermediate_size": 16},
                                    "encoder": {"hidden_size": 16, "num_attention_heads": 2,
                                                "num_hidden_layers": 1, "intermediate_size": 16}},
                          "train": {"expdir": str(root / "lm")}},
    }

    # --- vaegan checkpoints in the reference layout ({"model", "config"})
    from tests.test_vaegan import TINY as VA_TINY, TorchEncoder, TorchGenerator

    h = {
        "sampling_rate": VA_TINY.sampling_rate, "inter_channels": VA_TINY.inter_channels,
        "resblock": VA_TINY.resblock, "resblock_kernel_sizes": list(VA_TINY.resblock_kernel_sizes),
        "resblock_dilation_sizes": [list(d) for d in VA_TINY.resblock_dilation_sizes],
        "upsample_rates": list(VA_TINY.upsample_rates),
        "upsample_initial_channel": VA_TINY.upsample_initial_channel,
        "upsample_kernel_sizes": list(VA_TINY.upsample_kernel_sizes),
        "hop_size": VA_TINY.hop_size,
    }
    (root / "vaegan").mkdir()
    torch.save({"model": TorchEncoder(VA_TINY).state_dict(), "config": h}, root / "vaegan" / "encoder.pth")
    torch.save({"model": TorchGenerator(VA_TINY).state_dict(), "config": h}, root / "vaegan" / "decoder.pth")

    # --- diffusion checkpoint via the reference Unit2Mel (out_dims = vaegan 2C/2)
    from diffusion.unit2mel import Unit2Mel as RefUnit2Mel

    ref_diff = RefUnit2Mel(1280, 4, out_dims=VA_TINY.inter_channels, n_layers=1,
                           block_out_channels=(16, 24, 32, 32), n_heads=4, n_hidden=12,
                           acoustic_scale=1.0)
    (root / "diffusion").mkdir()
    torch.save({"global_step": 77, "model": ref_diff.state_dict()}, root / "diffusion" / "model_77.pt")
    (root / "diffusion" / "config.yaml").write_text(yaml.safe_dump(cfg))

    # --- LM checkpoint via HF parts in the reference layout
    from tests.test_lm import _build_hf_roformer
    from latent_diffusion_speech_tpu.models.lm.roformer import RoformerConfig, StackConfig

    lm_cfg = RoformerConfig(
        encoder=StackConfig(hidden_size=16, num_attention_heads=2, num_hidden_layers=1, intermediate_size=16),
        decoder=StackConfig(hidden_size=16, num_attention_heads=2, num_hidden_layers=1, intermediate_size=16),
        semantic_kmeans_num=32, n_spk=4,
    )
    ref_lm = _build_hf_roformer(lm_cfg)
    (root / "lm").mkdir()
    torch.save({"global_step": 55, "model": ref_lm.state_dict()}, root / "lm" / "model_55.pt")

    # --- k-means codebook in the reference sklearn-dict layout
    cb = np.random.default_rng(1).standard_normal((32, 1280)).astype(np.float32)
    torch.save({"n_features_in_": 1280, "_n_threads": 4,
                "cluster_centers_": torch.from_numpy(cb), "n_clusters": 32},
               root / "semantic_codebook.pt")
    return root, cfg


class TestReferenceMigration:
    def test_pipeline_loads_and_serves(self, reference_artifacts):
        from latent_diffusion_speech_tpu.infer.load import load_reference_pipeline

        root, cfg = reference_artifacts
        pipe = load_reference_pipeline(
            root / "diffusion", lm_ckpt=root / "lm",
            codebook_path=root / "semantic_codebook.pt",
            vocoder_path=root / "vaegan",
            dtype=jnp.float32,
        )
        assert pipe.lm is not None and pipe.codebook is not None
        phones = np.array([3, 4, 5, 6], np.int32)
        tones = np.zeros(4, np.int32)
        wav, sr = pipe.tts_from_phones(
            phones, tones, spk_id=1, method="ddim", infer_speedup=250, max_length=6,
        )
        assert sr == 8000  # the tiny vaegan's rate
        assert np.isfinite(wav).all()
