"""CLI pipeline stages driven end-to-end on a synthetic dataset with tiny models."""

import numpy as np
import pytest

import jax.numpy as jnp

from latent_diffusion_speech_tpu.cli.prepare_audio import (
    drop_long_audio,
    extract_valset,
    renumber_speakers,
)
from latent_diffusion_speech_tpu.cli.preprocess_text import merge_labels
from latent_diffusion_speech_tpu.cli.preprocess_token import tokenize_units
from latent_diffusion_speech_tpu.cli.preprocess_cluster import fit_codebook
from latent_diffusion_speech_tpu.ops.audio_io import write_wav
from latent_diffusion_speech_tpu.quantize import save_codebook


@pytest.fixture
def audio_tree(tmp_path, rng):
    root = tmp_path / "train" / "audio"
    for spk in ("alice", "bob"):
        d = root / spk
        d.mkdir(parents=True)
        for n in range(4):
            dur = 0.2 if n < 3 else 2.0
            wav = (rng.standard_normal(int(8000 * dur)) * 0.1).astype(np.float32)
            write_wav(d / f"{n}.wav", wav, 8000)
            (d / f"{n}.txt").write_text(f"text for {spk} {n}")
    return tmp_path / "train"


class TestPrepareAudio:
    def test_drop_long(self, audio_tree):
        n = drop_long_audio(audio_tree / "audio", max_sec=1.0)
        assert n == 2  # one 2s file per speaker
        assert not (audio_tree / "audio" / "alice" / "3.wav").exists()
        assert not (audio_tree / "audio" / "alice" / "3.txt").exists()

    def test_renumber(self, audio_tree):
        n = renumber_speakers(audio_tree / "audio")
        assert n == 2
        assert (audio_tree / "audio" / "1").is_dir()
        assert (audio_tree / "audio" / "2").is_dir()

    def test_valset_extraction(self, audio_tree, tmp_path):
        val = tmp_path / "val" / "audio"
        moved = extract_valset(audio_tree / "audio", val, n_speakers=2, n_files=1)
        assert moved == 2
        assert len(list(val.rglob("*.wav"))) == 2


class TestTextAndTokens:
    def test_merge_labels(self, audio_tree):
        n = merge_labels(audio_tree)
        assert n == 8
        content = (audio_tree / "audio" / "alice" / "utt_text.txt").read_text()
        assert "0|text for alice 0" in content

    def test_cluster_and_tokenize(self, audio_tree, rng):
        units_dir = audio_tree / "units" / "1"
        units_dir.mkdir(parents=True)
        for n in range(3):
            np.save(units_dir / f"{n}.wav.npy", rng.standard_normal((40, 8)).astype(np.float32))
        centroids, inertia = fit_codebook(audio_tree, k=16, epochs=2, batch_size=32, verbose=False)
        assert centroids.shape == (16, 8)

        cb_path = audio_tree / "codebook.npz"
        save_codebook(cb_path, centroids)
        results = list(tokenize_units(audio_tree, centroids))
        assert len(results) == 3
        ids = np.load(audio_tree / "semantic_token" / "1" / "0.wav.npy")
        assert ids.shape == (40,) and ids.dtype == np.int32
        assert ids.max() < 16


class TestBatchPreprocess:
    def test_batched_extraction(self, audio_tree):
        from latent_diffusion_speech_tpu.cli.batch_preprocess import batch_extract

        class FakeUnits:
            encoder_hop_size = 320

            def encode(self, audio, sr):
                return jnp.zeros((audio.shape[0], audio.shape[1] // 320, 4))

        class FakeVocoder:
            vocoder_hop_size = 512

            def extract(self, audio, sr):
                # pretend rate==encoder rate for the test
                return jnp.zeros((audio.shape[0], audio.shape[1] // 512, 8))

        progress = list(
            batch_extract(audio_tree, FakeUnits(), FakeVocoder(), sample_rate=8000,
                          encoder_sr=8000, batch_size=4)
        )
        assert progress[-1][0] == progress[-1][1] == 8
        units = np.load(audio_tree / "units" / "alice" / "0.wav.npy")
        assert units.shape[0] == 1600 // 320
        mel = np.load(audio_tree / "mel" / "alice" / "0.wav.npy")
        assert mel.shape[0] == 1600 // 512


class TestRealPreprocess:
    def test_units_and_mel_stages_with_tiny_models(self, audio_tree):
        """Stage 10/11 functions with real (tiny) encoders over real wavs."""
        import jax.numpy as jnp

        from latent_diffusion_speech_tpu.cli.preprocess_mel import process_mels
        from latent_diffusion_speech_tpu.cli.preprocess_unit import process_units
        from latent_diffusion_speech_tpu.models.units import UnitsEncoder
        from latent_diffusion_speech_tpu.models.vaegan import VAEGANConfig
        from latent_diffusion_speech_tpu.models.vaegan.codec import HifiVAEGAN
        from latent_diffusion_speech_tpu.models.vocoder import Vocoder
        from latent_diffusion_speech_tpu.models.whisper import WhisperDims

        tiny_dims = WhisperDims(n_mels=16, n_audio_ctx=100, n_audio_state=16,
                                n_audio_head=2, n_audio_layer=1)
        encoder = UnitsEncoder("whisper_large_v3", encoder_sample_rate=8000,
                               encoder_hop_size=320, dims=tiny_dims, dtype=jnp.float32)
        results = list(process_units(audio_tree, encoder, 8000, device_sr=8000))
        assert len(results) == 8
        units = np.load(audio_tree / "units" / "alice" / "0.wav.npy")
        assert units.shape == (1600 // 320, 16)

        vocoder = Vocoder("hifi-vaegan")
        vocoder.vocoder = HifiVAEGAN.random_init(VAEGANConfig(
            sampling_rate=8000, inter_channels=4, resblock_kernel_sizes=(3,),
            resblock_dilation_sizes=((1, 3),), upsample_rates=(4, 2),
            upsample_initial_channel=8, upsample_kernel_sizes=(8, 4),
        ))
        results = list(process_mels(audio_tree, vocoder, 8000))
        assert len(results) == 8
        mel = np.load(audio_tree / "mel" / "alice" / "0.wav.npy")
        assert mel.shape == (1600 // 8, 8)  # (frames, 2*inter_channels)
        aug = np.load(audio_tree / "aug_mel" / "alice" / "0.wav.npy")
        assert aug.shape == mel.shape
