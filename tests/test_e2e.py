"""End-to-end integration: full TTS chain and full preprocessing chain with
tiny models, plus long-audio SVC-style inference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from latent_diffusion_speech_tpu.infer import TTSPipeline
from latent_diffusion_speech_tpu.models.diffusion import Unit2MelConfig, Unit2MelSystem
from latent_diffusion_speech_tpu.models.lm import RoformerConfig, RoformerSystem
from latent_diffusion_speech_tpu.models.lm.roformer import StackConfig
from latent_diffusion_speech_tpu.models.vaegan import VAEGANConfig
from latent_diffusion_speech_tpu.models.vocoder import Vocoder

UNIT_DIM = 16
TINY_VAEGAN = VAEGANConfig(
    sampling_rate=8000, inter_channels=6, resblock_kernel_sizes=(3,),
    resblock_dilation_sizes=((1, 3),), upsample_rates=(4, 2),
    upsample_initial_channel=16, upsample_kernel_sizes=(8, 4),
)


@pytest.fixture(scope="module")
def pipeline():
    diffusion = Unit2MelSystem(
        Unit2MelConfig(
            input_channel=UNIT_DIM, n_spk=4, out_dims=6, n_hidden=8,
            block_out_channels=(8, 8), n_heads=2, timesteps=50, k_step=50,
        )
    )
    vocoder = Vocoder("hifi-vaegan")
    vocoder.vocoder = __import__(
        "latent_diffusion_speech_tpu.models.vaegan.codec", fromlist=["HifiVAEGAN"]
    ).HifiVAEGAN.random_init(TINY_VAEGAN)
    lm = RoformerSystem(
        RoformerConfig(
            encoder=StackConfig(hidden_size=16, num_attention_heads=2, num_hidden_layers=1, intermediate_size=16),
            decoder=StackConfig(hidden_size=16, num_attention_heads=2, num_hidden_layers=1, intermediate_size=16),
            semantic_kmeans_num=32,
            n_spk=4,
        )
    )
    codebook = np.random.default_rng(0).standard_normal((32, UNIT_DIM)).astype(np.float32)
    return TTSPipeline(diffusion, vocoder, lm=lm, codebook=codebook)


def test_full_tts_with_llama_lm(rng):
    """Same chain with the single-stream Llama LM serving the semantic stage
    (reference capability its dispatcher never wires; ours does)."""
    from latent_diffusion_speech_tpu.models.lm import LlamaConfig, LlamaSystem

    diffusion = Unit2MelSystem(
        Unit2MelConfig(
            input_channel=UNIT_DIM, n_spk=4, out_dims=6, n_hidden=8,
            block_out_channels=(8, 8), n_heads=2, timesteps=50, k_step=50,
        )
    )
    vocoder = Vocoder("hifi-vaegan")
    vocoder.vocoder = __import__(
        "latent_diffusion_speech_tpu.models.vaegan.codec", fromlist=["HifiVAEGAN"]
    ).HifiVAEGAN.random_init(TINY_VAEGAN)
    lm = LlamaSystem(LlamaConfig(
        hidden_size=16, num_attention_heads=2, num_hidden_layers=1,
        intermediate_size=32, semantic_kmeans_num=32,
    ))
    codebook = np.random.default_rng(0).standard_normal((32, UNIT_DIM)).astype(np.float32)
    pipe = TTSPipeline(diffusion, vocoder, lm=lm, codebook=codebook)

    phones = rng.integers(1, 50, 6).astype(np.int32)
    tones = rng.integers(0, 6, 6).astype(np.int32)
    wav, sr = pipe.tts_from_phones(
        phones, tones, spk_id=2, method="ddim", infer_speedup=10, max_length=12
    )
    assert sr == 8000
    assert np.isfinite(wav).all()


class TestTTSChain:
    def test_full_tts_from_phones(self, pipeline, rng):
        phones = rng.integers(1, 50, 6).astype(np.int32)
        tones = rng.integers(0, 6, 6).astype(np.int32)
        wav, sr = pipeline.tts_from_phones(
            phones, tones, spk_id=2, method="ddim", infer_speedup=10, max_length=12
        )
        assert sr == 8000
        assert wav.ndim == 1
        assert np.isfinite(wav).all()
        # one latent frame -> hop samples of audio
        assert len(wav) % 8 == 0

    def test_semantic_roundtrip(self, pipeline):
        tokens = np.array([3, 7, 1], np.int32)
        units = pipeline.semantic_to_units(tokens)
        assert units.shape == (1, 3, UNIT_DIM)
        np.testing.assert_allclose(
            np.asarray(units[0, 0]), np.asarray(pipeline.codebook.codebook[3]), atol=1e-6
        )

    def test_infer_bucket_padding_consistency(self, pipeline, rng):
        """Bucket padding must not change the unpadded region's length."""
        units = jnp.asarray(rng.standard_normal((1, 10, UNIT_DIM)).astype(np.float32))
        wav = pipeline.infer(units, method="ddim", infer_speedup=25)
        assert wav.shape == (1, 10 * 8)


class TestLongAudio:
    def test_svc_style_inference(self, pipeline, rng):
        class FakeUnitsEncoder:
            encoder_hop_size = 4

            def encode(self, audio, sr):
                n = max(int(audio.shape[-1]) // 4, 1)
                return jnp.zeros((1, n, UNIT_DIM))

        pipeline.units_encoder = FakeUnitsEncoder()
        sr = 8000
        t = np.arange(sr) / sr
        tone = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
        audio = np.concatenate([tone, np.zeros(sr, np.float32), tone])
        wav, out_sr = pipeline.infer_from_long_audio(
            audio, sr, method="ddim", infer_speedup=25, threshold_db=-40,
        )
        assert out_sr == 8000
        assert len(wav) > 0
        assert np.isfinite(wav).all()


class TestBatchedTTS:
    def test_tts_batch(self, pipeline, monkeypatch, rng):
        # bypass the text frontend (no G2P deps needed for this test)
        def fake_phones(self, text, language="ZH"):
            n = 4 + len(text) % 3
            r = np.random.default_rng(len(text))
            return r.integers(1, 50, n).astype(np.int32), r.integers(0, 6, n).astype(np.int32)

        monkeypatch.setattr(type(pipeline), "text_to_phones", fake_phones)
        before = set(pipeline._infer_cache)
        outs = pipeline.tts_batch(
            ["hello", "goodbye now"], spk_ids=[1, 2],
            method="ddim", infer_speedup=25, max_length=8,
        )
        assert len(outs) == 2
        for wav, sr in outs:
            assert sr == 8000
            assert np.isfinite(wav).all()
        # diffusion+vocoder ran as ONE batched compiled call per length bucket:
        # both items (<=8 tokens) share the min bucket -> exactly one new
        # program, with batch dim 2
        new = set(pipeline._infer_cache) - before
        assert len(new) == 1
        ((padded_T, T, B, method, speedup),) = new
        assert B == 2 and padded_T == T and method == "ddim"

    def test_tts_batch_pads_batch_to_pow2(self, pipeline, monkeypatch, rng):
        """batch_bucket pads B=3 to 4 everywhere (LM decode + diffusion
        buckets), so a dynamic batcher's varying batch sizes hit a bounded
        set of compiled programs; pad outputs are dropped."""
        import jax

        def fake_phones(self, text, language="ZH"):
            r = np.random.default_rng(len(text))
            return r.integers(1, 50, 4).astype(np.int32), r.integers(0, 6, 4).astype(np.int32)

        monkeypatch.setattr(type(pipeline), "text_to_phones", fake_phones)
        gen_batch_sizes = []
        real_generate = type(pipeline.lm).generate

        def spy_generate(self, phones, *a, **kw):
            gen_batch_sizes.append(int(phones.shape[0]))
            return real_generate(self, phones, *a, **kw)

        monkeypatch.setattr(type(pipeline.lm), "generate", spy_generate)
        before = set(pipeline._infer_cache)
        outs = pipeline.tts_batch(
            ["a", "bb", "ccc"], spk_ids=[1, 2, 3],
            method="ddim", infer_speedup=25, max_length=8,
        )
        assert gen_batch_sizes == [4]  # LM ran at the padded batch
        assert len(outs) == 3
        for wav, sr in outs:
            assert sr == 8000 and np.isfinite(wav).all() and len(wav) > 0
        # the diffusion bucket also ran padded to 4
        new = set(pipeline._infer_cache) - before
        assert {b for (_, _, b, _, _) in new} == {4}

        # opting out keeps exact batch sizes
        gen_batch_sizes.clear()
        outs = pipeline.tts_batch(
            ["a", "bb", "ccc"], spk_ids=[1, 2, 3],
            method="ddim", infer_speedup=25, max_length=8, batch_bucket=False,
        )
        assert gen_batch_sizes == [3]
        assert len(outs) == 3

    def test_tts_batch_crops_per_item(self, pipeline, monkeypatch, rng):
        """Each item's waveform is cropped to its own token count * hop."""
        import jax

        def fake_phones(self, text, language="ZH"):
            r = np.random.default_rng(len(text))
            return r.integers(1, 50, 4).astype(np.int32), r.integers(0, 6, 4).astype(np.int32)

        monkeypatch.setattr(type(pipeline), "text_to_phones", fake_phones)

        class FakeLM:
            cfg = pipeline.lm.cfg

            def generate(self, phones, tones, **kw):
                K = self.cfg.semantic_kmeans_num
                toks = np.full((2, 16), K + 2, np.int64)  # PAD
                toks[0, :3] = [1, 2, 3]
                toks[1, :5] = [4, 5, 6, 7, 8]
                return jax.numpy.asarray(toks), jax.numpy.asarray([3, 5])

        real_lm = pipeline.lm
        pipeline.lm = FakeLM()
        try:
            outs = pipeline.tts_batch(
                ["ab", "abcd"], spk_ids=[1, 2], method="ddim", infer_speedup=25,
            )
        finally:
            pipeline.lm = real_lm
        assert len(outs[0][0]) == 3 * 8
        assert len(outs[1][0]) == 5 * 8
