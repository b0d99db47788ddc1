"""w2v-BERT: flax vs HF-torch parity (frontend + conformer encoder + units).

The torch model is the oracle only; the framework path is pure JAX
(VERDICT round-1 item 7: TPU-native w2v-BERT, synthetic-ckpt parity-tested
exactly like whisper).  Reference usage: tools/tools.py:128-142.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from latent_diffusion_speech_tpu.models.w2vbert import (
    W2vBertConfig,
    W2vBertModel,
    kaldi_mel_filters,
    w2vbert_fbank,
    w2vbert_params_from_torch,
)


def small_hf_model(seed=0):
    from transformers import Wav2Vec2BertConfig, Wav2Vec2BertModel

    torch.manual_seed(seed)
    cfg = Wav2Vec2BertConfig(
        hidden_size=64,
        num_hidden_layers=2,
        intermediate_size=128,
        num_attention_heads=4,
        feature_projection_input_dim=160,
        left_max_position_embeddings=8,
        right_max_position_embeddings=2,
        conv_depthwise_kernel_size=5,
        hidden_dropout=0.0,
        attention_dropout=0.0,
        activation_dropout=0.0,
        feat_proj_dropout=0.0,
        final_dropout=0.0,
        layerdrop=0.0,
        conformer_conv_dropout=0.0,
        apply_spec_augment=False,
    )
    return Wav2Vec2BertModel(cfg).eval(), cfg


class TestFbankFrontend:
    def test_matches_seamless_m4t_extractor(self):
        from transformers import SeamlessM4TFeatureExtractor

        fe = SeamlessM4TFeatureExtractor()
        rng = np.random.default_rng(0)
        wav = (rng.standard_normal(16000) * 0.1).astype(np.float32)
        ref = fe(wav, sampling_rate=16000, return_tensors="np", padding=False)
        got = np.asarray(w2vbert_fbank(jnp.asarray(wav)))
        assert got.shape == (1,) + ref["input_features"].shape[1:]
        np.testing.assert_allclose(got[0], ref["input_features"][0], rtol=2e-4, atol=2e-4)

    def test_mel_filters_match_hf(self):
        from transformers.audio_utils import mel_filter_bank

        ref = mel_filter_bank(
            num_frequency_bins=257, num_mel_filters=80, min_frequency=20,
            max_frequency=8000, sampling_rate=16000, norm=None,
            mel_scale="kaldi", triangularize_in_mel_space=True,
        )
        np.testing.assert_allclose(kaldi_mel_filters(), ref, rtol=1e-6, atol=1e-8)


class TestEncoderParity:
    def test_forward_matches_hf(self):
        hf, hf_cfg = small_hf_model()
        cfg = W2vBertConfig.from_hf(hf_cfg)
        params = w2vbert_params_from_torch(hf.state_dict(), cfg)
        model = W2vBertModel(cfg)

        rng = np.random.default_rng(1)
        feats = rng.standard_normal((2, 37, 160)).astype(np.float32)
        with torch.no_grad():
            ref = hf(input_features=torch.from_numpy(feats)).last_hidden_state.numpy()
        got = np.asarray(model.apply({"params": jax.tree_util.tree_map(jnp.asarray, params)},
                                     jnp.asarray(feats)))
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)

    def test_units_encoder_end_to_end_vs_hf(self):
        """UnitsEncoder('w2v-bert') == HF extractor+model on raw audio."""
        hf, hf_cfg = small_hf_model(seed=3)
        from transformers import SeamlessM4TFeatureExtractor

        from latent_diffusion_speech_tpu.models.units import UnitsEncoder, Wav2Vec2BertUnits

        enc = UnitsEncoder("w2v-bert", hf_model=hf, dtype=jnp.float32)
        assert isinstance(enc.model, Wav2Vec2BertUnits)

        rng = np.random.default_rng(2)
        wav = (rng.standard_normal(16000) * 0.1).astype(np.float32)
        fe = SeamlessM4TFeatureExtractor()
        inputs = fe(wav, sampling_rate=16000, return_tensors="pt", padding=False)
        with torch.no_grad():
            ref = hf(input_features=inputs["input_features"]).last_hidden_state.numpy()

        got = np.asarray(enc.encode(jnp.asarray(wav), 16000, pad_to_bucket=False))
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, rtol=5e-4, atol=5e-4)

    def test_jitted_no_torch_on_hot_path(self):
        """The extraction path compiles as one XLA program (no torch calls)."""
        hf, hf_cfg = small_hf_model(seed=4)
        from latent_diffusion_speech_tpu.models.units import Wav2Vec2BertUnits

        units = Wav2Vec2BertUnits(hf_model=hf)
        wav = jnp.zeros((1, 8000))
        out = units(wav)
        assert out.shape[-1] == hf_cfg.hidden_size
        # jitted callable exists and is cached
        assert units._apply is not None
