"""XLSR / wav2vec 2.0: flax vs HF-torch parity (VERDICT round-1 item 7).

The reference loads `xlsr_53_56k.pt` through fairseq and calls
`extract_features()["x"]` (tools/tools.py:144-163); HF's converted
`Wav2Vec2Model` (do_stable_layer_norm=True, feat_extract_norm='layer') is the
equivalent public implementation and serves as the parity oracle here.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from latent_diffusion_speech_tpu.models.wav2vec2 import (
    Wav2Vec2Config,
    Wav2Vec2Encoder,
    wav2vec2_params_from_fairseq,
    wav2vec2_params_from_hf,
)


def small_hf_model(seed=0):
    from transformers import Wav2Vec2Config as HFConfig
    from transformers import Wav2Vec2Model

    torch.manual_seed(seed)
    cfg = HFConfig(
        hidden_size=64,
        num_hidden_layers=2,
        intermediate_size=128,
        num_attention_heads=4,
        conv_dim=[32, 32, 32],
        conv_kernel=[10, 3, 2],
        conv_stride=[5, 2, 2],
        conv_bias=True,
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        do_stable_layer_norm=True,
        feat_extract_norm="layer",
        hidden_dropout=0.0,
        attention_dropout=0.0,
        activation_dropout=0.0,
        feat_proj_dropout=0.0,
        final_dropout=0.0,
        layerdrop=0.0,
        apply_spec_augment=False,
    )
    return Wav2Vec2Model(cfg).eval(), cfg


class TestWav2Vec2Parity:
    def test_forward_matches_hf(self):
        hf, hf_cfg = small_hf_model()
        cfg = Wav2Vec2Config.from_hf(hf_cfg)
        params = wav2vec2_params_from_hf(hf.state_dict(), cfg)
        model = Wav2Vec2Encoder(cfg)

        rng = np.random.default_rng(0)
        wav = (rng.standard_normal((2, 3200)) * 0.1).astype(np.float32)
        # HF normalization lives in the processor; replicate it for the oracle
        normed = (wav - wav.mean(-1, keepdims=True)) / np.sqrt(wav.var(-1, keepdims=True) + 1e-7)
        with torch.no_grad():
            ref = hf(input_values=torch.from_numpy(normed)).last_hidden_state.numpy()
        got = np.asarray(
            model.apply({"params": jax.tree_util.tree_map(jnp.asarray, params)}, jnp.asarray(wav))
        )
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)

    def test_fairseq_key_translation(self):
        """A fairseq-layout state dict (synthesized from the HF one by inverse
        renaming) imports to identical params."""
        hf, hf_cfg = small_hf_model(seed=1)
        cfg = Wav2Vec2Config.from_hf(hf_cfg)
        hf_state = hf.state_dict()
        want = wav2vec2_params_from_hf(hf_state, cfg)

        fs_state = {}
        for k, v in hf_state.items():
            fk = k
            if k.startswith("feature_extractor.conv_layers."):
                parts = k.split(".")
                i, rest = parts[2], ".".join(parts[3:])
                if rest.startswith("conv."):
                    fk = f"feature_extractor.conv_layers.{i}.0.{rest[5:]}"
                elif rest.startswith("layer_norm."):
                    fk = f"feature_extractor.conv_layers.{i}.2.1.{rest[11:]}"
            elif k.startswith("feature_projection.projection."):
                fk = k.replace("feature_projection.projection", "post_extract_proj")
            elif k.startswith("feature_projection.layer_norm."):
                fk = k.replace("feature_projection.layer_norm.", "layer_norm.")
            elif k.startswith("encoder.pos_conv_embed.conv"):
                fk = k.replace("encoder.pos_conv_embed.conv", "encoder.pos_conv.0")
            elif k.startswith("encoder.layers."):
                fk = (k.replace(".attention.", ".self_attn.")
                       .replace(".layer_norm.", ".self_attn_layer_norm.")
                       .replace(".feed_forward.intermediate_dense", ".fc1")
                       .replace(".feed_forward.output_dense", ".fc2"))
            fs_state[fk] = v
        fs_state["quantizer.vars"] = torch.zeros(1)  # pretraining head: dropped
        got = wav2vec2_params_from_fairseq(fs_state, cfg)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)), want, got
        )

    def test_units_registry(self):
        from latent_diffusion_speech_tpu.models.units import UnitsEncoder, XLSRUnits

        hf, _ = small_hf_model(seed=2)
        enc = UnitsEncoder("xlsr_53_56k", hf_model=hf, dtype=jnp.float32)
        assert isinstance(enc.model, XLSRUnits)
        wav = jnp.zeros((1, 8000))
        out = enc.encode(wav, 16000, pad_to_bucket=False)
        assert out.shape[0] == 1 and out.shape[-1] == 64
