"""HuBERT unit encoder: shape/frame-rate contract, masking, units API."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from latent_diffusion_speech_tpu.models.hubert import Hubert, HubertSoft, compute_span_mask


class TestHubert:
    @pytest.fixture(scope="class")
    def model(self):
        m = HubertSoft()
        wav = jnp.zeros((1, 16000))
        params = m.init(jax.random.PRNGKey(0), wav)["params"]
        return m, params

    def test_units_frame_rate(self, model, rng):
        """1 s of 16 kHz audio -> 50 frames of 256-d units (hop 320)."""
        m, params = model
        wav = jnp.asarray(rng.standard_normal((1, 16000)).astype(np.float32) * 0.1)
        units = m.apply({"params": params}, wav, method=m.units)
        assert units.shape == (1, 50, 256)
        assert bool(jnp.isfinite(units).all())

    def test_forward_logits(self, model, rng):
        m, params = model
        wav = jnp.asarray(rng.standard_normal((1, 8000)).astype(np.float32) * 0.1)
        logits, units = m.apply({"params": params}, wav)
        assert logits.shape[-1] == 100
        # cosine/0.1 logits bounded by 10
        assert float(jnp.abs(logits).max()) <= 10.0 + 1e-4

    def test_span_mask(self):
        mask = compute_span_mask(jax.random.PRNGKey(0), (4, 100), 0.8, 10, 2)
        assert mask.shape == (4, 100)
        frac = float(mask.mean())
        assert 0.05 < frac < 0.95

    def test_masked_training_path(self, model, rng):
        m, params = model
        wav = jnp.asarray(rng.standard_normal((2, 8000)).astype(np.float32) * 0.1)
        n_frames = 8000 // 320
        # feature extractor yields (T-400)//320+1-ish frames; mask sized to match encode output
        feats = m.apply({"params": params}, wav, method=lambda s, w: s.feature_extractor(w))
        mask = compute_span_mask(jax.random.PRNGKey(1), (2, feats.shape[1]))
        logits, units = m.apply({"params": params}, wav, span_mask=mask)
        assert bool(jnp.isfinite(logits).all())


class TestHubertImport:
    def test_torch_checkpoint_parity(self, rng):
        """Build a torch model with the bshall layout, import, compare units."""
        torch = pytest.importorskip("torch")
        import torch.nn as tnn

        class TorchHubert(tnn.Module):
            def __init__(self):
                super().__init__()
                self.feature_extractor = tnn.Module()
                specs = [(1, 10, 5), (512, 3, 2), (512, 3, 2), (512, 3, 2),
                         (512, 3, 2), (512, 2, 2), (512, 2, 2)]
                for i, (cin, k, st) in enumerate(specs):
                    setattr(self.feature_extractor, f"conv{i}",
                            tnn.Conv1d(cin if i == 0 else 512, 512, k, st, bias=False))
                self.feature_extractor.norm0 = tnn.GroupNorm(512, 512)
                self.feature_projection = tnn.Module()
                self.feature_projection.norm = tnn.LayerNorm(512)
                self.feature_projection.projection = tnn.Linear(512, 768)
                self.positional_embedding = tnn.Module()
                self.positional_embedding.conv = tnn.utils.parametrizations.weight_norm(
                    tnn.Conv1d(768, 768, 128, padding=64, groups=16), name="weight", dim=2
                )
                self.norm = tnn.LayerNorm(768)
                self.encoder = tnn.TransformerEncoder(
                    tnn.TransformerEncoderLayer(768, 12, 3072, activation="gelu",
                                                batch_first=True, dropout=0.0),
                    12, enable_nested_tensor=False,
                )
                self.proj = tnn.Linear(768, 256)
                self.masked_spec_embed = tnn.Parameter(torch.FloatTensor(768).uniform_())
                self.label_embedding = tnn.Embedding(100, 256)

            def units(self, wav):
                import torch.nn.functional as tF
                wav = tF.pad(wav, (40, 40))
                x = wav[:, None, :]
                x = tF.gelu(self.feature_extractor.norm0(self.feature_extractor.conv0(x)))
                for i in range(1, 7):
                    x = tF.gelu(getattr(self.feature_extractor, f"conv{i}")(x))
                x = x.transpose(1, 2)
                x = self.feature_projection.projection(self.feature_projection.norm(x))
                pe = self.positional_embedding.conv(x.transpose(1, 2))
                x = x + tF.gelu(pe[:, :, :-1]).transpose(1, 2)
                x = self.norm(x)
                x = self.encoder(x)
                return self.proj(x)

        from latent_diffusion_speech_tpu.models.hubert import HubertSoft, hubert_params_from_torch

        tmodel = TorchHubert().eval()
        params = hubert_params_from_torch(tmodel.state_dict())
        wav = rng.standard_normal((1, 8000)).astype(np.float32) * 0.1
        with torch.no_grad():
            ref = tmodel.units(torch.from_numpy(wav)).numpy()
        m = HubertSoft()
        mine = m.apply(
            {"params": jax.tree_util.tree_map(jnp.asarray, params)},
            jnp.asarray(wav), method=m.units,
        )
        assert mine.shape == ref.shape
        np.testing.assert_allclose(np.asarray(mine), ref, atol=5e-4, rtol=1e-3)
