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
