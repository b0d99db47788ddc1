"""Fidelity metric tests: MCD vs scipy DCT, identity/scale behaviors."""

import numpy as np
import pytest

import jax.numpy as jnp

from latent_diffusion_speech_tpu.ops.metrics import log_spectral_distance, mcd


class TestMCD:
    def test_identity_is_zero(self, rng):
        x = jnp.asarray(rng.standard_normal((50, 128)).astype(np.float32))
        assert float(mcd(x, x)) == pytest.approx(0.0, abs=1e-5)
        assert float(log_spectral_distance(x, x)) == pytest.approx(0.0, abs=1e-5)

    def test_dct_matches_scipy(self, rng):
        from scipy.fft import dct as scipy_dct

        from latent_diffusion_speech_tpu.ops.metrics import _dct2

        x = rng.standard_normal((4, 32)).astype(np.float32)
        mine = np.asarray(_dct2(jnp.asarray(x)))
        ref = scipy_dct(x, type=2, norm="ortho", axis=-1)
        np.testing.assert_allclose(mine, ref, atol=1e-5)

    def test_known_offset(self, rng):
        """A constant offset lives in c0 only -> MCD (coeffs 1..K) unaffected;
        a per-bin ramp does move it."""
        x = jnp.asarray(rng.standard_normal((50, 128)).astype(np.float32))
        np.testing.assert_allclose(float(mcd(x, x + 1.0)), 0.0, atol=1e-4)
        ramp = jnp.linspace(0, 1, 128)[None, :]
        assert float(mcd(x, x + ramp)) > 0.1

    def test_monotone_in_noise(self, rng):
        x = jnp.asarray(rng.standard_normal((50, 128)).astype(np.float32))
        n = jnp.asarray(rng.standard_normal((50, 128)).astype(np.float32))
        small = float(mcd(x, x + 0.01 * n))
        large = float(mcd(x, x + 0.1 * n))
        assert small < large
