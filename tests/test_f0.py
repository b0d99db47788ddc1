"""YIN f0 extraction: tone accuracy, voicing decisions, frame convention."""

import numpy as np
import pytest

import jax.numpy as jnp

from latent_diffusion_speech_tpu.ops.f0 import extract_f0


def _tone(freq, sr=44100, seconds=1.0, amp=0.5):
    t = np.arange(int(sr * seconds)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


class TestF0:
    @pytest.mark.parametrize("freq", [110.0, 220.0, 440.0, 880.0])
    def test_pure_tone_accuracy(self, freq):
        audio = _tone(freq)
        f0, voiced = extract_f0(jnp.asarray(audio))
        mid = np.asarray(f0[10:-10])
        v = np.asarray(voiced[10:-10])
        assert v.mean() > 0.9
        rel_err = np.abs(mid[v] - freq) / freq
        assert np.median(rel_err) < 0.01

    def test_silence_unvoiced(self):
        f0, voiced = extract_f0(jnp.zeros(44100))
        assert not bool(np.asarray(voiced).any())
        assert float(np.abs(np.asarray(f0)).max()) == 0.0

    def test_noise_mostly_unvoiced(self, rng):
        audio = rng.standard_normal(44100).astype(np.float32) * 0.1
        _, voiced = extract_f0(jnp.asarray(audio))
        assert np.asarray(voiced).mean() < 0.5

    def test_frame_count_convention(self):
        audio = _tone(220, seconds=0.5)
        f0, _ = extract_f0(jnp.asarray(audio), hop_size=512)
        assert f0.shape == (len(audio) // 512 + 1,)

    def test_batched(self):
        batch = jnp.stack([jnp.asarray(_tone(220)), jnp.asarray(_tone(440))])
        f0, voiced = extract_f0(batch)
        assert f0.shape[0] == 2
        m0 = np.median(np.asarray(f0[0])[np.asarray(voiced[0])])
        m1 = np.median(np.asarray(f0[1])[np.asarray(voiced[1])])
        assert abs(m0 - 220) < 5 and abs(m1 - 440) < 5

    def test_mixed_voicing(self):
        audio = np.concatenate([_tone(220, seconds=0.4), np.zeros(int(44100 * 0.4), np.float32)])
        f0, voiced = extract_f0(jnp.asarray(audio))
        n = len(f0)
        assert np.asarray(voiced[: n // 3]).mean() > 0.8
        assert np.asarray(voiced[-n // 3 :]).mean() < 0.2
