"""Codec GAN trainer smoke: D and G steps run, losses finite, checkpoint roundtrip."""

import numpy as np
import pytest

import jax

from latent_diffusion_speech_tpu.models.vaegan import VAEGANConfig
from latent_diffusion_speech_tpu.train.codec_trainer import CodecTrainer

TINY = VAEGANConfig(
    sampling_rate=8000, inter_channels=4, resblock_kernel_sizes=(3,),
    resblock_dilation_sizes=((1, 3),), upsample_rates=(4, 2),
    upsample_initial_channel=8, upsample_kernel_sizes=(8, 4),
)


class TestCodecTrainer:
    def test_adversarial_steps(self, tmp_path, rng):
        trainer = CodecTrainer(
            TINY, expdir=str(tmp_path / "codec"),
            disc_scales=((128, 32, 128),), disc_periods=(2,),
        )
        audio = (rng.standard_normal((2, 512)) * 0.1).astype(np.float32)
        m1 = trainer.train_step(audio, jax.random.PRNGKey(0))
        m2 = trainer.train_step(audio, jax.random.PRNGKey(1))
        for m in (m1, m2):
            assert np.isfinite(m["disc/loss"]) and np.isfinite(m["gen/loss"])
            assert m["gen/kl"] >= -1e-5 and m["gen/mel"] >= 0  # kl >= 0 up to f32 rounding
        assert trainer.step == 2

    def test_checkpoint_roundtrip(self, tmp_path, rng):
        trainer = CodecTrainer(
            TINY, expdir=str(tmp_path / "codec"),
            disc_scales=((128, 32, 128),), disc_periods=(2,),
        )
        audio = (rng.standard_normal((2, 512)) * 0.1).astype(np.float32)
        trainer.train_step(audio, jax.random.PRNGKey(0))
        trainer.save()

        t2 = CodecTrainer(
            TINY, expdir=str(tmp_path / "codec"),
            disc_scales=((128, 32, 128),), disc_periods=(2,),
        )
        assert t2.resume()
        assert t2.step == 1
        a = jax.tree_util.tree_leaves(trainer.gen_params)[0]
        b = jax.tree_util.tree_leaves(t2.gen_params)[0]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_vq_path(self, tmp_path, rng):
        trainer = CodecTrainer(
            TINY, expdir=str(tmp_path / "codec"), use_vq=True, vq_codebook_size=32,
            disc_scales=((128, 32, 128),), disc_periods=(2,),
        )
        audio = (rng.standard_normal((2, 512)) * 0.1).astype(np.float32)
        m = trainer.train_step(audio, jax.random.PRNGKey(0))
        assert np.isfinite(m["gen/loss"])
        assert float(trainer.vq.utilization(trainer.vq_state)) > 0
