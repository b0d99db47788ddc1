"""Additional GaussianDiffusion / dataset behaviors: shallow diffusion with
fast solvers, aug_mel selection, loader edge cases."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from latent_diffusion_speech_tpu.data import DataLoader, DiffusionDataset
from latent_diffusion_speech_tpu.models.diffusion import GaussianDiffusion


class TestShallowDiffusion:
    def _gd(self):
        return GaussianDiffusion(lambda params, x, t: jnp.zeros_like(x[..., :4]), out_dims=4, pad_multiple=8)

    @pytest.mark.parametrize("method", ["dpm-solver", "unipc", "pndm"])
    def test_fast_solvers_with_k_step(self, method):
        gd = self._gd()
        cond = jnp.zeros((1, 16, 3))
        gt = jnp.ones((1, 16, 4)) * 0.3
        out = gd.sample(
            None, cond, jax.random.PRNGKey(0), method=method, infer_speedup=20,
            gt_spec=gt, k_step=100,
        )
        assert out.shape == (1, 16, 4)
        assert bool(jnp.isfinite(out).all())

    def test_order3_dpmpp_runs(self):
        from latent_diffusion_speech_tpu.models.diffusion.samplers import dpmpp_sample
        from latent_diffusion_speech_tpu.models.diffusion.schedule import NoiseSchedule

        ns = NoiseSchedule(np.linspace(1e-4, 0.02, 1000))
        x = jnp.ones((1, 8, 4))
        out = dpmpp_sample(lambda x, t: jnp.tanh(x), ns, x, steps=8, order=3)
        assert bool(jnp.isfinite(out).all())


class TestDatasetAug:
    @pytest.fixture
    def aug_dir(self, tmp_path, rng):
        root = tmp_path / "train"
        (root / "audio" / "1").mkdir(parents=True)
        (root / "audio" / "1" / "0.wav").write_bytes(b"")
        T = 120
        for kind, scale in [("mel", 1.0), ("aug_mel", 100.0)]:
            d = root / kind / "1"
            d.mkdir(parents=True)
            np.save(d / "0.wav.npy", (rng.standard_normal((T, 8)) * scale).astype(np.float32))
        np.save((root / "units" / "1").mkdir(parents=True) or (root / "units" / "1" / "0.wav.npy"),
                rng.standard_normal((70, 4)).astype(np.float32))
        return root

    def test_use_aug_draws_both(self, aug_dir):
        ds = DiffusionDataset(aug_dir, waveform_sec=1.0, hop_size=2, sample_rate=100,
                              use_aug=True, only_mean=True, clamp=-1, seed=0)
        # draws are (seed, epoch, index)-keyed: the same (epoch, index) always
        # picks the same kind; both kinds appear across epochs
        scales = set()
        for epoch in range(20):
            ds.set_epoch(epoch)
            scales.add(float(np.abs(ds[0]["mel"]).max()) > 20)
        assert scales == {True, False}  # both mel and aug_mel selected over draws
        ds.set_epoch(3)
        a = float(np.abs(ds[0]["mel"]).max()) > 20
        assert a == (float(np.abs(ds[0]["mel"]).max()) > 20)  # repeatable

    def test_loader_keep_last(self, aug_dir):
        ds = DiffusionDataset(aug_dir, waveform_sec=1.0, hop_size=2, sample_rate=100, only_mean=True)
        loader = DataLoader(ds, batch_size=3, drop_last=False, shuffle=False)
        batches = list(loader)
        assert len(batches) == 1
        assert batches[0]["mel"].shape[0] == 1  # the single item kept
