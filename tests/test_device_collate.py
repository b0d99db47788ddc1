"""Device-side batch finalization (device_collate): the host ships raw
cropped features and the jitted train step finishes the batch on device.

Parity contract: with only_mean=True (no latent noise draw anywhere), the
raw path finalized on device must reproduce the host fast path EXACTLY —
same crops (same (seed, epoch, index)-keyed draws), same nearest alignment,
same mel — so the host-collated and device-collated train steps compute the
same loss from the same rng.  Reference semantics being reproduced:
`diffusion/data_loaders.py:180-196` (latent sampling + clamp) and the
units-to-mel-grid nearest alignment.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latent_diffusion_speech_tpu.data import DataLoader, DiffusionDataset
from latent_diffusion_speech_tpu.data.native_loader import native_available

pytestmark = pytest.mark.skipif(not native_available(), reason="no native toolchain")

MEL_DIM = 4
UNIT_DIM = 8


@pytest.fixture
def pipeline_dir(tmp_path, rng):
    root = tmp_path / "train"
    for spk in ("1", "2"):
        for n in range(3):
            (root / "audio" / spk).mkdir(parents=True, exist_ok=True)
            (root / "audio" / spk / f"{n}.wav").write_bytes(b"")
            T = 120 + 10 * n
            for kind, arr in [
                ("mel", rng.standard_normal((T, 2 * MEL_DIM)).astype(np.float32)),
                ("units", rng.standard_normal((int(T * 0.58), UNIT_DIM)).astype(np.float32)),
            ]:
                p = root / kind / spk
                p.mkdir(parents=True, exist_ok=True)
                np.save(p / f"{n}.wav.npy", arr)
    return root


def _dataset(root, seed=0, **kw):
    kw.setdefault("only_mean", True)
    kw.setdefault("clamp", -1)
    return DiffusionDataset(
        root, waveform_sec=1.0, hop_size=2, sample_rate=100,  # 50-frame crops
        n_spk=4, seed=seed, **kw,
    )


def _finalize_numpy(raw, only_mean=True, clamp=-1.0):
    """Reimplementation of the trainer's device finalization in numpy."""
    units = np.take_along_axis(
        np.asarray(raw["units_raw"], np.float32), raw["unit_idx"][..., None], axis=1
    )
    m, logs = np.split(raw["mel_stats"], 2, axis=-1)
    mel = m  # only_mean
    if clamp and clamp > 0:
        mel = np.clip(mel, -clamp, clamp)
    return units, mel


class TestRawParity:
    def test_raw_finalized_equals_host_fast_batch(self, pipeline_dir):
        idx = [0, 1, 2, 3, 4, 5]
        host = _dataset(pipeline_dir, seed=3).fast_batch(idx)
        ds_raw = _dataset(pipeline_dir, seed=3, device_collate=True)
        raw = ds_raw.fast_batch(idx)
        assert raw["units_raw"].shape[1] == ds_raw._u_fixed
        units, mel = _finalize_numpy(raw)
        np.testing.assert_array_equal(mel, host["mel"])
        np.testing.assert_array_equal(units, host["units"])
        np.testing.assert_array_equal(raw["spk_id"], host["spk_id"])

    def test_epoch_changes_crops_deterministically(self, pipeline_dir):
        ds = _dataset(pipeline_dir, seed=1, device_collate=True)
        a = ds.fast_batch([0, 1])
        ds.set_epoch(5)
        b = ds.fast_batch([0, 1])
        ds2 = _dataset(pipeline_dir, seed=1, device_collate=True)
        ds2.set_epoch(5)
        b2 = ds2.fast_batch([0, 1])
        assert not np.array_equal(a["mel_stats"], b["mel_stats"])
        np.testing.assert_array_equal(b["mel_stats"], b2["mel_stats"])
        np.testing.assert_array_equal(b["unit_idx"], b2["unit_idx"])

    def test_static_units_shape_across_batches(self, pipeline_dir):
        ds = _dataset(pipeline_dir, device_collate=True)
        shapes = set()
        for e in range(3):
            ds.set_epoch(e)
            shapes.add(ds.fast_batch([0, 1, 2])["units_raw"].shape)
        assert len(shapes) == 1  # one compiled step, ever

    def test_transfer_dtype_bf16(self, pipeline_dir):
        import ml_dtypes

        ds = _dataset(pipeline_dir, device_collate=True, transfer_dtype="bfloat16")
        raw = ds.fast_batch([0, 1])
        assert raw["units_raw"].dtype == ml_dtypes.bfloat16
        assert raw["mel_stats"].dtype == np.float32  # target precision kept
        # bf16 is a pure narrowing of the same values
        host = _dataset(pipeline_dir, device_collate=True).fast_batch([0, 1])
        np.testing.assert_allclose(
            np.asarray(raw["units_raw"], np.float32), host["units_raw"],
            rtol=8e-3, atol=8e-3,
        )
        # and the fused C++ converting read is BIT-identical to the numpy
        # astype of the f32 read (both round-to-nearest-even)
        np.testing.assert_array_equal(
            raw["units_raw"].view(np.uint16),
            host["units_raw"].astype(ml_dtypes.bfloat16).view(np.uint16),
        )

    def test_transfer_dtype_accepts_type_object(self, pipeline_dir):
        # the documented alternative form: passing ml_dtypes.bfloat16 itself
        # (not a str) must normalize to np.dtype and hit the fused-read path
        import ml_dtypes

        ds = _dataset(
            pipeline_dir, device_collate=True, transfer_dtype=ml_dtypes.bfloat16
        )
        assert ds.transfer_dtype == np.dtype(ml_dtypes.bfloat16)
        raw = ds.fast_batch([0, 1])
        assert raw["units_raw"].dtype == ml_dtypes.bfloat16


class TestTrainerIntegration:
    def _trainer(self, tmp_path, only_mean=True):
        from latent_diffusion_speech_tpu.config import Config
        from latent_diffusion_speech_tpu.models.diffusion import Unit2MelConfig
        from latent_diffusion_speech_tpu.train import DiffusionTrainer

        cfg = Config()
        cfg.common.n_spk = 4
        cfg.common.vocoder.only_mean = only_mean
        cfg.common.vocoder.clamp = -1.0
        cfg.diffusion.train.expdir = str(tmp_path / "exp")
        cfg.diffusion.train.interval_val = 10_000
        model_cfg = Unit2MelConfig(
            input_channel=UNIT_DIM, n_spk=4, out_dims=MEL_DIM, n_hidden=8,
            block_out_channels=(8, 8), n_heads=2, timesteps=20, k_step=20,
        )
        return DiffusionTrainer(cfg, model_cfg=model_cfg)

    def test_raw_step_equals_host_step(self, pipeline_dir, tmp_path):
        """With only_mean (no latent draw), the device-collated step must
        produce the SAME loss as the host-collated step from the same rng."""
        idx = [0, 1]
        host = _dataset(pipeline_dir, seed=3).fast_batch(idx)
        raw = _dataset(pipeline_dir, seed=3, device_collate=True).fast_batch(idx)
        rng = jax.random.PRNGKey(7)

        t1 = self._trainer(tmp_path)
        m_host = t1.train_step(t1.device_put_batch(host), rng)
        t2 = self._trainer(tmp_path)
        m_raw = t2.train_step(t2.device_put_batch(raw), rng)
        np.testing.assert_allclose(
            float(m_host["loss"]), float(m_raw["loss"]), rtol=1e-6
        )

    def test_sampled_latent_step_runs(self, pipeline_dir, tmp_path):
        """only_mean=False: the latent is sampled on device from the step rng
        (a different draw than the host path — equality is not expected, only
        a finite loss and rng-determinism)."""
        raw = _dataset(
            pipeline_dir, seed=3, device_collate=True, only_mean=False
        ).fast_batch([0, 1])
        tr = self._trainer(tmp_path, only_mean=False)
        m1 = tr.train_step(tr.device_put_batch(raw), jax.random.PRNGKey(0))
        assert np.isfinite(float(m1["loss"]))
        tr2 = self._trainer(tmp_path, only_mean=False)
        m2 = tr2.train_step(tr2.device_put_batch(raw), jax.random.PRNGKey(0))
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)

    def test_loader_end_to_end(self, pipeline_dir, tmp_path):
        ds = _dataset(pipeline_dir, device_collate=True, transfer_dtype="bfloat16")
        tr = self._trainer(tmp_path)
        loader = DataLoader(ds, batch_size=2, prefetch=1,
                            device_put=tr.device_put_batch, seed=0)
        tr.train(loader, max_steps=2)
        assert tr.step == 2
