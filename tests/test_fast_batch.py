"""Native fast-path batch assembly vs the reference-semantics slow path."""

import numpy as np
import pytest

from latent_diffusion_speech_tpu.data import DiffusionDataset
from latent_diffusion_speech_tpu.data.native_loader import native_available
from latent_diffusion_speech_tpu.ops.alignment import units_forced_alignment

pytestmark = pytest.mark.skipif(not native_available(), reason="no native toolchain")

MEL_DIM = 4
UNIT_DIM = 8


@pytest.fixture
def pipeline_dir(tmp_path, rng):
    root = tmp_path / "train"
    for spk in ("1", "2"):
        for n in range(2):
            (root / "audio" / spk).mkdir(parents=True, exist_ok=True)
            (root / "audio" / spk / f"{n}.wav").write_bytes(b"")
            T = 120
            for kind, arr in [
                ("mel", rng.standard_normal((T, 2 * MEL_DIM)).astype(np.float32)),
                ("units", rng.standard_normal((int(T * 0.58), UNIT_DIM)).astype(np.float32)),
            ]:
                p = root / kind / spk
                p.mkdir(parents=True, exist_ok=True)
                np.save(p / f"{n}.wav.npy", arr)
    return root


class TestFastBatch:
    def _dataset(self, root, seed=0):
        return DiffusionDataset(
            root, waveform_sec=1.0, hop_size=2, sample_rate=100,  # 50-frame crops
            n_spk=4, only_mean=True, clamp=-1, seed=seed,
        )

    def test_matches_manual_computation(self, pipeline_dir):
        ds = self._dataset(pipeline_dir, seed=3)
        batch = ds.fast_batch([0, 1, 2, 3])
        assert batch["mel"].shape == (4, 50, MEL_DIM)
        assert batch["units"].shape == (4, 50, UNIT_DIM)

        # replay the (seed, epoch, index)-keyed rng to recover the chosen starts
        names = [ds._fast_paths[i % len(ds._fast_paths)] for i in [0, 1, 2, 3]]
        for b, name in enumerate(names):
            mel_rows, _, unit_rows, _ = ds._probed[name]
            s = int(np.random.default_rng([3 + 0, 0, b]).integers(0, max(mel_rows - 50, 1)))
            mel_full = np.load(pipeline_dir / "mel" / (name + ".npy"))
            expect_mel = mel_full[s : s + 50, :MEL_DIM]  # only_mean
            np.testing.assert_allclose(batch["mel"][b], expect_mel, atol=1e-6)

            units_full = np.load(pipeline_dir / "units" / (name + ".npy"))
            aligned = np.asarray(units_forced_alignment(units_full, n_frames=mel_rows, mode="nearest"))
            np.testing.assert_allclose(batch["units"][b], aligned[s : s + 50], atol=1e-6)

    def test_speaker_ids(self, pipeline_dir):
        ds = self._dataset(pipeline_dir)
        batch = ds.fast_batch([0, 1, 2, 3])
        assert set(np.asarray(batch["spk_id"]).flatten()) <= {1, 2}

    def test_latent_sampling_path(self, pipeline_dir):
        ds = DiffusionDataset(
            pipeline_dir, waveform_sec=1.0, hop_size=2, sample_rate=100,
            n_spk=4, only_mean=False, clamp=0.5,
        )
        batch = ds.fast_batch([0, 1])
        assert float(np.abs(batch["mel"]).max()) <= 0.5 + 1e-6
