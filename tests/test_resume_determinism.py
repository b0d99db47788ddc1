"""Deterministic resume: a run interrupted at step k and resumed from its
checkpoint produces the SAME parameters as an uninterrupted run.

Three properties compose to make this hold (none exist in the reference):
- the loader's per-epoch shuffle is a pure function of (seed, epoch) and
  supports mid-epoch skip (`DataLoader.set_epoch` / `skip_batches`);
- the per-step training RNG is `fold_in(seed_key, step)`, not a split chain;
- checkpoints carry a `model_<step>.meta.json` sidecar with the data-stream
  position, restored by `Trainer.resume()`.
"""

import numpy as np
import pytest

import jax

from latent_diffusion_speech_tpu.config import Config
from latent_diffusion_speech_tpu.data import DataLoader
from latent_diffusion_speech_tpu.models.diffusion import Unit2MelConfig
from latent_diffusion_speech_tpu.train import DiffusionTrainer, LMTrainer, save_checkpoint
from latent_diffusion_speech_tpu.train.checkpoint import load_checkpoint_meta

UNIT_DIM = 8
MEL_DIM = 4

TINY_MODEL = Unit2MelConfig(
    input_channel=UNIT_DIM, n_spk=4, out_dims=MEL_DIM, n_hidden=8,
    block_out_channels=(8, 8), n_heads=2, timesteps=20, k_step=20,
)


class _DetDataset:
    """Deterministic items (no crop/latent sampling) so any divergence the
    test sees comes from the loader/trainer, not the data."""

    def __init__(self, n=12, T=16):
        g = np.random.default_rng(0)
        self.items = [
            {
                "units": g.standard_normal((T, UNIT_DIM)).astype(np.float32),
                "mel": g.standard_normal((T, MEL_DIM)).astype(np.float32),
                "spk_id": np.array([1 + (i % 2)], np.int32),
            }
            for i in range(n)
        ]

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


def _cfg(tmp_path) -> Config:
    cfg = Config()
    cfg.common.n_spk = 4
    cfg.diffusion.train.batch_size = 4
    cfg.diffusion.train.expdir = str(tmp_path / "exp")
    cfg.diffusion.train.warm_up_steps = 2
    cfg.diffusion.train.save_opt = True  # optimizer moments must survive resume
    cfg.diffusion.train.interval_val = 10_000  # only the max_steps save fires
    cfg.diffusion.train.interval_log = 10_000
    return cfg


class TestLoaderDeterminism:
    def _index_stream(self, loader, epochs):
        out = []
        for e in range(epochs):
            loader.set_epoch(e)
            out.append([b["i"][:, 0].tolist() for b in loader])
        return out

    def _loader(self, n=12):
        class IdxDataset:
            def __len__(self):
                return n

            def __getitem__(self, i):
                return {"i": np.array([i])}

        return DataLoader(IdxDataset(), batch_size=3, shuffle=True, seed=5)

    def test_epoch_keyed_shuffle_reproducible(self):
        a = self._index_stream(self._loader(), 3)
        b = self._index_stream(self._loader(), 3)
        assert a == b
        assert a[0] != a[1]  # epochs differ

    def test_skip_batches_resumes_mid_epoch(self):
        full = self._index_stream(self._loader(), 1)[0]
        lo = self._loader()
        lo.set_epoch(0)
        lo.skip_batches(2)
        tail = [b["i"][:, 0].tolist() for b in lo]
        assert tail == full[2:]
        # skip is consumed: the next iteration is complete again
        assert [b["i"][:, 0].tolist() for b in lo] == full


class TestDatasetKeyedDraws:
    def test_item_draws_keyed_on_epoch_and_index(self, tmp_path):
        from latent_diffusion_speech_tpu.data import DiffusionDataset

        g = np.random.default_rng(0)
        root = tmp_path / "train"
        (root / "audio" / "1").mkdir(parents=True)
        for n in range(2):
            (root / "audio" / "1" / f"{n}.wav").write_bytes(b"")
            for kind, arr in [
                ("mel", g.standard_normal((80, 8)).astype(np.float32)),
                ("units", g.standard_normal((40, 4)).astype(np.float32)),
            ]:
                (root / kind / "1").mkdir(parents=True, exist_ok=True)
                np.save(root / kind / "1" / f"{n}.wav.npy", arr)

        ds = DiffusionDataset(root, waveform_sec=1.0, hop_size=2, sample_rate=100, n_spk=2)
        a = ds[0]
        b = ds[0]  # same (epoch, index) -> identical crop + latent noise
        np.testing.assert_array_equal(a["mel"], b["mel"])
        ds.set_epoch(1)
        c = ds[0]  # new epoch -> a fresh draw
        assert not np.array_equal(a["mel"], c["mel"])
        ds.set_epoch(0)
        np.testing.assert_array_equal(a["mel"], ds[0]["mel"])


class TestThreadedItemLoading:
    def test_threaded_loader_bitwise_equals_serial(self, tmp_path):
        """num_threads > 1 must not change the stream: keyed draws make
        parallel item assembly bit-deterministic."""
        from latent_diffusion_speech_tpu.data import DiffusionDataset

        g = np.random.default_rng(0)
        root = tmp_path / "train"
        for spk in ("1", "2"):
            (root / "audio" / spk).mkdir(parents=True)
            for n in range(3):
                (root / "audio" / spk / f"{n}.wav").write_bytes(b"")
                for kind, arr in [
                    ("mel", g.standard_normal((80, 8)).astype(np.float32)),
                    ("units", g.standard_normal((40, 4)).astype(np.float32)),
                ]:
                    (root / kind / spk).mkdir(parents=True, exist_ok=True)
                    np.save(root / kind / spk / f"{n}.wav.npy", arr)

        def stream(n_threads):
            ds = DiffusionDataset(root, waveform_sec=1.0, hop_size=2, sample_rate=100, n_spk=2)
            lo = DataLoader(ds, batch_size=2, shuffle=True, seed=4, num_threads=n_threads)
            lo.set_epoch(1)
            return list(lo)

        for a, b in zip(stream(1), stream(4)):
            for k in a:
                np.testing.assert_array_equal(a[k], b[k])


class TestCheckpointMeta:
    def test_meta_sidecar_roundtrip_and_retention(self, tmp_path):
        params = {"w": np.ones((2, 2), np.float32)}
        for step in (10, 20, 30):
            save_checkpoint(tmp_path, step, params, keep=2, meta={"epoch": step // 10, "batch_in_epoch": step})
        assert load_checkpoint_meta(tmp_path) == {"epoch": 3, "batch_in_epoch": 30}
        assert load_checkpoint_meta(tmp_path, step=20)["epoch"] == 2
        # retention deletes sidecars with their checkpoints
        assert not (tmp_path / "model_10.meta.json").exists()
        assert load_checkpoint_meta(tmp_path / "nope") == {}


class TestTrainerResumeDeterminism:
    def test_interrupted_run_matches_uninterrupted(self, tmp_path):
        ds = _DetDataset()

        def loader():
            return DataLoader(ds, batch_size=4, shuffle=True, seed=9)

        # uninterrupted: 6 steps (12 items / B=4 = 3 batches/epoch -> 2 epochs)
        cfg_a = _cfg(tmp_path / "a")
        t_a = DiffusionTrainer(cfg_a, model_cfg=TINY_MODEL)
        t_a.train(loader(), max_steps=6)
        assert t_a.step == 6

        # interrupted at step 2 (mid-epoch), resumed in a fresh trainer
        cfg_b = _cfg(tmp_path / "b")
        t_b1 = DiffusionTrainer(cfg_b, model_cfg=TINY_MODEL)
        t_b1.train(loader(), max_steps=2)
        assert t_b1.step == 2
        t_b2 = DiffusionTrainer(cfg_b, model_cfg=TINY_MODEL)
        assert t_b2.resume()
        assert (t_b2._epoch, t_b2._batch_in_epoch) == (0, 2)
        t_b2.train(loader(), max_steps=6)
        assert t_b2.step == 6

        for a, b in zip(
            jax.tree_util.tree_leaves(t_a.system.params),
            jax.tree_util.tree_leaves(t_b2.system.params),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)


class TestValidationDuringTrain:
    def test_interval_val_with_val_loader_does_not_crash(self, tmp_path):
        """Regression: the validation key was fold_in(key, -step), which
        raises OverflowError (uint32) under numpy>=2 — training died at the
        first interval_val whenever a val_loader was passed."""
        ds = _DetDataset()
        cfg = _cfg(tmp_path)
        cfg.diffusion.train.interval_val = 2
        trainer = DiffusionTrainer(cfg, model_cfg=TINY_MODEL)
        loader = DataLoader(ds, batch_size=4, shuffle=True, seed=9)
        val_loader = DataLoader(ds, batch_size=4, shuffle=False, seed=9)
        trainer.train(loader, val_loader=val_loader, max_steps=2)
        assert trainer.step == 2


class TestLMTrainerResumeDeterminism:
    @pytest.mark.slow
    def test_interrupted_lm_run_matches_uninterrupted(self, tmp_path):
        from latent_diffusion_speech_tpu.models.lm import RoformerConfig
        from latent_diffusion_speech_tpu.models.lm.roformer import StackConfig

        tiny_lm = RoformerConfig(
            encoder=StackConfig(hidden_size=16, num_attention_heads=2,
                                num_hidden_layers=1, intermediate_size=16,
                                hidden_dropout_prob=0.0),
            decoder=StackConfig(hidden_size=16, num_attention_heads=2,
                                num_hidden_layers=1, intermediate_size=16,
                                hidden_dropout_prob=0.0),
            semantic_kmeans_num=16,
            n_spk=2,
        )

        g = np.random.default_rng(1)
        items = [
            {
                "phone": g.integers(1, 20, (10,)).astype(np.int32),
                "tone": g.integers(0, 4, (10,)).astype(np.int32),
                "semantic": g.integers(0, 16, (14,)).astype(np.int32),
                "spk_id": np.full((10,), 1, np.int32),
            }
            for _ in range(8)
        ]

        from latent_diffusion_speech_tpu.data import collate_text_batch

        class LMDataset:
            def __len__(self):
                return len(items)

            def __getitem__(self, i):
                return items[i]

        def collate(batch):
            return collate_text_batch(batch, phone_pad=tiny_lm.phone_pad,
                                      semantic_pad=tiny_lm.semantic_pad, pad_multiple=8)

        def loader():
            return DataLoader(LMDataset(), batch_size=4, collate=collate, shuffle=True, seed=2)

        def cfg(path):
            c = Config()
            c.common.n_spk = 2
            c.text2semantic.train.batch_size = 4
            c.text2semantic.train.expdir = str(path / "exp_lm")
            c.text2semantic.train.warm_up_steps = 2
            c.text2semantic.train.save_opt = True
            c.text2semantic.train.interval_val = 10_000
            c.text2semantic.train.interval_log = 10_000
            return c

        t_a = LMTrainer(cfg(tmp_path / "a"), lm_cfg=tiny_lm)
        t_a.train(loader(), max_steps=5)
        assert t_a.step == 5

        cfg_b = cfg(tmp_path / "b")
        t_b1 = LMTrainer(cfg_b, lm_cfg=tiny_lm)
        t_b1.train(loader(), max_steps=3)
        t_b2 = LMTrainer(cfg_b, lm_cfg=tiny_lm)
        assert t_b2.resume()
        assert (t_b2._epoch, t_b2._batch_in_epoch) == (1, 1)
        t_b2.train(loader(), max_steps=5)

        for a, b in zip(
            jax.tree_util.tree_leaves(t_a.system.params),
            jax.tree_util.tree_leaves(t_b2.system.params),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)
