"""DataLoader host-parallelism + batching strategies.

- length_sorted: pool-local sort by dataset.item_lengths() — same items per
  epoch, deterministic from (seed, epoch), pad waste collapses vs shuffled
  batching (the TPU-side counterpart of the reference's flash-attn varlen
  unpadding, text2semantic/roformer/roformer_flash_attn.py:110-169).
- num_workers > 0: N spawn processes each assemble whole batches (the
  counterpart of the reference torch DataLoader `num_workers`,
  diffusion/data_loaders.py:30-37); batch ORDER and CONTENT must be
  identical to the in-process path.
"""

import numpy as np
import pytest

from latent_diffusion_speech_tpu.data import DataLoader
from latent_diffusion_speech_tpu.data.lm_dataset import (
    TextDataset,
    collate_text_batch,
)

BOS, EOS, PAD = 4096, 4097, 4098


@pytest.fixture
def lm_dir(tmp_path, rng):
    root = tmp_path / "lm"
    (root / "utt" / "1").mkdir(parents=True)
    (root / "semantic_token" / "1").mkdir(parents=True)
    # wide length spread: 20..300 semantic tokens
    for i in range(24):
        n_ph = 10 + (i * 7) % 30
        n_sem = 20 + (i * 37) % 280
        utt = np.empty(4, object)
        utt[0] = rng.integers(1, 50, n_ph).astype(np.int64)
        utt[1] = rng.integers(0, 5, n_ph).astype(np.int64)
        utt[2] = np.zeros(n_ph, np.int64)
        utt[3] = np.ones(n_ph, np.int64)
        np.save(root / "utt" / "1" / f"u{i}.npy", utt, allow_pickle=True)
        np.save(
            root / "semantic_token" / "1" / f"u{i}.npy",
            rng.integers(0, 4096, n_sem).astype(np.int64),
        )
    return root


def _collate(items):
    return collate_text_batch(items, phone_pad=0, semantic_pad=PAD)


class TestLengthSorted:
    def test_item_lengths_match_items(self, lm_dir):
        ds = TextDataset(lm_dir, BOS, EOS)
        lens = ds.item_lengths()
        for i in range(len(ds)):
            assert lens[i] == len(ds[i]["semantic"])

    def test_epoch_covers_all_items_deterministically(self, lm_dir):
        ds = TextDataset(lm_dir, BOS, EOS)
        mk = lambda: DataLoader(
            ds, batch_size=4, collate=_collate, seed=3, length_sorted=True,
            pool_factor=2, num_threads=1,
        )
        a = [b["semantic"] for b in mk()]
        b = [b["semantic"] for b in mk()]
        assert len(a) == len(ds) // 4
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)
        # different epoch -> different batch composition
        l2 = mk()
        l2.set_epoch(1)
        c = [b["semantic"].shape for b in l2]
        assert len(c) == len(a)

    def test_padding_reduced_vs_shuffled(self, lm_dir):
        ds = TextDataset(lm_dir, BOS, EOS)

        def pad_frac(loader):
            pad = tot = 0
            for b in loader:
                mask = b["attention_mask"]
                tot += mask.size
                pad += mask.size - mask.sum()
            return pad / tot

        shuffled = pad_frac(
            DataLoader(ds, batch_size=4, collate=_collate, seed=0, num_threads=1)
        )
        bucketed = pad_frac(
            DataLoader(
                ds, batch_size=4, collate=_collate, seed=0, length_sorted=True,
                pool_factor=6, num_threads=1,
            )
        )
        assert bucketed < shuffled * 0.75, (bucketed, shuffled)

    def test_resume_skip_replays(self, lm_dir):
        ds = TextDataset(lm_dir, BOS, EOS)
        mk = lambda: DataLoader(
            ds, batch_size=4, collate=_collate, seed=1, length_sorted=True,
            pool_factor=3, num_threads=1,
        )
        full = [b["semantic"] for b in mk()]
        resumed = mk()
        resumed.skip_batches(2)
        rest = [b["semantic"] for b in resumed]
        assert len(rest) == len(full) - 2
        for x, y in zip(full[2:], rest):
            np.testing.assert_array_equal(x, y)


class TestProcessWorkers:
    def test_batches_identical_to_inprocess(self, lm_dir):
        ds = TextDataset(lm_dir, BOS, EOS)
        base = DataLoader(ds, batch_size=4, collate=_collate, seed=5, num_threads=1)
        proc = DataLoader(ds, batch_size=4, collate=_collate, seed=5, num_workers=2)
        try:
            got = list(proc)
            want = list(base)
            assert len(got) == len(want)
            for g, w in zip(got, want):
                assert set(g) == set(w)
                for k in w:
                    np.testing.assert_array_equal(g[k], w[k])
        finally:
            proc.close()

    def test_combines_with_length_sorted(self, lm_dir):
        ds = TextDataset(lm_dir, BOS, EOS)
        proc = DataLoader(
            ds, batch_size=4, collate=_collate, seed=5, num_workers=2,
            length_sorted=True, pool_factor=3,
        )
        base = DataLoader(
            ds, batch_size=4, collate=_collate, seed=5, num_threads=1,
            length_sorted=True, pool_factor=3,
        )
        try:
            for g, w in zip(proc, base):
                np.testing.assert_array_equal(g["semantic"], w["semantic"])
        finally:
            proc.close()

    def test_set_epoch_reaches_workers(self, tmp_path, rng):
        """Round-5 review finding: the dataset pickles into the pool ONCE,
        so the parent's set_epoch never reached workers — every epoch
        replayed epoch-0 augmentation draws.  The epoch now rides with each
        job; worker batches must match the in-process path epoch by epoch."""
        pytest.importorskip("ml_dtypes")
        from latent_diffusion_speech_tpu.data import DiffusionDataset
        from latent_diffusion_speech_tpu.data.native_loader import native_available

        if not native_available():
            pytest.skip("no native toolchain")
        root = tmp_path / "train"
        for n in range(6):
            (root / "audio" / "1").mkdir(parents=True, exist_ok=True)
            (root / "audio" / "1" / f"{n}.wav").write_bytes(b"")
            T = 120 + 10 * n
            for kind, arr in [
                ("mel", rng.standard_normal((T, 8)).astype(np.float32)),
                ("units", rng.standard_normal((int(T * 0.58), 8)).astype(np.float32)),
            ]:
                (root / kind / "1").mkdir(parents=True, exist_ok=True)
                np.save(root / kind / "1" / f"{n}.wav.npy", arr)
        mk = lambda **kw: DataLoader(
            DiffusionDataset(
                root, waveform_sec=1.0, hop_size=2, sample_rate=100, n_spk=1,
                seed=0, only_mean=True, clamp=-1,
            ),
            batch_size=3, seed=2, **kw,
        )
        proc, base = mk(num_workers=1), mk(num_threads=1)
        try:
            per_epoch = []
            for epoch in (0, 1, 2):
                proc.set_epoch(epoch)
                base.set_epoch(epoch)
                got, want = list(proc), list(base)
                for g, w in zip(got, want):
                    for k in w:
                        np.testing.assert_array_equal(
                            np.asarray(g[k]), np.asarray(w[k]))
                per_epoch.append(np.concatenate(
                    [np.asarray(b["mel"]).ravel() for b in got]))
            # and the epochs genuinely differ (fresh crops, not a replay)
            assert not np.array_equal(per_epoch[0], per_epoch[1])
        finally:
            proc.close()

    def test_diffusion_fast_batch_in_workers(self, tmp_path, rng):
        pytest.importorskip("ml_dtypes")
        from latent_diffusion_speech_tpu.data import DiffusionDataset
        from latent_diffusion_speech_tpu.data.native_loader import native_available

        if not native_available():
            pytest.skip("no native toolchain")
        root = tmp_path / "train"
        for n in range(6):
            (root / "audio" / "1").mkdir(parents=True, exist_ok=True)
            (root / "audio" / "1" / f"{n}.wav").write_bytes(b"")
            T = 120 + 10 * n
            for kind, arr in [
                ("mel", rng.standard_normal((T, 8)).astype(np.float32)),
                ("units", rng.standard_normal((int(T * 0.58), 8)).astype(np.float32)),
            ]:
                (root / kind / "1").mkdir(parents=True, exist_ok=True)
                np.save(root / kind / "1" / f"{n}.wav.npy", arr)
        mk = lambda **kw: DataLoader(
            DiffusionDataset(
                root, waveform_sec=1.0, hop_size=2, sample_rate=100, n_spk=1,
                seed=0, only_mean=True, clamp=-1, device_collate=True,
            ),
            batch_size=3, seed=2, **kw,
        )
        proc = mk(num_workers=2)
        try:
            got = list(proc)
            want = list(mk(num_threads=1))
            assert len(got) == len(want) > 0
            for g, w in zip(got, want):
                for k in w:
                    np.testing.assert_array_equal(
                        np.asarray(g[k]), np.asarray(w[k])
                    )
        finally:
            proc.close()
