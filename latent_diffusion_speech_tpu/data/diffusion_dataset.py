"""Diffusion training dataset over preprocessed npy dirs.

Behavior parity with the reference `AudioDataset` (`diffusion/data_loaders.py:60-217`),
minus its double-crop cache bug (SURVEY.md 2.9):
* items keyed by `audio/<spk>/<name>.wav`; features read from sibling
  `mel/` (+`aug_mel/`) and `units/` npy files.
* mel npy stores concat([m, logs]) (B-free (T, 2C)); the latent is sampled
  z = m + eps * exp(logs) per read (or just m with only_mean), clamped.
* units re-timed to the mel frame grid (`units_forced_alignment` nearest),
  then a random fixed-duration crop is taken — static shapes for XLA.
* speaker ids are 1-based by directory order; rank sharding via
  paths[process_index::process_count].
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import numpy as np

from latent_diffusion_speech_tpu.data.files import speaker_id_map, traverse_dir
from latent_diffusion_speech_tpu.ops.alignment import units_forced_alignment

__all__ = ["DiffusionDataset"]


class DiffusionDataset:
    def __init__(
        self,
        path_root: str | Path,
        waveform_sec: float = 1.0,
        hop_size: int = 512,
        sample_rate: int = 44100,
        extensions=("wav",),
        n_spk: int = 1,
        use_aug: bool = False,
        units_forced_mode: str = "nearest",
        only_mean: bool = False,
        clamp: float = 10.0,
        whole_audio: bool = False,
        process_index: int = 0,
        process_count: int = 1,
        cache: bool = False,
        seed: int = 0,
        device_collate: bool = False,
        transfer_dtype=None,
    ):
        self.root = Path(path_root)
        self.frame_len = int(waveform_sec * sample_rate / hop_size)
        self.hop_size = hop_size
        self.sample_rate = sample_rate
        self.units_forced_mode = units_forced_mode
        self.only_mean = only_mean
        self.clamp = clamp
        self.use_aug = use_aug
        self.whole_audio = whole_audio
        self.n_spk = n_spk

        all_paths = traverse_dir(self.root / "audio", extensions=extensions)
        self.spk_map = speaker_id_map(all_paths) if (n_spk and n_spk > 1) else {}
        self.paths = all_paths[process_index::process_count]
        self.seed = seed + process_index
        # augmentation draws (aug_mel choice, latent noise, crop start) are
        # keyed on (seed, epoch, index): set_epoch + the loader's epoch-keyed
        # shuffle make the whole input stream bit-reproducible across resumes
        self.epoch = 0
        self._cache: Optional[Dict] = {} if cache else None
        # device_collate: fast_batch ships RAW cropped features (mel stats +
        # native-rate units + a gather index) and the trainer finalizes the
        # batch ON DEVICE inside the jitted step (latent sampling, nearest
        # alignment, clamp — all fused by XLA).  Roughly halves both the host
        # assembly work and the host->device bytes vs host collation.
        self.device_collate = bool(device_collate)
        # transfer_dtype: optional narrow dtype for the units payload (e.g.
        # ml_dtypes.bfloat16 or "bfloat16") — the model's first matmul casts
        # to bf16 anyway, so shipping bf16 units halves bytes at no accuracy
        # cost; mel stats stay f32 (they form the regression target)
        if isinstance(transfer_dtype, str):
            import ml_dtypes

            transfer_dtype = np.dtype(getattr(ml_dtypes, transfer_dtype))
        elif transfer_dtype is not None:
            # normalize type objects (e.g. ml_dtypes.bfloat16) too, so the
            # fused-read gate's `.name` check works for every documented form
            transfer_dtype = np.dtype(transfer_dtype)
        self.transfer_dtype = transfer_dtype

        if n_spk and n_spk > 1 and self.spk_map and max(self.spk_map.values()) > n_spk:
            raise ValueError("[x] spk_id must be a positive integer from 1 to n_spk")

    # __getitem__/fast_batch draw only from per-call (seed, epoch, index)-keyed
    # generators — safe for the loader's threaded item assembly
    thread_safe_items = True

    def __getstate__(self):
        """Picklable for the loader's process workers: the native reader is a
        ctypes handle — each worker rebuilds its own lazily in fast_batch."""
        state = self.__dict__.copy()
        state.pop("_shared_reader", None)
        return state

    def __len__(self) -> int:
        return len(self.paths)

    def set_epoch(self, epoch: int) -> None:
        self.epoch = int(epoch)

    def _item_rng(self, idx) -> np.random.Generator:
        return np.random.default_rng([self.seed, self.epoch, int(idx)])

    def _load(self, name_ext: str, kind: str) -> np.ndarray:
        if self._cache is not None and (name_ext, kind) in self._cache:
            return self._cache[(name_ext, kind)]
        arr = np.load(str(self.root / kind / name_ext) + ".npy")
        if self._cache is not None:
            self._cache[(name_ext, kind)] = arr
        return arr

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        g = self._item_rng(idx)
        for attempt in range(len(self.paths)):
            name_ext = self.paths[(idx + attempt) % len(self.paths)]
            try:
                item = self._get(name_ext, g)
                if item is not None:
                    return item
            except (OSError, ValueError, KeyError):
                continue
        raise RuntimeError("diffusion dataset: no loadable item found")

    def _get(self, name_ext: str, g: np.random.Generator) -> Optional[Dict[str, np.ndarray]]:
        mel_kind = "aug_mel" if (self.use_aug and g.random() < 0.5) else "mel"
        try:
            stats = self._load(name_ext, mel_kind).astype(np.float32)  # (T, 2C)
        except FileNotFoundError:
            stats = self._load(name_ext, "mel").astype(np.float32)
        T = stats.shape[0]
        C = stats.shape[1] // 2
        m, logs = stats[:, :C], stats[:, C:]
        if self.only_mean:
            mel = m
        else:
            mel = m + g.standard_normal(m.shape).astype(np.float32) * np.exp(logs)
        if self.clamp and self.clamp > 0:
            mel = np.clip(mel, -self.clamp, self.clamp)

        units = self._load(name_ext, "units").astype(np.float32)
        units = units_forced_alignment(units, n_frames=T, mode=self.units_forced_mode)
        units = np.asarray(units)

        frame_len = T if self.whole_audio else self.frame_len
        if T < frame_len + 2 and not self.whole_audio:
            return None  # too short; caller advances
        start = 0 if self.whole_audio else int(g.integers(0, max(T - frame_len, 1)))
        mel = mel[start : start + frame_len]
        units = units[start : start + frame_len]

        spk_id = self.spk_map.get(str(Path(name_ext).parent), 1) if self.spk_map else 1
        return {
            "mel": mel,
            "units": units,
            "spk_id": np.array([spk_id], np.int32),
            "aug_shift": np.array([0.0], np.float32),
        }

    def batch(self, indices) -> Dict[str, np.ndarray]:
        items = [self[i] for i in indices]
        return {k: np.stack([it[k] for it in items]) for k in items[0]}

    # -- native fast path ----------------------------------------------------

    def _probe_all(self, reader):
        """Probe (mel_rows, unit_rows, dims) per path once; drop unusable files."""
        self._probed = {}
        self._probed_aug = {}
        usable = []
        for p in self.paths:
            try:
                mel_rows, mel_row_bytes, _ = reader.probe(str(self.root / "mel" / p) + ".npy")
                unit_rows, unit_row_bytes, _ = reader.probe(str(self.root / "units" / p) + ".npy")
            except OSError:
                continue
            if mel_rows < self.frame_len + 2:
                continue
            self._probed[p] = (mel_rows, mel_row_bytes // 8, unit_rows, unit_row_bytes // 4)
            usable.append(p)
            if self.use_aug:
                try:
                    aug_rows, aug_row_bytes, _ = reader.probe(
                        str(self.root / "aug_mel" / p) + ".npy"
                    )
                    if aug_rows >= self.frame_len + 2:
                        self._probed_aug[p] = (aug_rows, aug_row_bytes // 8)
                except OSError:
                    pass
        self._fast_paths = usable
        # fixed units-window size for the device-collate path: one static
        # shape for every batch -> ONE compiled train step (the per-batch
        # max of the host path would recompile on every new maximum)
        self._u_fixed = max(
            (
                int(np.ceil((self.frame_len + 1) * u / m)) + 1
                for (m, _, u, _) in (self._probed[p] for p in usable)
            ),
            default=0,
        )

    def fast_batch(self, indices, reader=None) -> Dict[str, np.ndarray]:
        """Batched native read: parallel cropped mel/unit reads (C++ thread
        pool), vectorized latent sampling + nearest alignment in numpy.
        Semantically equivalent to `batch()` (modulo RNG draws).

        With device_collate=True, returns the RAW form instead (stats +
        native-rate units + gather index) for on-device finalization."""
        if reader is None:
            from latent_diffusion_speech_tpu.data.native_loader import NativeNpyReader

            if not hasattr(self, "_shared_reader"):
                self._shared_reader = NativeNpyReader()
            reader = self._shared_reader
        if not hasattr(self, "_probed"):
            self._probe_all(reader)
        if not self._fast_paths:
            return self.batch(indices)
        if self.device_collate:
            return self._fast_batch_raw(indices, reader)

        F = self.frame_len
        # preserve the sampler's index->item mapping: each dataset index maps to
        # its own path; only unusable paths are re-drawn uniformly from the
        # usable pool (matches batch()'s skip-and-advance semantics in law)
        probed = self._probed
        gs = [self._item_rng(i) for i in indices]  # (seed, epoch, index)-keyed
        names = [
            self.paths[i] if self.paths[i] in probed
            else self._fast_paths[int(g.integers(0, len(self._fast_paths)))]
            for i, g in zip(indices, gs)
        ]
        mel_dim = self._probed[names[0]][1]  # latent C (probe stores bytes//8 = C)
        unit_dim = self._probed[names[0]][3]

        # per-item 50% aug_mel draw (reference data_loaders.py aug parity)
        kinds = [
            "aug_mel"
            if (self.use_aug and name in self._probed_aug and g.random() < 0.5)
            else "mel"
            for name, g in zip(names, gs)
        ]

        # choose crops; units read window sized by the worst-case ratio
        mel_paths, unit_paths, mel_starts, unit_starts = [], [], [], []
        count_u = 0
        metas = []
        for name, kind, g in zip(names, kinds, gs):
            _, _, unit_rows, _ = self._probed[name]
            mel_rows = self._probed_aug[name][0] if kind == "aug_mel" else self._probed[name][0]
            s = int(g.integers(0, max(mel_rows - F, 1)))
            ratio = unit_rows / mel_rows
            metas.append((name, s, mel_rows, unit_rows, ratio))
            count_u = max(count_u, int(np.ceil((F + 1) * ratio)) + 1)
        for (name, s, mel_rows, unit_rows, ratio), kind in zip(metas, kinds):
            u_start = int(np.floor(s * ratio))
            u_start = min(u_start, max(unit_rows - count_u, 0))
            mel_paths.append(str(self.root / kind / name) + ".npy")
            unit_paths.append(str(self.root / "units" / name) + ".npy")
            mel_starts.append(s)
            unit_starts.append(u_start)

        stats = reader.read_batch(mel_paths, mel_starts, F, (2 * mel_dim,))
        units_raw = reader.read_batch(unit_paths, unit_starts, count_u, (unit_dim,))

        m, logs = stats[..., :mel_dim], stats[..., mel_dim:]
        if self.only_mean:
            mel = m
        else:
            noise = np.stack([g.standard_normal(m.shape[1:]) for g in gs]).astype(np.float32)
            mel = m + noise * np.exp(logs)
        if self.clamp and self.clamp > 0:
            mel = np.clip(mel, -self.clamp, self.clamp)

        # nearest alignment on the mel grid: global unit idx = floor(t * Tu / Tm)
        units = np.empty((len(names), F, unit_dim), np.float32)
        for b, (name, s, mel_rows, unit_rows, ratio) in enumerate(metas):
            t = np.arange(s, s + F)
            g = np.floor(t * (unit_rows / mel_rows)).astype(np.int64)
            local = np.clip(g - unit_starts[b], 0, count_u - 1)
            units[b] = units_raw[b, local]

        spk_ids = np.array(
            [[self.spk_map.get(str(Path(n).parent), 1) if self.spk_map else 1] for n in names],
            np.int32,
        )
        return {
            "mel": mel,
            "units": units,
            "spk_id": spk_ids,
            "aug_shift": np.zeros((len(names), 1), np.float32),
        }

    def _fast_batch_raw(self, indices, reader) -> Dict[str, np.ndarray]:
        """Device-collate batch: the host does IO only.

        Ships cropped mel *stats* (m ++ logs, untouched), the units window at
        its NATIVE frame rate (whisper 50 fps vs mel 86 fps — ~40% fewer rows
        than the host path's upsampled copy), and a (B, F) int32 nearest-
        alignment gather index.  Latent sampling (z = m + eps*exp(logs)),
        clamp, alignment, and any dtype cast run inside the jitted train step
        (DiffusionTrainer finalize; reference semantics:
        `diffusion/data_loaders.py:180-196`).  The units payload is optionally
        narrowed to `transfer_dtype` (bf16 halves host->device bytes)."""
        F = self.frame_len
        probed = self._probed
        gs = [self._item_rng(i) for i in indices]
        names = [
            self.paths[i] if self.paths[i] in probed
            else self._fast_paths[int(g.integers(0, len(self._fast_paths)))]
            for i, g in zip(indices, gs)
        ]
        mel_dim = probed[names[0]][1]
        unit_dim = probed[names[0]][3]
        U = self._u_fixed

        kinds = [
            "aug_mel"
            if (self.use_aug and name in self._probed_aug and g.random() < 0.5)
            else "mel"
            for name, g in zip(names, gs)
        ]

        root = str(self.root)
        mel_paths, unit_paths, mel_starts, unit_starts = [], [], [], []
        metas = []
        for name, kind, g in zip(names, kinds, gs):
            _, _, unit_rows, _ = probed[name]
            mel_rows = self._probed_aug[name][0] if kind == "aug_mel" else probed[name][0]
            s = int(g.integers(0, max(mel_rows - F, 1)))
            u_start = min(int(np.floor(s * unit_rows / mel_rows)), max(unit_rows - U, 0))
            metas.append((s, mel_rows, unit_rows, u_start))
            mel_paths.append(f"{root}/{kind}/{name}.npy")
            unit_paths.append(f"{root}/units/{name}.npy")
            mel_starts.append(s)
            unit_starts.append(u_start)

        stats = reader.read_batch(mel_paths, mel_starts, F, (2 * mel_dim,))
        if (
            self.transfer_dtype is not None
            and self.transfer_dtype.name == "bfloat16"
            and hasattr(reader, "read_batch_bf16")
        ):
            # fused converting read: the C++ pass writes bf16 directly (RNE,
            # identical to .astype(ml_dtypes.bfloat16)) — no numpy cast pass
            units_raw = reader.read_batch_bf16(unit_paths, unit_starts, U,
                                               (unit_dim,))
        else:
            units_raw = reader.read_batch(unit_paths, unit_starts, U, (unit_dim,))
            if self.transfer_dtype is not None:
                units_raw = units_raw.astype(self.transfer_dtype)

        # vectorized nearest-alignment indices, local to each read window
        t = np.arange(F)[None, :]
        s_arr = np.array([m[0] for m in metas])[:, None]
        ratio = np.array([m[2] / m[1] for m in metas])[:, None]
        u0 = np.array([m[3] for m in metas])[:, None]
        unit_idx = np.clip(
            np.floor((s_arr + t) * ratio).astype(np.int32) - u0, 0, U - 1
        ).astype(np.int32)

        spk_ids = np.array(
            [[self.spk_map.get(str(Path(n).parent), 1) if self.spk_map else 1] for n in names],
            np.int32,
        )
        return {
            "mel_stats": stats,
            "units_raw": units_raw,
            "unit_idx": unit_idx,
            "spk_id": spk_ids,
            "aug_shift": np.zeros((len(names), 1), np.float32),
        }
