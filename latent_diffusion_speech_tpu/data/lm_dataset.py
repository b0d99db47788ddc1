"""LM training dataset over utt/ + semantic_token/ npy dirs.

Behavior parity with the reference `TextDataset` (`text2semantic/roformer/
dataloader.py:11-232`): items pair `(phones, tones, lang_ids, word2ph)` from
`utt/` with quantized token ids from `semantic_token/`; semantic sequences are
BOS/EOS-wrapped; speaker ids are per-token sequences; the collate pads to a
shared length — here to static buckets (pad-to-multiple) so XLA compiles a
bounded set of shapes rather than one program per length.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from latent_diffusion_speech_tpu.data.files import speaker_id_map, traverse_dir

__all__ = ["TextDataset", "collate_text_batch", "collate_llama_batch"]


class TextDataset:
    thread_safe_items = True  # items are pure functions of the files on disk

    def __init__(
        self,
        path_root: str | Path,
        semantic_bos: int,
        semantic_eos: int,
        n_spk: int = 1,
        process_index: int = 0,
        process_count: int = 1,
        cache: bool = False,
    ):
        self.root = Path(path_root)
        self.semantic_bos = semantic_bos
        self.semantic_eos = semantic_eos
        self.n_spk = n_spk
        all_paths = traverse_dir(self.root / "utt", extensions=("npy",))
        self.spk_map = speaker_id_map(all_paths) if (n_spk and n_spk > 1) else {}
        self.paths = all_paths[process_index::process_count]
        self._cache: Optional[Dict] = {} if cache else None

    def __len__(self) -> int:
        return len(self.paths)

    def item_lengths(self) -> np.ndarray:
        """Per-item semantic sequence length (incl. BOS/EOS wrap), from npy
        headers only — no payload reads.  Drives the loader's length-sorted
        batching (DataLoader(length_sorted=True)): semantic length dominates
        the padded compute (448-token bucket vs the 64-token text side), so
        sorting on it alone removes nearly all pad waste."""
        if getattr(self, "_item_lengths", None) is None:
            # sidecar cache: the header scan is O(N-files) serial small-file
            # IO recomputing an immutable result on every run/resume — cache
            # it keyed on the path list (name + file size), best-effort
            cache = self.root / "semantic_token" / ".lengths_cache.npz"
            key = None
            try:
                sizes = np.array(
                    [(self.root / "semantic_token" / n).stat().st_size
                     for n in self.paths], np.int64)
                import hashlib

                h = hashlib.sha256("\n".join(self.paths).encode())
                h.update(sizes.tobytes())
                key = h.hexdigest()
                if cache.exists():
                    z = np.load(cache, allow_pickle=False)
                    if str(z.get("key")) == key and len(z["lens"]) == len(self.paths):
                        self._item_lengths = z["lens"].astype(np.int64)
                        return self._item_lengths
            except Exception:
                pass  # cache is an optimization only
            lens = np.empty(len(self.paths), np.int64)
            for i, name in enumerate(self.paths):
                try:
                    with open(self.root / "semantic_token" / name, "rb") as f:
                        version = np.lib.format.read_magic(f)
                        if version >= (2, 0):
                            shape, _, _ = np.lib.format.read_array_header_2_0(f)
                        else:
                            shape, _, _ = np.lib.format.read_array_header_1_0(f)
                    lens[i] = shape[0] + 2  # + BOS/EOS
                except (OSError, ValueError):
                    lens[i] = 0  # unloadable items substitute at __getitem__
            self._item_lengths = lens
            if key is not None:
                try:
                    np.savez(cache, key=key, lens=lens)
                except OSError:
                    pass
        return self._item_lengths

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        for attempt in range(len(self.paths)):
            name = self.paths[(idx + attempt) % len(self.paths)]
            try:
                return self._get(name)
            except (OSError, ValueError, KeyError, FileNotFoundError):
                continue
        raise RuntimeError("text dataset: no loadable item found")

    def _get(self, name: str) -> Dict[str, np.ndarray]:
        if self._cache is not None and name in self._cache:
            return self._cache[name]
        phones, tones, lang_ids, word2ph = np.load(self.root / "utt" / name, allow_pickle=True)
        semantic = np.load(self.root / "semantic_token" / name)
        semantic = np.concatenate([[self.semantic_bos], semantic, [self.semantic_eos]])

        phones = np.asarray(phones, np.int32)
        tones = np.asarray(tones, np.int32) if len(np.atleast_1d(tones)) else np.zeros_like(phones)
        spk = self.spk_map.get(str(Path(name).parent), 1) if self.spk_map else 1
        item = {
            "phone": phones,
            "tone": tones,
            "semantic": np.asarray(semantic, np.int32),
            "spk_id": np.full_like(phones, spk),
        }
        if self._cache is not None:
            self._cache[name] = item
        return item


def _pad_to(arr: np.ndarray, length: int, value) -> np.ndarray:
    out = np.full((length,), value, arr.dtype)
    out[: len(arr)] = arr[:length]
    return out


def collate_text_batch(
    items: List[Dict[str, np.ndarray]],
    phone_pad: int,
    semantic_pad: int,
    pad_multiple: int = 32,
    max_phone_len: Optional[int] = None,
    max_semantic_len: Optional[int] = None,
) -> Dict[str, np.ndarray]:
    """Pad to bucketed lengths. labels get -100 on padding (HF ignore index,
    matching the reference collate, roformer/dataloader.py:198-232)."""

    def bucket(n):
        return max(pad_multiple, ((n + pad_multiple - 1) // pad_multiple) * pad_multiple)

    pl = max_phone_len or bucket(max(len(it["phone"]) for it in items))
    sl = max_semantic_len or bucket(max(len(it["semantic"]) for it in items))

    batch = {
        "phone": np.stack([_pad_to(it["phone"], pl, phone_pad) for it in items]),
        "tone": np.stack([_pad_to(it["tone"], pl, 0) for it in items]),
        "semantic": np.stack([_pad_to(it["semantic"], sl, semantic_pad) for it in items]),
        "labels": np.stack([_pad_to(it["semantic"].astype(np.int32), sl, -100) for it in items]),
        "encoder_attention_mask": np.stack(
            [_pad_to(np.ones(len(it["phone"]), np.int32), pl, 0) for it in items]
        ),
        "attention_mask": np.stack(
            [_pad_to(np.ones(len(it["semantic"]), np.int32), sl, 0) for it in items]
        ),
        "spk_id": np.stack([_pad_to(it["spk_id"], pl, 0) for it in items]),
    }
    return batch


def collate_llama_batch(
    items: List[Dict[str, np.ndarray]],
    token_shift: int,
    phone_bos: int,
    phone_eos: int,
    pad_id: int,
    pad_multiple: int = 32,
    max_len: Optional[int] = None,
) -> Dict[str, np.ndarray]:
    """Single-stream Llama collate (reference `text2semantic/llama/
    dataloader.py:100-159,199-220`): each item becomes

        input_ids = [BOS, phones, EOS] ++ (semantic_wrapped + token_shift)

    where the dataset already wrapped semantic with the unshifted BOS/EOS
    (kmeans_num, kmeans_num+1), which shift onto Llama's semantic BOS/EOS ids.
    labels = input_ids with -100 at padding — CE covers the phone prompt too,
    as in the reference (labels are the input_ids verbatim).  The reference
    pads input_ids with -100 and remaps to PAD before the forward
    (roformer/train.py:118-126 pattern); here input_ids are padded with
    `pad_id` directly and only labels carry -100."""

    def bucket(n):
        return max(pad_multiple, ((n + pad_multiple - 1) // pad_multiple) * pad_multiple)

    seqs = [
        np.concatenate(
            [[phone_bos], it["phone"], [phone_eos], it["semantic"] + token_shift]
        ).astype(np.int32)
        for it in items
    ]
    L = max_len or bucket(max(len(s) for s in seqs))
    return {
        "input_ids": np.stack([_pad_to(s, L, pad_id) for s in seqs]),
        "labels": np.stack([_pad_to(s, L, -100) for s in seqs]),
        "attention_mask": np.stack(
            [_pad_to(np.ones(len(s), np.int32), L, 0) for s in seqs]
        ),
    }
