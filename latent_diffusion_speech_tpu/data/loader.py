"""Prefetching host->device data loader.

Replaces torch DataLoader workers (`diffusion/data_loaders.py:30-37`) with a
thread-pool prefetcher that assembles numpy batches ahead of the training step
and `jax.device_put`s them with the mesh batch sharding — keeping the TPU fed
without host-callback stalls.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

import numpy as np

__all__ = ["DataLoader"]


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        collate: Optional[Callable] = None,
        shuffle: bool = True,
        drop_last: bool = True,
        prefetch: int = 2,
        num_threads: int = 2,
        seed: int = 0,
        device_put: Optional[Callable] = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate = collate
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.num_threads = num_threads
        self.seed = seed
        # the per-epoch permutation is a pure function of (seed, epoch) so a
        # resumed run replays the exact batch order (torch DistributedSampler
        # set_epoch semantics; the reference cannot do this)
        self.epoch = 0
        self._skip_next = 0
        self._pool = None  # lazy item-load thread pool (num_threads > 1)
        self.device_put = device_put
        # native fast path: datasets exposing fast_batch (C++ batched reads)
        self._fast = None
        if collate is None and hasattr(dataset, "fast_batch"):
            try:
                from latent_diffusion_speech_tpu.data.native_loader import native_available

                self._fast = bool(native_available())
            except Exception:
                self._fast = False

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def close(self) -> None:
        if self._pool is not None:
            self._pool.shutdown(wait=False)
            self._pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def set_epoch(self, epoch: int) -> None:
        """Select the (seed, epoch)-keyed shuffle for the next iteration; the
        dataset's augmentation draws follow if it exposes set_epoch too."""
        self.epoch = int(epoch)
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def skip_batches(self, n: int) -> None:
        """Skip the first n batches of the NEXT iteration (mid-epoch resume);
        skipped batches are never loaded, only their indices are drawn."""
        self._skip_next = max(0, int(n))

    def _batches(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng([self.seed, self.epoch]).shuffle(idx)
        n_full = len(idx) // self.batch_size
        for b in range(n_full):
            yield idx[b * self.batch_size : (b + 1) * self.batch_size]
        if not self.drop_last and len(idx) % self.batch_size:
            yield idx[n_full * self.batch_size :]

    def _make_batch(self, indices):
        if self._fast:
            try:
                batch = self.dataset.fast_batch([int(i) for i in indices])
            except OSError:
                self._fast = False
                return self._make_batch(indices)
        else:
            # threaded item assembly ONLY for datasets that declare their
            # __getitem__ draws are (seed, epoch, index)-keyed / stateless
            # (thread_safe_items) — shared-rng datasets would interleave
            # draws nondeterministically
            if self.num_threads > 1 and getattr(self.dataset, "thread_safe_items", False):
                if self._pool is None:
                    from concurrent.futures import ThreadPoolExecutor

                    self._pool = ThreadPoolExecutor(self.num_threads)
                items = list(self._pool.map(lambda i: self.dataset[int(i)], indices))
            else:
                items = [self.dataset[int(i)] for i in indices]
            if self.collate is not None:
                batch = self.collate(items)
            else:
                batch = {k: np.stack([it[k] for it in items]) for k in items[0]}
        if self.device_put is not None:
            batch = self.device_put(batch)
        return batch

    def __iter__(self) -> Iterator:
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        skip, self._skip_next = self._skip_next, 0

        def producer():
            try:
                for bi, indices in enumerate(self._batches()):
                    if bi < skip:
                        continue
                    q.put(self._make_batch(indices))
            except BaseException as e:  # noqa: BLE001 — re-raised in the consumer
                q.put(e)
            q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            if isinstance(item, BaseException):
                # a failed batch must fail the epoch, not silently truncate it
                raise item
            yield item
