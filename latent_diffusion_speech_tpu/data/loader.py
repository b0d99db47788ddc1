"""Prefetching host->device data loader.

Replaces torch DataLoader workers (`diffusion/data_loaders.py:30-37`) with a
prefetcher that assembles numpy batches ahead of the training step and
`jax.device_put`s them with the mesh batch sharding — keeping the TPU fed
without host-callback stalls.  Two host-parallelism modes:

- threads (default): a 2-thread pool for item assembly; enough when the
  C++ batched reader (native_loader) does the heavy lifting with the GIL
  released.
- processes (`num_workers > 0`): N worker processes each assemble WHOLE
  batches (items + collate) — the counterpart of the reference's
  `num_workers=8..32` torch DataLoader processes for Python-bound collate
  stages that threads cannot scale past the GIL.  Workers are fed batch
  index lists over a bounded in-flight window (deterministic batch order is
  preserved; results are reaped in order), and `device_put` still runs in
  the parent (workers never touch JAX).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

import numpy as np

__all__ = ["DataLoader"]

# -- process-worker plumbing (module-level so 'spawn' children can import it) --
_W = {}


def _collate_items(items, collate):
    """Default item collate shared by the in-process and worker paths."""
    if collate is not None:
        return collate(items)
    return {k: np.stack([it[k] for it in items]) for k in items[0]}


def _worker_init(dataset, collate, fast):
    _W["dataset"], _W["collate"], _W["fast"] = dataset, collate, fast
    _W["epoch"] = None


def _worker_make_batch(job):
    """Assemble one batch in a worker.  job = (epoch, indices): the dataset
    was pickled once at pool creation, so the parent's set_epoch never
    reaches the worker copy — the epoch rides with every job and is applied
    lazily (augmentation/crop draws are keyed (seed, epoch, index), so
    per-worker application order cannot change the content)."""
    dataset, collate = _W["dataset"], _W["collate"]
    if _W["epoch"] != job[0] and hasattr(dataset, "set_epoch"):
        dataset.set_epoch(job[0])
        _W["epoch"] = job[0]
    indices = [int(i) for i in job[1]]
    if _W["fast"]:
        try:
            return dataset.fast_batch(indices)
        except OSError:
            # degrade to the Python item path like _make_batch does — one
            # unreadable file must not abort the epoch
            _W["fast"] = False
    return _collate_items([dataset[i] for i in indices], collate)


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
        num_workers: int = 0,
        length_sorted: bool = False,
        pool_factor: int = 50,
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
        self._proc_pool = None  # lazy process pool (num_workers > 0)
        self.num_workers = int(num_workers)
        # length_sorted: bucket items of similar length into the same batch so
        # pad-to-batch-max wastes <~10% instead of padding every batch to the
        # corpus tail.  Pool-local sort keeps stochasticity: shuffle the epoch,
        # sort runs of pool_factor*batch_size items by dataset.item_lengths(),
        # emit batches from each sorted pool, then shuffle the BATCH order —
        # all keyed on (seed, epoch), so resume replays exactly.  TPU-friendly
        # counterpart of the reference's flash-attn varlen unpadding
        # (text2semantic/roformer/roformer_flash_attn.py:110-169): instead of
        # dynamic-shape unpad/repad (retrace per length on XLA), batches stay
        # static-bucketed but the bucket hugs the true lengths.
        self.length_sorted = bool(length_sorted)
        self.pool_factor = int(pool_factor)
        self._lengths = None
        if self.length_sorted:
            if not hasattr(dataset, "item_lengths"):
                raise ValueError(
                    "length_sorted=True needs dataset.item_lengths()"
                )
            self._lengths = np.asarray(dataset.item_lengths(), np.int64)
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
        if self._proc_pool is not None:
            self._proc_pool.shutdown(wait=False, cancel_futures=True)
            self._proc_pool = None

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
        rng = np.random.default_rng([self.seed, self.epoch])
        if self.shuffle:
            rng.shuffle(idx)
        if self.length_sorted:
            # pool-local sort by length, then batch-order shuffle
            pool = max(self.batch_size, self.pool_factor * self.batch_size)
            sorted_idx = np.concatenate([
                idx[s : s + pool][np.argsort(self._lengths[idx[s : s + pool]],
                                             kind="stable")]
                for s in range(0, len(idx), pool)
            ])
            n_full = len(sorted_idx) // self.batch_size
            batches = [
                sorted_idx[b * self.batch_size : (b + 1) * self.batch_size]
                for b in range(n_full)
            ]
            tail = sorted_idx[n_full * self.batch_size :]
            if self.shuffle:
                rng.shuffle(batches)
            yield from batches
            if not self.drop_last and len(tail):
                yield tail
            return
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
            batch = _collate_items(items, self.collate)
        if self.device_put is not None:
            batch = self.device_put(batch)
        return batch

    def _proc_ensure(self):
        if self._proc_pool is None:
            import multiprocessing as mp
            from concurrent.futures import ProcessPoolExecutor

            # 'spawn': children never inherit JAX/TPU client state; the
            # dataset ships once via the initializer (datasets drop their
            # native reader handles in __getstate__ and rebuild lazily).
            # ProcessPoolExecutor (not mp.Pool): a worker that dies — or an
            # initializer that cannot run, e.g. an unpicklable dataset or a
            # REPL/stdin main module spawn cannot re-import — surfaces as
            # BrokenProcessPool on the next result instead of hanging.
            self._proc_pool = ProcessPoolExecutor(
                max_workers=self.num_workers,
                mp_context=mp.get_context("spawn"),
                initializer=_worker_init,
                initargs=(self.dataset, self.collate, bool(self._fast)),
            )
        return self._proc_pool

    def _iter_procs(self, skip) -> Iterator:
        """N-process batch assembly: submit batch index lists over a bounded
        in-flight window (num_workers + prefetch), reap IN ORDER."""
        from collections import deque

        pool = self._proc_ensure()
        window = self.num_workers + self.prefetch
        pending: deque = deque()
        gen = (
            ix for bi, ix in enumerate(self._batches()) if bi >= skip
        )
        try:
            for indices in gen:
                pending.append(
                    pool.submit(_worker_make_batch, (self.epoch, indices)))
                if len(pending) >= window:
                    batch = pending.popleft().result()
                    yield self.device_put(batch) if self.device_put else batch
            while pending:
                batch = pending.popleft().result()
                yield self.device_put(batch) if self.device_put else batch
        except BaseException:
            self.close()  # a failed batch must fail the epoch
            raise

    def __iter__(self) -> Iterator:
        skip0, self._skip_next = self._skip_next, 0
        if self.num_workers > 0:
            return self._iter_procs(skip0)
        return self._iter_threaded(skip0)

    def _iter_threaded(self, skip) -> Iterator:
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

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
