"""Deterministic, mid-epoch-resumable, multi-host-shardable batch loader.

Parity: reference `utils/data_loader.py` (`CheckpointDataLoader`): each epoch
draws a permutation; checkpoints store (epoch, batch_idx) and resume replays
the same permutation from `batch_size * batch_idx`. Here the permutation is
a pure function of (seed, epoch) so only two integers need checkpointing,
and each host slices its own shard of every batch (per-host input sharding
replaces DataLoader worker processes; SURVEY.md §2.3).
"""

from __future__ import annotations

import numpy as np


def _collate(items: list) -> dict:
    """Stack a list of sample dicts into batched numpy arrays."""
    out = {}
    for k in items[0]:
        vals = [it[k] for it in items]
        if isinstance(vals[0], dict):
            out[k] = _collate(vals)
        elif isinstance(vals[0], str):
            out[k] = vals
        else:
            out[k] = np.stack([np.asarray(v) for v in vals])
    return out


class ResumableLoader:
    """Iterates dataset batches with deterministic shuffling.

    dataset: indexable with `__getitem__(i, rng=...)` and `__len__`.
    Per-sample augmentation RNG is derived from (seed, epoch, sample slot),
    so a resumed run reproduces the exact remaining batches.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        seed: int = 0,
        shuffle: bool = True,
        drop_last: bool = True,
        shard_id: int = 0,
        num_shards: int = 1,
    ):
        assert batch_size % num_shards == 0
        self.dataset = dataset
        self.batch_size = batch_size
        self.seed = seed
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.shard_id = shard_id
        self.num_shards = num_shards

    def num_batches(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def permutation(self, epoch: int) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.RandomState((self.seed * 100003 + epoch) % (2**31)).shuffle(idx)
        return idx

    def _fetch(self, epoch: int, b: int, perm: np.ndarray, pool=None) -> dict:
        """Assemble batch `b` (optionally decoding samples on a thread pool;
        the per-sample RNG derivation is identical either way)."""
        shard = self.batch_size // self.num_shards
        lo = b * self.batch_size + self.shard_id * shard
        ids = perm[lo : lo + shard]

        def get(pair):
            slot, i = pair
            rng = np.random.RandomState(
                (self.seed * 92821 + epoch * 524287 + b * 1031 + self.shard_id * 97 + slot) % (2**31)
            )
            return self.dataset.__getitem__(int(i), rng=rng)

        pairs = list(enumerate(ids))
        items = list(pool.map(get, pairs)) if pool is not None else [get(p) for p in pairs]
        return _collate(items)

    def epoch(self, epoch: int, start_batch: int = 0):
        """Yield (batch_idx, batch dict) from `start_batch` (mid-epoch resume)."""
        perm = self.permutation(epoch)
        for b in range(start_batch, self.num_batches()):
            yield b, self._fetch(epoch, b, perm)


class PrefetchLoader:
    """Double-buffered wrapper over ResumableLoader: a producer thread
    assembles upcoming batches with a decode thread pool (cv2 releases the
    GIL) while the consumer's current batch is on device — the equivalent of
    the reference's DataLoader worker processes (utils/data_loader.py) that
    keeps the TPU from starving on host input. Batch contents and order are
    byte-identical to the wrapped loader."""

    def __init__(self, loader: ResumableLoader, depth: int = 2, workers: int | None = None):
        self.loader = loader
        self.depth = depth
        if workers is None:
            # core-count-aware default: 4 decode threads on a 1-core host
            # thrash below the synchronous rate (PERF.md: 16.1 < 18.9
            # imgs/s); one producer thread still overlaps host decode with
            # device compute
            import os

            workers = max(1, min(4, (os.cpu_count() or 1) - 1))
        self.workers = workers

    def __getattr__(self, name):
        return getattr(self.loader, name)

    def epoch(self, epoch: int, start_batch: int = 0):
        import queue
        import threading
        from concurrent.futures import ThreadPoolExecutor

        q: queue.Queue = queue.Queue(maxsize=self.depth)
        stop = threading.Event()
        DONE = object()

        def produce():
            try:
                perm = self.loader.permutation(epoch)
                with ThreadPoolExecutor(self.workers) as pool:
                    for b in range(start_batch, self.loader.num_batches()):
                        if stop.is_set():
                            return
                        q.put((b, self.loader._fetch(epoch, b, perm, pool)))
            except BaseException as e:  # surfaced on the consumer side
                q.put(e)
            finally:
                q.put(DONE)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is DONE:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            while t.is_alive():
                try:
                    q.get(timeout=0.05)
                except queue.Empty:
                    pass
