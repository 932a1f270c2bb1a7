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

    def epoch(self, epoch: int, start_batch: int = 0):
        """Yield (batch_idx, batch dict) from `start_batch` (mid-epoch resume)."""
        perm = self.permutation(epoch)
        shard = self.batch_size // self.num_shards
        for b in range(start_batch, self.num_batches()):
            lo = b * self.batch_size + self.shard_id * shard
            ids = perm[lo : lo + shard]
            items = []
            for slot, i in enumerate(ids):
                rng = np.random.RandomState(
                    (self.seed * 92821 + epoch * 524287 + b * 1031 + self.shard_id * 97 + slot) % (2**31)
                )
                items.append(self.dataset.__getitem__(int(i), rng=rng))
            yield b, _collate(items)
