"""Token-corpus dataset + loader: .npy event streams -> device batches.

TPU-native counterpart of the reference's SequenceDataset / DatasetLoader
(reference: processing/dataset.py:57-346). Host side stays numpy (file walk,
np.load, crop); everything per-token runs vectorized, and batches are
assembled on the host then transferred once per step (the reference moves
EVERY item to the GPU inside __getitem__, dataset.py:186).

Semantics preserved:
  * crop/pad to block_len+1 = 2049 with zero padding at the end, random /
    start / end crop modes (dataset.py:171-184)
  * (src, trg, meta) = (seq[:-1], seq[1:], 6 metadata tokens keyed by the
    file's parent directory name)
  * length-weighted sampling with replacement (WeightedRandomSampler over
    file token counts, dataset.py:197-200,299-303)
  * 80/20 random split (dataset.py:282-288)
  * data-parallel sharding by rank (DistributedSampler equivalent)

Augmentation is a pure jnp function applied ON DEVICE inside the jitted
train step (musicgen_tpu.data.augment), not here.
"""
from __future__ import annotations

import dataclasses
import os
import random
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from ..config import NUM_META, TrainValues
from .metadata import load_band_vectors


def find_token_files(directory: str | Path) -> List[str]:
    out = []
    for root, _, files in os.walk(directory):
        for f in files:
            if f.endswith(".npy"):
                out.append(os.path.join(root, f))
    return sorted(out)


@dataclasses.dataclass
class TokenDataset:
    """In-memory index of a token corpus (band dirs of .npy files)."""

    file_paths: List[str]
    band_vectors: Dict[str, np.ndarray]
    block_len: int = 2048
    crop: str = "random"  # 'random' | 'start' | 'end'
    lengths: Optional[np.ndarray] = None

    @classmethod
    def from_directory(
        cls,
        directory: str | Path,
        metadata_path: str | Path,
        tokenizations_path: str | Path | None = None,
        block_len: int = 2048,
        crop: str = "random",
        seed: int = 0,
    ) -> "TokenDataset":
        paths = find_token_files(directory)
        rng = random.Random(seed)
        rng.shuffle(paths)
        _, band_vectors = load_band_vectors(metadata_path, tokenizations_path)
        return cls(paths, band_vectors, block_len, crop)

    @classmethod
    def from_file_list(
        cls,
        file_paths: list,
        metadata_path: str | Path,
        block_len: int = 2048,
        crop: str = "random",
    ) -> "TokenDataset":
        """Explicit file list (reference train_classifier.py:52-57 loads
        train/test lists from data_distribution.json)."""
        _, band_vectors = load_band_vectors(metadata_path)
        return cls(list(file_paths), band_vectors, block_len, crop)

    def __len__(self) -> int:
        return len(self.file_paths)

    def _load_lengths(self) -> np.ndarray:
        if self.lengths is None:
            self.lengths = np.asarray(
                [np.load(p, mmap_mode="r").shape[0] for p in self.file_paths],
                dtype=np.int64,
            )
        return self.lengths

    def file_prob(self) -> np.ndarray:
        """Length-proportional sampling weights (dataset.py:197-200)."""
        lengths = self._load_lengths().astype(np.float64)
        return lengths / lengths.sum()

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        path = self.file_paths[idx]
        seq = np.load(path)
        need = self.block_len + 1
        if len(seq) < need:
            seq = np.concatenate(
                [seq, np.zeros(need - len(seq), dtype=np.int64)]
            )
        elif len(seq) > need:
            if self.crop == "end":
                ix = len(seq) - need - 1
            elif self.crop == "start":
                ix = 0
            else:
                ix = random.randint(0, len(seq) - need)
            seq = seq[ix : ix + need]
        band = Path(path).parts[-2]
        meta = self.band_vectors.get(
            band, np.zeros(NUM_META, dtype=np.int32)
        )
        return seq[:-1].astype(np.int32), seq[1:].astype(np.int32), meta


@dataclasses.dataclass
class Split:
    train_indices: np.ndarray
    test_indices: np.ndarray


def split_dataset(n: int, test_ratio: float = 0.2, seed: int = 0) -> Split:
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    test_size = int(n * test_ratio)
    return Split(train_indices=perm[test_size:], test_indices=perm[:test_size])


class BatchIterator:
    """Length-weighted, optionally rank-sharded batch stream.

    Single process: WeightedRandomSampler-with-replacement semantics.
    Data-parallel: each rank samples a disjoint pseudo-random stream
    (common seed + rank offset), the shard_map/pjit equivalent of
    DistributedSampler (dataset.py:291-297).
    """

    def __init__(
        self,
        dataset: TokenDataset,
        indices: np.ndarray,
        batch_size: int,
        seed: int = 0,
        rank: int = 0,
        world_size: int = 1,
        weighted: bool = True,
    ):
        self.dataset = dataset
        self.indices = np.asarray(indices)
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed * 100003 + rank)
        self.weighted = weighted
        if weighted:
            prob = dataset.file_prob()[self.indices]
            self.prob = prob / prob.sum()
        else:
            self.prob = None
        self.steps_per_epoch = max(1, len(self.indices) // (batch_size * world_size))

    def sample_batch(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        chosen = self.rng.choice(
            self.indices, size=self.batch_size, replace=True, p=self.prob
        )
        src, trg, meta = zip(*(self.dataset[int(i)] for i in chosen))
        return np.stack(src), np.stack(trg), np.stack(meta)

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        for _ in range(self.steps_per_epoch):
            yield self.sample_batch()


def full_batches(
    dataset: TokenDataset,
    batch_size: int,
    indices: np.ndarray | None = None,
) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Deterministic sequential pass over the whole dataset (or the given
    index subset) in batch chunks — the reference's
    `get_dataloader_full(shuffle=False)` (dataset.py:324-332), used by the
    Test Accuracy notebook for its full-corpus evaluation protocol. The
    short final chunk is dropped, matching a drop_last-style fixed batch
    shape (jit-friendly: one compiled shape)."""
    idx = np.arange(len(dataset)) if indices is None else np.asarray(indices)
    for lo in range(0, len(idx) - batch_size + 1, batch_size):
        chosen = idx[lo : lo + batch_size]
        src, trg, meta = zip(*(dataset[int(i)] for i in chosen))
        yield np.stack(src), np.stack(trg), np.stack(meta)


def make_loaders(
    dataset: TokenDataset,
    values: TrainValues = TrainValues(),
    seed: int = 0,
    rank: int = 0,
    world_size: int = 1,
) -> Tuple[BatchIterator, BatchIterator]:
    """(train, test) iterators with the reference's 80/20 split."""
    split = split_dataset(len(dataset), values.test_ratio, seed)
    train = BatchIterator(
        dataset, split.train_indices, values.batch_size, seed, rank, world_size
    )
    test = BatchIterator(
        dataset, split.test_indices, values.batch_size, seed + 1, rank, world_size
    )
    return train, test
