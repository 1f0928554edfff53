"""Host-side batch iterator + train/val splitting.

Replaces the reference's torch ``DataLoader`` with worker processes + pin_memory
(src/data_utils.py:7-13) by simple vectorized numpy batching: the datasets here are
small enough to live in host RAM fully decoded, so the fastest loader is a gather —
no worker pool needed.  Device placement (sharded over the mesh's data axis) happens
in the trainer via ``ldm_tpu.parallel.shard_batch``.

``split_train_val`` mirrors ``_split_train_val`` (src/data_utils.py:16-23): sizes are
``int((1-val_split)*n)`` / remainder, split at a seeded random permutation.
"""

from __future__ import annotations

from typing import Iterator, Optional, Tuple

import numpy as np

from ldm_tpu.config import Config
from ldm_tpu.data.datasets import Dataset, get_dataset
from ldm_tpu.data.transforms import scale_to_minus_one_one


def split_train_val(
    dataset: Dataset, val_split: float, seed: int = 42
) -> Tuple[Dataset, Dataset]:
    n = len(dataset)
    n_train = int((1.0 - val_split) * n)
    perm = np.random.default_rng(seed).permutation(n)
    return dataset.subset(perm[:n_train]), dataset.subset(perm[n_train:])


class DataLoader:
    """Deterministic shuffling batch iterator over an in-memory Dataset.

    Yields ``{"image": float32 NHWC in [-1,1], "label": int32}`` batches.  With
    ``drop_last=True`` (default for training) every batch has identical shape, so
    the jitted train step compiles exactly once.
    """

    def __init__(
        self,
        dataset: Dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
        transform=scale_to_minus_one_one,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.transform = transform
        self._rng = np.random.default_rng(seed)
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[dict]:
        n = len(self.dataset)
        order = self._rng.permutation(n) if self.shuffle else np.arange(n)
        self._epoch += 1
        bs = self.batch_size
        end = (n // bs) * bs if self.drop_last else n
        for i in range(0, end, bs):
            idx = order[i : i + bs]
            yield {
                "image": self.transform(self.dataset.images[idx]),
                "label": self.dataset.labels[idx].astype(np.int32),
            }


def create_dataloaders(
    config: Config, allow_synthetic_fallback: bool = True
) -> Tuple[DataLoader, Optional[DataLoader], DataLoader, list]:
    """Train/val/test loaders + class list (reference ``create_dataloaders``,
    src/data_utils.py:26-56)."""
    d = config.data
    trainset = get_dataset(
        d.dataset, d.data_path, d.image_size, train=True,
        debugging=config.debugging,
        allow_synthetic_fallback=allow_synthetic_fallback,
        synthetic_size=d.synthetic_size,
        synthetic_variant=getattr(d, "synthetic_variant", "easy"),
    )
    testset = get_dataset(
        d.dataset, d.data_path, d.image_size, train=False,
        debugging=config.debugging,
        allow_synthetic_fallback=allow_synthetic_fallback,
        synthetic_size=d.synthetic_size,
        synthetic_variant=getattr(d, "synthetic_variant", "easy"),
    )
    classes = trainset.classes
    test_loader = DataLoader(
        testset, config.batch_size, shuffle=False, drop_last=False, seed=config.seed
    )
    if d.val_split > 0:
        tr, va = split_train_val(trainset, d.val_split, config.seed)
        return (
            DataLoader(tr, config.batch_size, seed=config.seed),
            # keep the tail batch: a tiny val set must never yield zero batches
            DataLoader(va, config.batch_size, seed=config.seed + 1, drop_last=False),
            test_loader,
            classes,
        )
    return (
        DataLoader(trainset, config.batch_size, seed=config.seed),
        None,
        test_loader,
        classes,
    )
