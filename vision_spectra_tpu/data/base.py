"""Array-centric dataset abstractions for the TPU input pipeline.

TPU-first redesign of the reference's torch-DataLoader stack (reference:
vision_spectra/data/base.py:20-132). Instead of per-sample Dataset objects
with worker processes, every dataset materializes its splits as contiguous
uint8 numpy arrays (NHWC); batching is a cheap host-side index gather, and all
augmentation/normalization runs on-device under jit (see data/transforms.py).
This keeps the host path PIL-free per step and feeds the chip fixed-shape
uint8 batches — the layout the ≥10k img/s/chip target requires.

Fixed shapes: the train loader drops the last partial batch (as the reference
does); eval loaders pad the final batch and yield a validity mask so the jitted
eval step never retraces.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from dataclasses import dataclass
from pathlib import Path
from typing import TYPE_CHECKING, Iterator

import numpy as np

if TYPE_CHECKING:
    from vision_spectra_tpu.config import DatasetConfig


@dataclass
class DatasetInfo:
    """Dataset metadata (reference: data/base.py:20-32)."""

    name: str
    num_classes: int
    num_channels: int
    image_size: tuple[int, int]
    train_size: int
    val_size: int
    test_size: int
    class_names: list[str] | None = None
    class_counts: dict[str, np.ndarray] | None = None  # {split: counts}


@dataclass
class Batch:
    """One fixed-shape host batch: uint8 NHWC images + int32 labels + mask."""

    images: np.ndarray  # [B, H, W, C] uint8
    labels: np.ndarray  # [B] int32
    mask: np.ndarray  # [B] float32, 0.0 marks padding rows

    @property
    def size(self) -> int:
        return int(self.mask.sum())


class ArraySplit:
    """One split held fully in host memory as uint8 NHWC + int32 labels."""

    def __init__(self, images: np.ndarray, labels: np.ndarray) -> None:
        assert images.ndim == 4, "images must be [N, H, W, C]"
        self.images = np.ascontiguousarray(images, dtype=np.uint8)
        self.labels = np.ascontiguousarray(labels, dtype=np.int32).reshape(-1)
        assert len(self.images) == len(self.labels)

    def __len__(self) -> int:
        return len(self.images)

    def class_counts(self, num_classes: int) -> np.ndarray:
        return np.bincount(self.labels, minlength=num_classes)


class Loader:
    """Host batcher over an :class:`ArraySplit`.

    - ``shuffle=True`` + ``drop_last=True``: training semantics (new
      permutation per epoch from the loader's own RNG).
    - ``drop_last=False``: eval semantics; the final batch is padded to the
      full batch size and its padding rows carry ``mask == 0``.
    """

    def __init__(
        self,
        split: ArraySplit,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = False,
        seed: int = 0,
    ) -> None:
        self.split = split
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self._rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        n = len(self.split)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    @property
    def num_samples(self) -> int:
        if self.drop_last:
            return len(self) * self.batch_size
        return len(self.split)

    def __iter__(self) -> Iterator[Batch]:
        n = len(self.split)
        order = self._rng.permutation(n) if self.shuffle else np.arange(n)
        b = self.batch_size
        num_full = n // b
        for i in range(num_full):
            idx = order[i * b : (i + 1) * b]
            yield Batch(
                images=self.split.images[idx],
                labels=self.split.labels[idx],
                mask=np.ones(b, dtype=np.float32),
            )
        rem = n - num_full * b
        if rem and not self.drop_last:
            idx = order[num_full * b :]
            images = np.zeros((b,) + self.split.images.shape[1:], dtype=np.uint8)
            labels = np.zeros(b, dtype=np.int32)
            mask = np.zeros(b, dtype=np.float32)
            images[:rem] = self.split.images[idx]
            labels[:rem] = self.split.labels[idx]
            mask[:rem] = 1.0
            yield Batch(images=images, labels=labels, mask=mask)


class BaseDataset(ABC):
    """Abstract dataset with train/val/test splits and loader builders."""

    def __init__(self, config: "DatasetConfig", data_dir: Path) -> None:
        self.config = config
        self.data_dir = Path(data_dir)
        self.data_dir.mkdir(parents=True, exist_ok=True)

    @abstractmethod
    def get_train_split(self) -> ArraySplit: ...

    @abstractmethod
    def get_val_split(self) -> ArraySplit: ...

    @abstractmethod
    def get_test_split(self) -> ArraySplit: ...

    @abstractmethod
    def get_info(self) -> DatasetInfo: ...

    @property
    def data_provenance(self) -> str:
        """``"real"`` or ``"surrogate"`` — surfaced as a run tag so surrogate
        numbers can never silently blend into figures (VERDICT r1 item 3)."""
        return "surrogate" if getattr(self, "surrogate", False) else "real"

    def get_train_loader(self, shuffle: bool = True, seed: int = 0) -> Loader:
        return Loader(
            self.get_train_split(),
            batch_size=self.config.batch_size,
            shuffle=shuffle,
            drop_last=True,
            seed=seed,
        )

    def get_val_loader(self) -> Loader:
        return Loader(self.get_val_split(), batch_size=self.config.batch_size)

    def get_test_loader(self) -> Loader:
        return Loader(self.get_test_split(), batch_size=self.config.batch_size)


def get_dataset(config: "DatasetConfig", data_dir: Path) -> BaseDataset:
    """Factory: dataset by configured name (reference: data/base.py:113-132)."""
    from vision_spectra_tpu.config import DatasetName
    from vision_spectra_tpu.data.medmnist import MedMNISTDataset
    from vision_spectra_tpu.data.synthetic import SyntheticDataset

    if config.name == DatasetName.SYNTHETIC:
        return SyntheticDataset(config, data_dir)
    return MedMNISTDataset(config, data_dir)
