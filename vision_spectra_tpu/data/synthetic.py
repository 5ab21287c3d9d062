"""Procedural geometric-shapes dataset.

Behavioral parity with the reference generator (reference:
vision_spectra/data/synthetic.py:26-309): five shapes
(circle/square/triangle/star/cross), dark noisy backgrounds (RGB 20-60),
bright shapes (150-255 RGB / 180-255 gray), random position/size, and the
same two-level seed discipline — a split-level ``RandomState(seed)`` draws
per-sample labels and per-sample seeds, then each image is rasterized from
its own ``RandomState(sample_seed)``. Split seeds: train 42 / val 43 / test
44 for the config-driven dataset; ``seed / seed+1 / seed+2`` for the
convenience constructor.

TPU-first difference: images are rasterized **once, eagerly** into a
contiguous uint8 NHWC array (a 5000×28×28×3 split is ~12 MB), so the steady
-state input pipeline never touches PIL — batching is an index gather and all
augmentation runs on-device.
"""

from __future__ import annotations

from pathlib import Path
from typing import TYPE_CHECKING

import numpy as np
from PIL import Image, ImageDraw

from vision_spectra_tpu.data.base import ArraySplit, BaseDataset, DatasetInfo

if TYPE_CHECKING:
    from vision_spectra_tpu.config import DatasetConfig

SHAPES = ["circle", "square", "triangle", "star", "cross"]


def _rasterize_shape(
    label: int, seed: int, image_size: int, num_channels: int
) -> np.ndarray:
    """Draw one sample deterministically from its sample seed.

    The draw-call sequence and RNG consumption order match the reference
    (synthetic.py:73-145) so the produced pixel distributions are identical.
    Returns uint8 [H, W, C].
    """
    rng = np.random.RandomState(seed)

    if num_channels == 1:
        bg = int(rng.randint(20, 60))
        mode = "L"
    else:
        bg = tuple(int(v) for v in rng.randint(20, 60, size=3))
        mode = "RGB"
    img = Image.new(mode, (image_size, image_size), bg)
    draw = ImageDraw.Draw(img)

    if num_channels == 1:
        fill = int(rng.randint(180, 255))
    else:
        fill = tuple(int(v) for v in rng.randint(150, 255, size=3))

    margin = image_size // 6
    size = int(rng.randint(image_size // 3, image_size - 2 * margin))
    x = int(rng.randint(margin, image_size - size - margin))
    y = int(rng.randint(margin, image_size - size - margin))

    shape = SHAPES[label]
    if shape == "circle":
        draw.ellipse([x, y, x + size, y + size], fill=fill)
    elif shape == "square":
        draw.rectangle([x, y, x + size, y + size], fill=fill)
    elif shape == "triangle":
        cx, cy = x + size // 2, y + size // 2
        r = size // 2
        draw.polygon([(cx, cy - r), (cx - r, cy + r), (cx + r, cy + r)], fill=fill)
    elif shape == "star":
        cx, cy = x + size // 2, y + size // 2
        r_out, r_in = size // 2, size // 4
        pts = []
        for i in range(5):
            a_out = np.pi / 2 + i * 2 * np.pi / 5
            a_in = np.pi / 2 + (i + 0.5) * 2 * np.pi / 5
            pts.append((cx + r_out * np.cos(a_out), cy - r_out * np.sin(a_out)))
            pts.append((cx + r_in * np.cos(a_in), cy - r_in * np.sin(a_in)))
        draw.polygon(pts, fill=fill)
    elif shape == "cross":
        w = size // 3
        draw.rectangle(
            [x, y + size // 2 - w // 2, x + size, y + size // 2 + w // 2], fill=fill
        )
        draw.rectangle(
            [x + size // 2 - w // 2, y, x + size // 2 + w // 2, y + size], fill=fill
        )

    arr = np.asarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    return arr


def generate_split(
    num_samples: int,
    num_classes: int,
    image_size: int = 28,
    num_channels: int = 3,
    seed: int = 42,
    backend: str = "auto",
) -> ArraySplit:
    """Rasterize a full split into an :class:`ArraySplit`.

    ``backend``:
    - ``"pil"`` — the reference-parity path (identical pixels to the
      reference's PIL rendering),
    - ``"native"`` — the C++ rasterizer (vision_spectra_tpu/native), ~40×
      faster with a bit-identical RNG stream (same labels / colors /
      geometry parameters) but its own polygon fill rules (statistically
      equivalent shapes, not pixel-identical to PIL),
    - ``"auto"`` (default) — ``pil`` unless ``VISION_SPECTRA_NATIVE_RASTER=1``.
    """
    import os

    num_classes = min(num_classes, len(SHAPES))
    if backend == "auto":
        backend = (
            "native"
            if os.environ.get("VISION_SPECTRA_NATIVE_RASTER") == "1"
            else "pil"
        )
    if backend == "native":
        from vision_spectra_tpu import native

        if native.available():
            images, labels = native.generate_split_native(
                num_samples, num_classes, image_size, num_channels, seed
            )
            return ArraySplit(images, labels)
        # fall through to PIL when no compiler/library is present

    rng = np.random.RandomState(seed)
    labels = rng.randint(0, num_classes, size=num_samples)
    sample_seeds = rng.randint(0, 2**31, size=num_samples)

    images = np.empty(
        (num_samples, image_size, image_size, num_channels), dtype=np.uint8
    )
    for i in range(num_samples):
        images[i] = _rasterize_shape(
            int(labels[i]), int(sample_seeds[i]), image_size, num_channels
        )
    return ArraySplit(images, labels)


class SyntheticDataset(BaseDataset):
    """Config-driven shapes dataset with the reference's fixed split seeds."""

    TRAIN_SEED, VAL_SEED, TEST_SEED = 42, 43, 44

    def __init__(self, config: "DatasetConfig", data_dir: Path) -> None:
        super().__init__(config, data_dir)
        self.num_classes = min(config.num_classes, len(SHAPES))
        self.image_size = config.image_size
        self.num_channels = 3  # RGB, as in the reference

        self._splits: dict[str, ArraySplit] = {}
        sizes = {
            "train": (config.num_samples_train, self.TRAIN_SEED),
            "val": (config.num_samples_val, self.VAL_SEED),
            "test": (config.num_samples_test, self.TEST_SEED),
        }
        for name, (n, seed) in sizes.items():
            self._splits[name] = generate_split(
                n, self.num_classes, self.image_size, self.num_channels, seed
            )

        self._info = DatasetInfo(
            name="synthetic",
            num_classes=self.num_classes,
            num_channels=self.num_channels,
            image_size=(self.image_size, self.image_size),
            train_size=config.num_samples_train,
            val_size=config.num_samples_val,
            test_size=config.num_samples_test,
            class_names=SHAPES[: self.num_classes],
            class_counts={
                name: split.class_counts(self.num_classes)
                for name, split in self._splits.items()
            },
        )

    def get_train_split(self) -> ArraySplit:
        return self._splits["train"]

    def get_val_split(self) -> ArraySplit:
        return self._splits["val"]

    def get_test_split(self) -> ArraySplit:
        return self._splits["test"]

    def get_info(self) -> DatasetInfo:
        return self._info


def create_synthetic_dataset(
    num_classes: int = 5,
    num_samples_train: int = 1000,
    num_samples_val: int = 200,
    num_samples_test: int = 200,
    batch_size: int = 32,
    image_size: int = 28,
    num_channels: int = 3,
    seed: int = 42,
):
    """Configless convenience: three Loaders seeded seed / seed+1 / seed+2.

    Reference: data/synthetic.py:223-309.
    """
    from vision_spectra_tpu.data.base import Loader

    splits = [
        generate_split(n, num_classes, image_size, num_channels, s)
        for n, s in [
            (num_samples_train, seed),
            (num_samples_val, seed + 1),
            (num_samples_test, seed + 2),
        ]
    ]
    train_loader = Loader(splits[0], batch_size, shuffle=True, drop_last=False, seed=seed)
    val_loader = Loader(splits[1], batch_size)
    test_loader = Loader(splits[2], batch_size)
    return train_loader, val_loader, test_loader
