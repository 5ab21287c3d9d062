"""Host input pipelines + device-side transforms."""

from vision_spectra_tpu.data.base import (
    ArraySplit,
    BaseDataset,
    Batch,
    DatasetInfo,
    Loader,
    get_dataset,
)
from vision_spectra_tpu.data.medmnist import MEDMNIST_INFO, MedMNISTDataset, download_medmnist
from vision_spectra_tpu.data.synthetic import (
    SHAPES,
    SyntheticDataset,
    create_synthetic_dataset,
    generate_split,
)
from vision_spectra_tpu.data.transforms import (
    denormalize,
    eval_transform,
    make_augment_fn,
    mim_augment,
    normalize,
    train_augment,
)

__all__ = [
    "MEDMNIST_INFO",
    "SHAPES",
    "ArraySplit",
    "BaseDataset",
    "Batch",
    "DatasetInfo",
    "Loader",
    "MedMNISTDataset",
    "SyntheticDataset",
    "create_synthetic_dataset",
    "denormalize",
    "download_medmnist",
    "eval_transform",
    "generate_split",
    "get_dataset",
    "make_augment_fn",
    "mim_augment",
    "normalize",
    "train_augment",
]
