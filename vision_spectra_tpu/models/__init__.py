"""Flax models: ViT classifier, MAE-style MIM, multitask."""

from vision_spectra_tpu.models.mim import (
    MIMDecoder,
    MIMModel,
    mim_reconstruction_loss,
    patchify,
    random_masking,
    unpatchify,
)
from vision_spectra_tpu.models.multitask import MultitaskViT
from vision_spectra_tpu.models.vit import (
    SMALL_IMAGE_MODELS,
    VIT_VARIANTS,
    ViTClassifier,
    ViTDescription,
    build_vit,
    create_vit_classifier,
    get_available_models,
    parse_model_name,
    resolve_use_flash,
)

__all__ = [
    "MIMDecoder",
    "MIMModel",
    "MultitaskViT",
    "SMALL_IMAGE_MODELS",
    "VIT_VARIANTS",
    "ViTClassifier",
    "ViTDescription",
    "build_vit",
    "create_vit_classifier",
    "get_available_models",
    "mim_reconstruction_loss",
    "parse_model_name",
    "patchify",
    "random_masking",
    "resolve_use_flash",
    "unpatchify",
]
