"""Loss registry and config-driven factories.

Reference behavior: vision_spectra/losses/registry.py:32-136. The registries
map names to builder functions returning pure loss callables. As in the
reference, the MIM registry exposes only mse/l1/smooth_l1 (the robust losses
exist, are exported, and are registrable via :func:`register_mim_loss`).
"""

from __future__ import annotations

from typing import Callable

from vision_spectra_tpu.config import LossConfig, LossName, MIMLossName
from vision_spectra_tpu.losses import classification as C
from vision_spectra_tpu.losses import reconstruction as R

LOSS_REGISTRY: dict[str, Callable] = {
    LossName.CROSS_ENTROPY.value: C.make_cross_entropy,
    LossName.FOCAL.value: C.make_focal,
    LossName.LABEL_SMOOTHING.value: C.make_label_smoothing,
    LossName.CLASS_BALANCED.value: C.make_class_balanced,
    LossName.ASYMMETRIC.value: C.make_asymmetric,
}

MIM_LOSS_REGISTRY: dict[str, Callable] = {
    MIMLossName.MSE.value: R.make_mse,
    MIMLossName.L1.value: R.make_l1,
    MIMLossName.SMOOTH_L1.value: R.make_smooth_l1,
}


def get_loss(config: LossConfig, samples_per_class=None) -> C.LossFn:
    """Build the configured classification loss (registry.py:48-90)."""
    name = config.classification.value
    if name == LossName.CROSS_ENTROPY.value:
        return C.make_cross_entropy()
    if name == LossName.FOCAL.value:
        return C.make_focal(gamma=config.focal_gamma, alpha=config.focal_alpha)
    if name == LossName.LABEL_SMOOTHING.value:
        return C.make_label_smoothing(epsilon=config.label_smoothing)
    if name == LossName.CLASS_BALANCED.value:
        if samples_per_class is None:
            raise ValueError(
                "class_balanced loss requires samples_per_class counts"
            )
        return C.make_class_balanced(
            samples_per_class, beta=config.class_balanced_beta
        )
    if name == LossName.ASYMMETRIC.value:
        return C.make_asymmetric()
    raise ValueError(f"Unknown classification loss: {name}")


def get_mim_loss(config: LossConfig) -> R.ReconLossFn:
    """Build the configured MIM reconstruction loss (registry.py:93-110)."""
    name = config.mim.value
    builder = MIM_LOSS_REGISTRY.get(name)
    if builder is None:
        raise ValueError(
            f"Unknown MIM loss: {name}. Registered: {sorted(MIM_LOSS_REGISTRY)}"
        )
    return builder()


def register_loss(name: str, builder: Callable) -> None:
    """Extension hook for custom classification losses (registry.py:113-124)."""
    if not callable(builder):
        raise TypeError("builder must be callable")
    LOSS_REGISTRY[name] = builder


def register_mim_loss(name: str, builder: Callable) -> None:
    """Extension hook for custom MIM losses (registry.py:127-136)."""
    if not callable(builder):
        raise TypeError("builder must be callable")
    MIM_LOSS_REGISTRY[name] = builder
