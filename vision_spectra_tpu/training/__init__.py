"""Training: jitted steps + host epoch drivers per regime."""

from vision_spectra_tpu.training.base import BaseTrainer
from vision_spectra_tpu.training.classification import (
    ClassificationTrainer,
    evaluate_model,
)
from vision_spectra_tpu.training.finetune import FinetuneTrainer, load_pretrained_params
from vision_spectra_tpu.training.fused import (
    FusedClassificationTrainer,
    FusedFinetuneTrainer,
    FusedMIMTrainer,
    FusedMultitaskTrainer,
    make_fused_epoch_fn,
    select_trainer,
)
from vision_spectra_tpu.training.metrics import (
    accuracy_from_cm,
    confusion_matrix_update,
    macro_auroc,
    macro_f1_from_cm,
)
from vision_spectra_tpu.training.mim import MIMTrainer
from vision_spectra_tpu.training.multitask import MultitaskTrainer
from vision_spectra_tpu.training.schedules import LRSchedule
from vision_spectra_tpu.training.state import (
    TrainState,
    apply_updates,
    build_lr_mult,
    make_optimizer,
)

__all__ = [
    "BaseTrainer",
    "ClassificationTrainer",
    "FinetuneTrainer",
    "FusedClassificationTrainer",
    "FusedFinetuneTrainer",
    "FusedMIMTrainer",
    "FusedMultitaskTrainer",
    "make_fused_epoch_fn",
    "LRSchedule",
    "MIMTrainer",
    "MultitaskTrainer",
    "TrainState",
    "accuracy_from_cm",
    "apply_updates",
    "build_lr_mult",
    "confusion_matrix_update",
    "evaluate_model",
    "load_pretrained_params",
    "macro_auroc",
    "macro_f1_from_cm",
    "make_optimizer",
    "select_trainer",
]
