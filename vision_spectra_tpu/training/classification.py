"""Supervised classification trainer.

Reference behavior: vision_spectra/training/classification.py:28-205. The
whole per-batch pipeline — uint8→float augmentation, forward, loss, backward,
global-norm clip, optimizer — is ONE jitted program with donated state; the
eval step streams a confusion matrix on device and returns probabilities for
host-side macro AUROC.

Tracked metrics: train loss/accuracy; val loss/accuracy/f1_macro/auroc.
Model selection: min val loss (reference: classification.py:183-186).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from vision_spectra_tpu.data.transforms import eval_transform, train_augment
from vision_spectra_tpu.training.base import BaseTrainer
from vision_spectra_tpu.training.metrics import (
    accuracy_from_cm,
    confusion_matrix_update,
    macro_auroc,
    macro_f1_from_cm,
)
from vision_spectra_tpu.training.state import apply_updates
from vision_spectra_tpu.utils.visualization import save_prediction_examples


class ClassificationTrainer(BaseTrainer):
    def _build_step_fns(self) -> None:
        model = self.model
        loss_fn = self.loss_fn
        tx = self.tx
        num_channels = self.info.num_channels
        num_classes = self.info.num_classes

        @functools.partial(jax.jit, donate_argnums=(0,))
        def train_step(state, images_u8, labels, key, lr, lr_mult):
            k_aug, k_drop, k_mask = jax.random.split(key, 3)
            images = train_augment(images_u8, k_aug, num_channels=num_channels)

            def compute_loss(params):
                logits = model.apply(
                    {"params": params},
                    images,
                    deterministic=False,
                    rngs={"dropout": k_drop, "mask": k_mask},
                )
                return loss_fn(logits, labels), logits

            (loss, logits), grads = jax.value_and_grad(compute_loss, has_aux=True)(
                state.params
            )
            state = apply_updates(state, grads, tx, lr, lr_mult)
            correct = jnp.sum(jnp.argmax(logits, axis=-1) == labels)
            return state, {"loss": loss, "correct": correct}

        @jax.jit
        def eval_step(state, images_u8, labels, mask, cm):
            images = eval_transform(images_u8, num_channels=num_channels)
            logits = model.apply({"params": state.params}, images)
            probs = jax.nn.softmax(logits, axis=-1)
            per_sample = -jnp.take_along_axis(
                jax.nn.log_softmax(logits, axis=-1), labels[:, None], axis=-1
            )[:, 0]
            loss_sum = jnp.sum(per_sample * mask)
            preds = jnp.argmax(logits, axis=-1)
            cm = confusion_matrix_update(cm, preds, labels, mask)
            return loss_sum, cm, probs

        self._train_step = train_step
        self._eval_step = eval_step
        self._num_classes = num_classes

    def train_epoch(self, epoch: int) -> dict[str, float]:
        total_loss = 0.0
        total_correct = 0
        total_seen = 0
        for i, batch in enumerate(self.train_loader):
            if i >= self.num_train_batches:
                break
            step = int(self.state.step)
            lr = jnp.float32(self.schedule.lr_for_step(step))
            self.state, metrics = self._train_step(
                self.state,
                batch.images,
                batch.labels,
                self.step_key(step),
                lr,
                self.lr_mult,
            )
            total_loss += float(metrics["loss"]) * len(batch.labels)
            total_correct += int(metrics["correct"])
            total_seen += len(batch.labels)
        return {
            "loss": total_loss / max(total_seen, 1),
            "accuracy": total_correct / max(total_seen, 1),
        }

    def validate(self) -> dict[str, float]:
        c = self._num_classes
        cm = jnp.zeros((c, c), jnp.float32)
        loss_sum = 0.0
        all_probs: list[np.ndarray] = []
        all_labels: list[np.ndarray] = []
        all_masks: list[np.ndarray] = []
        for i, batch in enumerate(self.val_loader):
            if i >= self.num_val_batches:
                break
            ls, cm, probs = self._eval_step(
                self.state, batch.images, batch.labels, batch.mask, cm
            )
            loss_sum += float(ls)
            all_probs.append(np.asarray(probs))
            all_labels.append(batch.labels)
            all_masks.append(batch.mask)
        cm_np = np.asarray(cm)
        n = cm_np.sum()
        probs = np.concatenate(all_probs) if all_probs else np.zeros((0, c))
        labels = np.concatenate(all_labels) if all_labels else np.zeros(0, np.int32)
        masks = np.concatenate(all_masks) if all_masks else np.zeros(0)
        valid = masks > 0
        return {
            "loss": loss_sum / max(n, 1),
            "accuracy": accuracy_from_cm(cm_np),
            "f1_macro": macro_f1_from_cm(cm_np),
            "auroc": macro_auroc(probs[valid], labels[valid], c),
        }

    def _save_examples(self, epoch: int) -> None:
        """Prediction grids for the best epoch (reference: base.py:277-292)."""
        batch = next(iter(self.val_loader), None)
        if batch is None:
            return
        images = eval_transform(batch.images, num_channels=self.info.num_channels)
        logits = self.model.apply({"params": self.state.params}, images)
        probs = np.asarray(jax.nn.softmax(logits, axis=-1))
        preds = probs.argmax(axis=-1)
        valid = batch.mask > 0
        for mode in ("all", "correct", "incorrect"):
            path = self.temp_dir / f"predictions_{mode}.png"
            out = save_prediction_examples(
                np.asarray(images)[valid],
                batch.labels[valid],
                preds[valid],
                probs[valid],
                path,
                class_names=self.info.class_names,
                mode=mode,
                num_channels=self.info.num_channels,
            )
            if out is not None:
                from vision_spectra_tpu import tracking

                tracking.log_artifact(out, artifact_path="examples")


def evaluate_model(
    model: Any,
    params: Any,
    loader,
    num_classes: int,
    num_channels: int = 3,
) -> dict[str, float]:
    """Standalone evaluation (used by the CLI ``eval`` command)."""

    @jax.jit
    def step(params, images_u8, labels, mask, cm):
        images = eval_transform(images_u8, num_channels=num_channels)
        logits = model.apply({"params": params}, images)
        preds = jnp.argmax(logits, axis=-1)
        return confusion_matrix_update(cm, preds, labels, mask)

    cm = jnp.zeros((num_classes, num_classes), jnp.float32)
    for batch in loader:
        cm = step(params, batch.images, batch.labels, batch.mask, cm)
    cm_np = np.asarray(cm)
    return {
        "accuracy": accuracy_from_cm(cm_np),
        "f1_macro": macro_f1_from_cm(cm_np),
    }
