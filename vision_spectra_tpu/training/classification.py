"""Supervised classification trainer.

Reference behavior: vision_spectra/training/classification.py:28-205. The
whole per-batch pipeline — uint8→float augmentation, forward, loss, backward,
global-norm clip, optimizer — is ONE jitted program with donated state.

Remote-TPU discipline: the train step carries a device-side accumulator
``[loss_sum, correct, count]`` through the epoch and the host fetches it ONCE
per epoch as a 1-D array (per-step scalar fetches pay a full tunnel round
trip each — see utils/transfer.py). Similarly, eval streams a confusion
matrix + loss on device and concatenates probabilities on device before a
single fetch for host-side macro AUROC.

Tracked metrics: train loss/accuracy; val loss/accuracy/f1_macro/auroc.
Model selection: min val loss (reference: classification.py:183-186).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from vision_spectra_tpu.data.transforms import eval_transform
from vision_spectra_tpu.training.base import BaseTrainer
from vision_spectra_tpu.training.metrics import (
    accuracy_from_cm,
    confusion_matrix_update,
    macro_auroc,
    macro_f1_from_cm,
)
from vision_spectra_tpu.training.state import apply_updates
from vision_spectra_tpu.utils.visualization import save_prediction_examples


def make_classification_train_core(model, loss_fn, tx, augment, indexed=False):
    """The ONE classification step definition: ``train_core(state, images_u8,
    labels, key, lr, lr_mult) -> (state, stats[3])`` with the packed
    accumulator [loss_sum, correct, count].

    Every execution mode composes this same function — the streaming jitted
    step and fused-epoch scan (via ``ClassificationTrainer._train_core``) and
    the explicitly-sharded pjit step (tests/helpers_sharded.py) — so the step
    semantics cannot drift between paths (VERDICT r1 item 5).

    With ``indexed=True`` the returned core has signature ``(state,
    images_full, idx, labels, key, lr, lr_mult)``: it augments
    ``images_full[idx]`` via the augmentation's fused index-gather
    (data/transforms.py ``indices=``), which the fused-epoch scan uses to
    shuffle without materializing the shuffled split. Identical math.
    """

    def _step(state, images, labels, k_drop, k_mask, lr, lr_mult):
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
        n = labels.shape[0]
        correct = jnp.sum(jnp.argmax(logits, axis=-1) == labels)
        stats = jnp.stack(
            [loss * n, correct.astype(jnp.float32), jnp.float32(n)]
        )
        return state, stats

    if indexed:
        def train_core(state, images_full, idx, labels, key, lr, lr_mult):
            k_aug, k_drop, k_mask = jax.random.split(key, 3)
            images = augment(images_full, k_aug, indices=idx)
            return _step(state, images, labels, k_drop, k_mask, lr, lr_mult)
    else:
        def train_core(state, images_u8, labels, key, lr, lr_mult):
            k_aug, k_drop, k_mask = jax.random.split(key, 3)
            images = augment(images_u8, k_aug)
            return _step(state, images, labels, k_drop, k_mask, lr, lr_mult)

    return train_core


class ClassificationTrainer(BaseTrainer):
    # Packed device accumulator layout: [loss_sum, correct, count].
    _stats_len = 3

    def _build_step_fns(self) -> None:
        model = self.model
        num_classes = self.info.num_classes
        num_channels = self.info.num_channels
        augment_fn = self._train_augment_fn()
        train_core = make_classification_train_core(
            model, self.loss_fn, self.tx, augment_fn
        )
        # Index-gather variant for the fused-epoch shuffle (training/fused.py);
        # train-mode augments accept ``indices``.
        self._train_core_indexed = make_classification_train_core(
            model, self.loss_fn, self.tx, augment_fn, indexed=True
        )

        @functools.partial(jax.jit, donate_argnums=(0, 6))
        def train_step(state, images_u8, labels, key, lr, lr_mult, acc):
            state, stats = train_core(state, images_u8, labels, key, lr, lr_mult)
            return state, acc + stats

        self._train_core = train_core

        @functools.partial(jax.jit, donate_argnums=(4,))
        def eval_step(state, images_u8, labels, mask, stats):
            """stats: [1 + C*C] = [loss_sum, cm.ravel()]. Returns stats, probs."""
            images = eval_transform(images_u8, num_channels=num_channels)
            logits = model.apply({"params": state.params}, images)
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            per_sample = -jnp.take_along_axis(
                jax.nn.log_softmax(logits, axis=-1), labels[:, None], axis=-1
            )[:, 0]
            loss_sum = jnp.sum(per_sample * mask)
            preds = jnp.argmax(logits, axis=-1)
            cm = confusion_matrix_update(
                stats[1:].reshape(num_classes, num_classes), preds, labels, mask
            )
            stats = jnp.concatenate([(stats[0] + loss_sum)[None], cm.ravel()])
            return stats, probs

        self._train_step = train_step
        self._eval_step = eval_step
        self._num_classes = num_classes

    def _metrics_from_stats(self, stats: np.ndarray) -> dict[str, float]:
        loss_sum, correct, count = stats
        return {
            "loss": float(loss_sum) / max(count, 1),
            "accuracy": float(correct) / max(count, 1),
        }

    def train_epoch(self, epoch: int) -> dict[str, float]:
        acc = jnp.zeros((self._stats_len,), jnp.float32)
        for i, batch in enumerate(self.train_loader):
            if i >= self.num_train_batches:
                break
            lr = jnp.float32(self.schedule.lr_for_step(self.global_step))
            images, labels = self.put_batch(batch.images, batch.labels)
            self.state, acc = self._train_step(
                self.state,
                images,
                labels,
                self.step_key(self.global_step),
                lr,
                self.lr_mult,
                acc,
            )
            self.global_step += 1
        return self._metrics_from_stats(np.asarray(acc))  # single device fetch

    def validate(self) -> dict[str, float]:
        c = self._num_classes
        stats = jnp.zeros((1 + c * c,), jnp.float32)
        probs_parts = []
        labels_parts = []
        mask_parts = []
        for i, batch in enumerate(self.val_loader):
            if i >= self.num_val_batches:
                break
            images, labels, mask = self.put_batch(
                batch.images, batch.labels, batch.mask
            )
            stats, probs = self._eval_step(self.state, images, labels, mask, stats)
            probs_parts.append(probs)  # stays on device
            labels_parts.append(batch.labels)
            mask_parts.append(batch.mask)
        stats_np = np.asarray(stats)  # one fetch
        cm = stats_np[1:].reshape(c, c)
        n = cm.sum()
        if probs_parts:
            probs = np.asarray(jnp.concatenate(probs_parts))  # one fetch
            labels = np.concatenate(labels_parts)
            masks = np.concatenate(mask_parts)
            valid = masks > 0
            auroc = macro_auroc(probs[valid], labels[valid], c)
        else:
            auroc = float("nan")
        return {
            "loss": float(stats_np[0]) / max(n, 1),
            "accuracy": accuracy_from_cm(cm),
            "f1_macro": macro_f1_from_cm(cm),
            "auroc": auroc,
        }

    def _alignment_grads(self):
        """Training-loss gradients on one batch (no update) for the opt-in
        gradient-alignment instrument (see BaseTrainer._log_gradient_alignment).
        """
        batch = next(iter(self.train_loader), None)
        if batch is None:
            return None
        if not hasattr(self, "_align_grad_fn"):
            model = self.model
            loss_fn = self.loss_fn
            augment = self._train_augment_fn()

            @jax.jit
            def grad_fn(params, images_u8, labels, key):
                k_aug, k_drop, k_mask = jax.random.split(key, 3)
                images = augment(images_u8, k_aug)

                def loss(p):
                    logits = model.apply(
                        {"params": p},
                        images,
                        deterministic=False,
                        rngs={"dropout": k_drop, "mask": k_mask},
                    )
                    return loss_fn(logits, labels)

                return jax.grad(loss)(params)

            self._align_grad_fn = grad_fn
        images, labels = self.put_batch(batch.images, batch.labels)
        return self._align_grad_fn(
            self.state.params, images, labels, self.step_key(self.global_step)
        )

    def _save_examples(self, epoch: int) -> None:
        """Prediction grids for the best epoch (reference: base.py:277-292)."""
        batch = next(iter(self.val_loader), None)
        if batch is None:
            return
        images = eval_transform(batch.images, num_channels=self.info.num_channels)
        logits = self.model.apply({"params": self.state.params}, images)
        probs = np.asarray(jax.nn.softmax(logits, axis=-1))
        images = np.asarray(images)
        preds = probs.argmax(axis=-1)
        valid = batch.mask > 0
        for mode in ("all", "correct", "incorrect"):
            path = self.temp_dir / f"predictions_{mode}.png"
            out = save_prediction_examples(
                images[valid],
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
