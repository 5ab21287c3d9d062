"""Multitask (classification + MIM) trainer.

Reference behavior: vision_spectra/training/multitask.py:27-297 —
``loss = cls_weight · cls_loss + mim_weight · mim_loss`` computed from the
model's ``forward_multitask`` in one step; tracks loss/cls_loss/mim_loss/
accuracy (plus f1 on val). Device-side metric accumulation, one fetch per
epoch (see classification.py docstring).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from vision_spectra_tpu.data.transforms import eval_transform
from vision_spectra_tpu.training.base import BaseTrainer
from vision_spectra_tpu.training.metrics import (
    accuracy_from_cm,
    confusion_matrix_update,
    macro_f1_from_cm,
)
from vision_spectra_tpu.training.state import apply_updates
from vision_spectra_tpu.utils.visualization import (
    save_mim_examples,
    save_prediction_examples,
)


class MultitaskTrainer(BaseTrainer):
    # Packed device accumulator layout: [total·n, cls·n, mim·n, correct, n].
    _stats_len = 5

    # The MIM branch computes its reconstruction target from the model input
    # (models/mim.py:mim_reconstruction_loss); bf16 input would quantize the
    # per-patch normalized target and change the objective, so the augment
    # output stays f32 here (reference computes the target in f32).
    _aug_bf16_emit = False

    def _build_step_fns(self) -> None:
        model = self.model
        loss_fn = self.loss_fn
        tx = self.tx
        num_channels = self.info.num_channels
        num_classes = self.info.num_classes
        cls_w = self.config.loss.mtl_cls_weight
        mim_w = self.config.loss.mtl_mim_weight
        mask_ratio = self.config.model.mask_ratio

        augment = self._train_augment_fn()

        def _step(state, images, labels, k_drop, k_mask, lr, lr_mult):
            def compute_loss(params):
                logits, mim_loss, _pred, _mask = model.apply(
                    {"params": params},
                    images,
                    mode="multitask",
                    mask_ratio=mask_ratio,
                    deterministic=False,
                    rngs={"dropout": k_drop, "mask": k_mask},
                )
                cls_loss = loss_fn(logits, labels)
                total = cls_w * cls_loss + mim_w * mim_loss
                return total, (cls_loss, mim_loss, logits)

            (total, (cls_loss, mim_loss, logits)), grads = jax.value_and_grad(
                compute_loss, has_aux=True
            )(state.params)
            state = apply_updates(state, grads, tx, lr, lr_mult)
            n = labels.shape[0]
            correct = jnp.sum(jnp.argmax(logits, axis=-1) == labels)
            stats = jnp.stack(
                [
                    total * n,
                    cls_loss * n,
                    mim_loss * n,
                    correct.astype(jnp.float32),
                    jnp.float32(n),
                ]
            )
            return state, stats

        def train_core(state, images_u8, labels, key, lr, lr_mult):
            """One multitask step; returns (state, stats[5]) with stats =
            [total·n, cls·n, mim·n, correct, n]. Shared by the streaming step
            and the fused-epoch scan (training/fused.py)."""
            k_aug, k_drop, k_mask = jax.random.split(key, 3)
            images = augment(images_u8, k_aug)
            return _step(state, images, labels, k_drop, k_mask, lr, lr_mult)

        def train_core_indexed(state, images_full, idx, labels, key, lr,
                               lr_mult):
            """Zero-copy fused-epoch variant: augments ``images_full[idx]``
            via the augmentation's fused index-gather (identical math)."""
            k_aug, k_drop, k_mask = jax.random.split(key, 3)
            images = augment(images_full, k_aug, indices=idx)
            return _step(state, images, labels, k_drop, k_mask, lr, lr_mult)

        @functools.partial(jax.jit, donate_argnums=(0, 6))
        def train_step(state, images_u8, labels, key, lr, lr_mult, acc):
            state, stats = train_core(state, images_u8, labels, key, lr, lr_mult)
            return state, acc + stats

        self._train_core = train_core
        self._train_core_indexed = train_core_indexed

        @functools.partial(jax.jit, donate_argnums=(5,))
        def eval_step(state, images_u8, labels, mask, key, stats):
            """stats: [cls_loss_sum, mim_loss_sum, batches, cm.ravel()]."""
            images = eval_transform(images_u8, num_channels=num_channels)
            logits, mim_loss, _pred, _mask = model.apply(
                {"params": state.params},
                images,
                mode="multitask",
                mask_ratio=mask_ratio,
                rngs={"mask": key},
            )
            per_sample = -jnp.take_along_axis(
                jax.nn.log_softmax(logits, axis=-1), labels[:, None], axis=-1
            )[:, 0]
            cls_loss_sum = jnp.sum(per_sample * mask)
            preds = jnp.argmax(logits, axis=-1)
            cm = confusion_matrix_update(
                stats[3:].reshape(num_classes, num_classes), preds, labels, mask
            )
            head = jnp.stack(
                [stats[0] + cls_loss_sum, stats[1] + mim_loss, stats[2] + 1.0]
            )
            return jnp.concatenate([head, cm.ravel()])

        @jax.jit
        def recon_step(state, images_u8, key):
            images = eval_transform(images_u8, num_channels=num_channels)
            logits, _mim_loss, pred, patch_mask = model.apply(
                {"params": state.params},
                images,
                mode="multitask",
                mask_ratio=mask_ratio,
                rngs={"mask": key},
            )
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            return images, probs, pred, patch_mask

        self._train_step = train_step
        self._eval_step = eval_step
        self._recon_step = recon_step
        self._num_classes = num_classes
        self._cls_w, self._mim_w = cls_w, mim_w

    def _metrics_from_stats(self, stats: np.ndarray) -> dict[str, float]:
        total, cls, mim, correct, n = stats
        n = max(n, 1)
        return {
            "loss": float(total) / n,
            "cls_loss": float(cls) / n,
            "mim_loss": float(mim) / n,
            "accuracy": float(correct) / n,
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
        return self._metrics_from_stats(np.asarray(acc))

    def validate(self) -> dict[str, float]:
        c = self._num_classes
        stats = jnp.zeros((3 + c * c,), jnp.float32)
        for i, batch in enumerate(self.val_loader):
            if i >= self.num_val_batches:
                break
            images, labels, mask = self.put_batch(
                batch.images, batch.labels, batch.mask
            )
            stats = self._eval_step(
                self.state,
                images,
                labels,
                mask,
                jax.random.fold_in(self._base_key, 20_000_000 + i),
                stats,
            )
        stats_np = np.asarray(stats)
        cm = stats_np[3:].reshape(c, c)
        n = max(cm.sum(), 1)
        batches = max(stats_np[2], 1)
        cls_loss = float(stats_np[0]) / n
        mim_loss = float(stats_np[1]) / batches
        return {
            "loss": self._cls_w * cls_loss + self._mim_w * mim_loss,
            "cls_loss": cls_loss,
            "mim_loss": mim_loss,
            "accuracy": accuracy_from_cm(cm),
            "f1_macro": macro_f1_from_cm(cm),
        }

    def _alignment_grads(self):
        """Weighted multitask-loss gradients on one batch (no update) for the
        opt-in gradient-alignment instrument (see
        BaseTrainer._log_gradient_alignment)."""
        batch = next(iter(self.train_loader), None)
        if batch is None:
            return None
        if not hasattr(self, "_align_grad_fn"):
            model = self.model
            loss_fn = self.loss_fn
            augment = self._train_augment_fn()
            mask_ratio = self.config.model.mask_ratio
            cls_w = self._cls_w
            mim_w = self._mim_w

            @jax.jit
            def grad_fn(params, images_u8, labels, key):
                k_aug, k_drop, k_mask = jax.random.split(key, 3)
                images = augment(images_u8, k_aug)

                def loss(p):
                    logits, mim_loss, _pred, _mask = model.apply(
                        {"params": p},
                        images,
                        mode="multitask",
                        mask_ratio=mask_ratio,
                        deterministic=False,
                        rngs={"dropout": k_drop, "mask": k_mask},
                    )
                    return cls_w * loss_fn(logits, labels) + mim_w * mim_loss

                return jax.grad(loss)(params)

            self._align_grad_fn = grad_fn
        images, labels = self.put_batch(batch.images, batch.labels)
        return self._align_grad_fn(
            self.state.params, images, labels, self.step_key(self.global_step)
        )

    def _save_examples(self, epoch: int) -> None:
        """Both prediction and MIM grids (reference: multitask.py:96-124)."""
        from vision_spectra_tpu import tracking
        from vision_spectra_tpu.models.mim import unpatchify

        batch = next(iter(self.val_loader), None)
        if batch is None:
            return
        images, probs, pred, patch_mask = self._recon_step(
            self.state, batch.images, jax.random.fold_in(self._base_key, 98)
        )
        images = np.asarray(images)
        probs = np.asarray(probs)
        valid = batch.mask > 0
        out = save_prediction_examples(
            images[valid],
            batch.labels[valid],
            probs.argmax(axis=-1)[valid],
            probs[valid],
            self.temp_dir / "predictions_all.png",
            class_names=self.info.class_names,
            num_channels=self.info.num_channels,
        )
        if out is not None:
            tracking.log_artifact(out, artifact_path="examples")

        enc = self.model.encoder
        recon = unpatchify(
            np.asarray(pred), enc.patch_size, enc.image_size, enc.num_channels
        )
        path = save_mim_examples(
            images,
            np.asarray(patch_mask),
            np.asarray(recon),
            self.temp_dir / "mim_examples.png",
            patch_size=enc.patch_size,
            num_channels=self.info.num_channels,
        )
        tracking.log_artifact(path, artifact_path="examples")
