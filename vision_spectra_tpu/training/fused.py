"""Fused-epoch training: the whole epoch as ONE compiled device program.

At this framework's data scale (MedMNIST ≈ 90k × 28×28×3 uint8 ≈ 200 MB) the
entire training split fits in HBM. The TPU-first consequence: upload the
dataset once, then run ``lax.scan`` over shuffled batch indices inside a
single jitted function — on-device permutation, gather, augmentation,
forward/backward, optimizer — with zero per-step host dispatch. On tunneled
attachments (≈1 ms dispatch + 32 ms fetch round trips) this is the difference
between dispatch-bound and compute-bound training.

The per-step trainers (classification.py etc.) remain the general path (they
stream arbitrarily large datasets); ``FusedClassificationTrainer`` is a
drop-in for device-resident datasets.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from vision_spectra_tpu.data.transforms import train_augment
from vision_spectra_tpu.training.classification import ClassificationTrainer
from vision_spectra_tpu.training.state import TrainState, apply_updates

__all__ = ["make_fused_epoch_fn", "FusedClassificationTrainer"]


def make_fused_epoch_fn(
    model: Any,
    loss_fn: Callable,
    tx: Any,
    batch_size: int,
    num_channels: int = 3,
    augment: bool = True,
) -> Callable:
    """Build ``epoch_fn(state, images, labels, key, lr) -> (state, acc)``.

    ``images``: device-resident uint8 [N, H, W, C]; ``labels``: int32 [N].
    Drops the last partial batch (reference train-loader semantics). Returns
    the packed accumulator [loss_sum, correct, count].
    """

    @functools.partial(jax.jit, donate_argnums=(0,))
    def epoch_fn(state: TrainState, images, labels, key, lr):
        n = images.shape[0]
        steps = n // batch_size
        k_perm, k_steps = jax.random.split(key)
        order = jax.random.permutation(k_perm, n)[: steps * batch_size]
        # One whole-array gather per epoch, then contiguous scan slices —
        # per-batch random gathers inside the scan body are ~10x slower on TPU.
        shuffled_images = jnp.take(images, order, axis=0).reshape(
            steps, batch_size, *images.shape[1:]
        )
        shuffled_labels = jnp.take(labels, order, axis=0).reshape(
            steps, batch_size
        )

        def body(carry, step_inputs):
            state, acc = carry
            imgs, labs, i = step_inputs
            k = jax.random.fold_in(k_steps, i)
            k_aug, k_drop = jax.random.split(k)
            if augment:
                x = train_augment(imgs, k_aug, num_channels=num_channels)
            else:
                x = imgs.astype(jnp.float32)

            def compute_loss(params):
                logits = model.apply(
                    {"params": params},
                    x,
                    deterministic=False,
                    rngs={"dropout": k_drop},
                )
                return loss_fn(logits, labs), logits

            (loss, logits), grads = jax.value_and_grad(
                compute_loss, has_aux=True
            )(state.params)
            state = apply_updates(state, grads, tx, lr, None)
            correct = jnp.sum(jnp.argmax(logits, -1) == labs)
            acc = acc + jnp.stack(
                [loss * batch_size, correct.astype(jnp.float32),
                 jnp.float32(batch_size)]
            )
            return (state, acc), None

        acc0 = jnp.zeros((3,), jnp.float32)
        (state, acc), _ = jax.lax.scan(
            body,
            (state, acc0),
            (shuffled_images, shuffled_labels, jnp.arange(steps)),
        )
        return state, acc

    return epoch_fn


class FusedClassificationTrainer(ClassificationTrainer):
    """Classification trainer running each epoch as one fused device program.

    Uploads the train split to HBM once at construction. Validation and all
    host-side behavior (tracking, spectral cadence, checkpoints, scheduler)
    are inherited unchanged.

    Note: warmup LR varies per step on host in the base trainer; here the LR
    is constant within an epoch (evaluated at the epoch's first step), which
    only affects the few warmup epochs and is documented behavior of the
    fused path.
    """

    def _build_step_fns(self) -> None:
        super()._build_step_fns()
        split = self.dataset.get_train_split()
        self._train_images_dev = jax.device_put(split.images)
        self._train_labels_dev = jax.device_put(split.labels)
        self._fused_epoch = make_fused_epoch_fn(
            self.model,
            self.loss_fn,
            self.tx,
            batch_size=self.config.dataset.batch_size,
            num_channels=self.info.num_channels,
        )

    def train_epoch(self, epoch: int) -> dict[str, float]:
        if self.smoke_test:
            # smoke mode caps batches — use the streaming path
            return super().train_epoch(epoch)
        lr = jnp.float32(self.schedule.lr_for_step(self.global_step))
        self.state, acc = self._fused_epoch(
            self.state,
            self._train_images_dev,
            self._train_labels_dev,
            self.step_key(self.global_step),
            lr,
        )
        steps = len(self._train_labels_dev) // self.config.dataset.batch_size
        self.global_step += steps
        loss_sum, correct, count = np.asarray(acc)
        return {
            "loss": float(loss_sum) / max(count, 1),
            "accuracy": float(correct) / max(count, 1),
        }
