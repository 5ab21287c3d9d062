"""Masked-image-modeling pretraining trainer.

Reference behavior: vision_spectra/training/mim.py:25-166 — loss-only loops
(the model computes its own reconstruction loss; labels are ignored), with
reconstruction-example grids logged instead of prediction grids. Metrics
accumulate on device; one fetch per epoch (see classification.py docstring).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from vision_spectra_tpu.data.transforms import eval_transform, mim_augment
from vision_spectra_tpu.training.base import BaseTrainer
from vision_spectra_tpu.training.state import apply_updates
from vision_spectra_tpu.utils.visualization import save_mim_examples


class MIMTrainer(BaseTrainer):
    # Packed device accumulator layout: [loss_sum, n_batches].
    _stats_len = 2

    def _build_step_fns(self) -> None:
        model = self.model
        tx = self.tx
        num_channels = self.info.num_channels
        mask_ratio = self.config.model.mask_ratio

        def train_core(state, images_u8, labels, key, lr, lr_mult):
            """One MIM step (labels ignored — reference: mim.py:93).

            Returns (state, stats[2]); shared by the streaming step and the
            fused-epoch scan (training/fused.py).
            """
            del labels
            k_aug, k_drop, k_mask = jax.random.split(key, 3)
            images = mim_augment(images_u8, k_aug, num_channels=num_channels)

            def compute_loss(params):
                loss, _pred, _mask = model.apply(
                    {"params": params},
                    images,
                    mask_ratio,
                    deterministic=False,
                    rngs={"dropout": k_drop, "mask": k_mask},
                )
                return loss

            loss, grads = jax.value_and_grad(compute_loss)(state.params)
            state = apply_updates(state, grads, tx, lr, lr_mult)
            return state, jnp.stack([loss, jnp.float32(1.0)])

        @functools.partial(jax.jit, donate_argnums=(0, 4))
        def train_step(state, images_u8, key, lr, acc, lr_mult):
            state, stats = train_core(state, images_u8, None, key, lr, lr_mult)
            return state, acc + stats

        self._train_core = train_core

        @functools.partial(jax.jit, donate_argnums=(3,))
        def eval_step(state, images_u8, key, acc):
            images = eval_transform(images_u8, num_channels=num_channels)
            loss, _pred, _mask = model.apply(
                {"params": state.params},
                images,
                mask_ratio,
                rngs={"mask": key},
            )
            return acc + jnp.stack([loss, jnp.float32(1.0)])

        @jax.jit
        def recon_step(state, images_u8, key):
            images = eval_transform(images_u8, num_channels=num_channels)
            _loss, pred, mask = model.apply(
                {"params": state.params},
                images,
                mask_ratio,
                rngs={"mask": key},
            )
            return images, pred, mask

        self._train_step = train_step
        self._eval_step = eval_step
        self._recon_step = recon_step

    def _metrics_from_stats(self, stats: np.ndarray) -> dict[str, float]:
        loss_sum, batches = stats
        return {"loss": float(loss_sum) / max(batches, 1)}

    def train_epoch(self, epoch: int) -> dict[str, float]:
        acc = jnp.zeros((self._stats_len,), jnp.float32)
        for i, batch in enumerate(self.train_loader):
            if i >= self.num_train_batches:
                break
            lr = jnp.float32(self.schedule.lr_for_step(self.global_step))
            self.state, acc = self._train_step(
                self.state,
                self.put_batch(batch.images),
                self.step_key(self.global_step),
                lr,
                acc,
                self.lr_mult,
            )
            self.global_step += 1
        return self._metrics_from_stats(np.asarray(acc))

    def validate(self) -> dict[str, float]:
        acc = jnp.zeros((2,), jnp.float32)
        for i, batch in enumerate(self.val_loader):
            if i >= self.num_val_batches:
                break
            acc = self._eval_step(
                self.state,
                self.put_batch(batch.images),
                jax.random.fold_in(self._base_key, 10_000_000 + i),
                acc,
            )
        loss_sum, batches = np.asarray(acc)
        return {"loss": float(loss_sum) / max(batches, 1)}

    def _alignment_grads(self):
        """Reconstruction-loss gradients on one batch (no update) for the
        opt-in gradient-alignment instrument (reference ships the math but
        never wires it: metrics/gradient_alignment.py:118-154)."""
        batch = next(iter(self.train_loader), None)
        if batch is None:
            return None
        if not hasattr(self, "_align_grad_fn"):
            model = self.model
            num_channels = self.info.num_channels
            mask_ratio = self.config.model.mask_ratio

            @jax.jit
            def grad_fn(params, images_u8, key):
                k_aug, k_drop, k_mask = jax.random.split(key, 3)
                images = mim_augment(images_u8, k_aug, num_channels=num_channels)

                def loss(p):
                    l, _pred, _mask = model.apply(
                        {"params": p},
                        images,
                        mask_ratio,
                        deterministic=False,
                        rngs={"dropout": k_drop, "mask": k_mask},
                    )
                    return l

                return jax.grad(loss)(params)

            self._align_grad_fn = grad_fn
        return self._align_grad_fn(
            self.state.params,
            self.put_batch(batch.images),
            self.step_key(self.global_step),
        )

    def _save_examples(self, epoch: int) -> None:
        """Reconstruction grids (reference: mim.py:46-73)."""
        batch = next(iter(self.val_loader), None)
        if batch is None:
            return
        images, pred, mask = self._recon_step(
            self.state, batch.images, jax.random.fold_in(self._base_key, 99)
        )
        recon = self.model.apply(
            {"params": self.state.params}, pred, method=self.model.reconstruct
        )
        path = self.temp_dir / "mim_examples.png"
        save_mim_examples(
            np.asarray(images),
            np.asarray(mask),
            np.asarray(recon),
            path,
            patch_size=self.model.encoder.patch_size,
            num_channels=self.info.num_channels,
        )
        from vision_spectra_tpu import tracking

        tracking.log_artifact(path, artifact_path="examples")
