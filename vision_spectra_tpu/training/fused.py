"""Fused-epoch training: the whole epoch as ONE compiled device program.

At this framework's data scale (MedMNIST ≈ 90k × 28×28×3 uint8 ≈ 200 MB) the
entire training split fits in HBM. The TPU-first consequence: upload the
dataset once, then run ``lax.scan`` over shuffled batch indices inside a
single jitted function — on-device permutation, gather, augmentation,
forward/backward, optimizer — with zero per-step host dispatch. On tunneled
attachments (≈1 ms dispatch + 32 ms fetch round trips) this is the difference
between dispatch-bound and compute-bound training.

Every regime fuses the same way because every trainer exposes a pure
``_train_core(state, images_u8, labels, key, lr, lr_mult) -> (state, stats)``
(the exact function its streaming step jits — reference equivalents:
vision_spectra/training/classification.py:61-135, mim.py:75-137,
multitask.py:160-223, finetune.py:22-155). The fused epoch scans that core
over the shuffled batches with a **per-step LR array** computed by the host
scheduler, so warmup semantics match the streaming path step-for-step.

The per-step trainers remain the general path (they stream arbitrarily large
datasets); the ``Fused*Trainer`` classes are drop-ins for device-resident
datasets.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from vision_spectra_tpu.data.transforms import train_augment
from vision_spectra_tpu.training.classification import ClassificationTrainer
from vision_spectra_tpu.training.finetune import FinetuneTrainer
from vision_spectra_tpu.training.mim import MIMTrainer
from vision_spectra_tpu.training.multitask import MultitaskTrainer
from vision_spectra_tpu.training.state import TrainState, apply_updates

__all__ = [
    "make_fused_epoch_fn",
    "fuse_train_core",
    "select_trainer",
    "FusedEpochMixin",
    "FusedClassificationTrainer",
    "FusedMIMTrainer",
    "FusedMultitaskTrainer",
    "FusedFinetuneTrainer",
]


def fuse_train_core(
    train_core: Callable,
    batch_size: int,
    stats_len: int,
    mesh: Any | None = None,
    indexed: bool = False,
) -> Callable:
    """Fuse a per-step ``train_core`` into a whole-epoch device program.

    Returns ``epoch_fn(state, images, labels, key, lrs, lr_mult) ->
    (state, stats)`` where ``images``/``labels`` are the device-resident
    full split (uint8 [N, H, W, C] / int32 [N]), ``lrs`` is either a scalar
    LR or a per-step [steps] float32 array (warmup-exact), and ``stats`` is
    the summed ``stats_len``-vector accumulator. Drops the last partial
    batch (reference train-loader semantics).

    With a ``mesh``, a sharding constraint splits each scanned batch over the
    ``data`` axis (the split arrays themselves stay replicated — their length
    need not divide the device count), so every step inside the scan runs
    data-parallel with XLA's gradient all-reduce over ICI.

    ``indexed=True`` selects the zero-copy shuffle: ``train_core`` then has
    signature ``(state, images_full, idx, labels, key, lr, lr_mult)`` and
    receives the untouched resident split plus this step's permutation slice
    — the augmentation kernel DMAs each image by index (ops/aug_warp.py
    ``gather_indices``), so the shuffled copy of the split (150+ MB at the
    flagship scale) is never materialized. Identical math either way: output
    row j augments ``images[order[j]]`` with row-j parameters.
    """
    batch_constraint = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from vision_spectra_tpu.parallel.mesh import DATA_AXIS

        batch_constraint = NamedSharding(mesh, P(None, DATA_AXIS))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def epoch_fn(state: TrainState, images, labels, key, lrs, lr_mult=None):
        n = images.shape[0]
        steps = n // batch_size
        lrs = jnp.broadcast_to(jnp.asarray(lrs, jnp.float32), (steps,))
        k_perm, k_steps = jax.random.split(key)
        order = jax.random.permutation(k_perm, n)[: steps * batch_size]
        shuffled_labels = jnp.take(labels, order, axis=0).reshape(
            steps, batch_size
        )
        if batch_constraint is not None:
            shuffled_labels = jax.lax.with_sharding_constraint(
                shuffled_labels, batch_constraint
            )
        if indexed:
            idxs = order.reshape(steps, batch_size)
            if batch_constraint is not None:
                idxs = jax.lax.with_sharding_constraint(idxs, batch_constraint)

            def body(carry, step_inputs):
                state, acc = carry
                idx, labs, lr, i = step_inputs
                k = jax.random.fold_in(k_steps, i)
                state, stats = train_core(
                    state, images, idx, labs, k, lr, lr_mult
                )
                return (state, acc + stats), None

            xs = (idxs, shuffled_labels, lrs, jnp.arange(steps))
        else:
            # One whole-array gather per epoch, then contiguous scan slices —
            # per-batch random XLA gathers inside the scan body are ~10x
            # slower on TPU (the indexed path above avoids the copy entirely).
            shuffled_images = jnp.take(images, order, axis=0).reshape(
                steps, batch_size, *images.shape[1:]
            )
            if batch_constraint is not None:
                shuffled_images = jax.lax.with_sharding_constraint(
                    shuffled_images, batch_constraint
                )

            def body(carry, step_inputs):
                state, acc = carry
                imgs, labs, lr, i = step_inputs
                k = jax.random.fold_in(k_steps, i)
                state, stats = train_core(state, imgs, labs, k, lr, lr_mult)
                return (state, acc + stats), None

            xs = (shuffled_images, shuffled_labels, lrs, jnp.arange(steps))

        acc0 = jnp.zeros((stats_len,), jnp.float32)
        (state, acc), _ = jax.lax.scan(body, (state, acc0), xs)
        return state, acc

    return epoch_fn


def _augment_supports_indices(augment_fn: Callable) -> bool:
    """Whether ``augment_fn`` accepts the fused index-gather ``indices=``."""
    import inspect

    try:
        return "indices" in inspect.signature(augment_fn).parameters
    except (TypeError, ValueError):
        return False


def make_fused_epoch_fn(
    model: Any,
    loss_fn: Callable,
    tx: Any,
    batch_size: int,
    num_channels: int = 3,
    augment: bool = True,
    augment_fn: Callable | None = None,
    indexed: bool | None = None,
) -> Callable:
    """Standalone classification fused epoch (used by the scenario runner and
    bench.py): ``epoch_fn(state, images, labels, key, lrs) -> (state, acc)``
    with the packed accumulator [loss_sum, correct, count]. ``lrs`` may be a
    scalar (constant-LR recipes) or a per-step array.

    ``indexed=None`` auto-selects the zero-copy shuffle on geometries the
    Pallas warp kernel serves (resolved per input shape at call time).
    """
    if augment_fn is None and augment:
        augment_fn = functools.partial(train_augment, num_channels=num_channels)

    def _step(state, x, labs, k_drop, lr, lr_mult):
        def compute_loss(params):
            logits = model.apply(
                {"params": params},
                x,
                deterministic=False,
                rngs={"dropout": k_drop},
            )
            return loss_fn(logits, labs), logits

        (loss, logits), grads = jax.value_and_grad(compute_loss, has_aux=True)(
            state.params
        )
        state = apply_updates(state, grads, tx, lr, lr_mult)
        correct = jnp.sum(jnp.argmax(logits, -1) == labs)
        stats = jnp.stack(
            [loss * labs.shape[0], correct.astype(jnp.float32),
             jnp.float32(labs.shape[0])]
        )
        return state, stats

    def core(state, imgs, labs, key, lr, lr_mult):
        k_aug, k_drop = jax.random.split(key)
        if augment_fn is not None:
            x = augment_fn(imgs, k_aug)
        else:
            x = imgs.astype(jnp.float32)
        return _step(state, x, labs, k_drop, lr, lr_mult)

    def core_indexed(state, images_full, idx, labs, key, lr, lr_mult):
        k_aug, k_drop = jax.random.split(key)
        x = augment_fn(images_full, k_aug, indices=idx)
        return _step(state, x, labs, k_drop, lr, lr_mult)

    can_index = augment_fn is not None and _augment_supports_indices(augment_fn)
    fns: dict[bool, Callable] = {}

    def epoch_fn(state, images, labels, key, lrs, lr_mult=None):
        if indexed is None:
            from vision_spectra_tpu.ops.aug_warp import use_pallas_warp

            ix = can_index and use_pallas_warp(
                (batch_size, *images.shape[1:])
            )
        else:
            ix = bool(indexed) and can_index
        if ix not in fns:
            fns[ix] = fuse_train_core(
                core_indexed if ix else core, batch_size, stats_len=3,
                indexed=ix,
            )
        return fns[ix](state, images, labels, key, lrs, lr_mult)

    return epoch_fn


class FusedEpochMixin:
    """Runs each epoch as one fused device program.

    Mixes into any trainer exposing ``_train_core`` and ``_stats_len``.
    Uploads the train split to HBM once at construction. Validation and all
    host-side behavior (tracking, spectral cadence, checkpoints, scheduler)
    are inherited unchanged. The per-step LR array reproduces the streaming
    path's warmup semantics exactly.
    """

    def _build_step_fns(self) -> None:
        super()._build_step_fns()
        split = self.dataset.get_train_split()
        if self.mesh is not None:
            # Replicate the resident split (its length need not divide the
            # device count); the in-program constraint shards each batch.
            from vision_spectra_tpu.parallel.mesh import replicated

            rep = replicated(self.mesh)
            self._train_images_dev = jax.device_put(split.images, rep)
            self._train_labels_dev = jax.device_put(split.labels, rep)
        else:
            self._train_images_dev = jax.device_put(split.images)
            self._train_labels_dev = jax.device_put(split.labels)
        # Zero-copy shuffle whenever the regime has an indexed core and the
        # Pallas warp kernel serves this geometry (otherwise the indexed
        # fallback would pay a slow per-step XLA gather inside the scan).
        from vision_spectra_tpu.ops.aug_warp import use_pallas_warp

        bs = self.config.dataset.batch_size
        indexed = self._train_core_indexed is not None and use_pallas_warp(
            (bs, *split.images.shape[1:]), self.mesh
        )
        self._fused_epoch = fuse_train_core(
            self._train_core_indexed if indexed else self._train_core,
            batch_size=bs,
            stats_len=self._stats_len,
            mesh=self.mesh,
            indexed=indexed,
        )

    def train_epoch(self, epoch: int) -> dict[str, float]:
        if self.smoke_test:
            # smoke mode caps batches — use the streaming path
            return super().train_epoch(epoch)
        steps = len(self._train_labels_dev) // self.config.dataset.batch_size
        lrs = np.asarray(
            [self.schedule.lr_for_step(self.global_step + i) for i in range(steps)],
            np.float32,
        )
        self.state, acc = self._fused_epoch(
            self.state,
            self._train_images_dev,
            self._train_labels_dev,
            self.step_key(self.global_step),
            lrs,
            self.lr_mult,
        )
        self.global_step += steps
        return self._metrics_from_stats(np.asarray(acc))


class FusedClassificationTrainer(FusedEpochMixin, ClassificationTrainer):
    """Classification trainer with fused epochs."""


class FusedMIMTrainer(FusedEpochMixin, MIMTrainer):
    """MIM pretraining trainer with fused epochs."""


class FusedMultitaskTrainer(FusedEpochMixin, MultitaskTrainer):
    """Multitask (cls + MIM) trainer with fused epochs."""


class FusedFinetuneTrainer(FusedEpochMixin, FinetuneTrainer):
    """Finetune trainer with fused epochs (the per-leaf LR-multiplier pytree
    is passed into the scanned program like any other argument)."""


_FUSED_BY_REGIME: dict[type, type] = {
    ClassificationTrainer: FusedClassificationTrainer,
    MIMTrainer: FusedMIMTrainer,
    MultitaskTrainer: FusedMultitaskTrainer,
    FinetuneTrainer: FusedFinetuneTrainer,
}


def select_trainer(streaming_cls: type, config: Any, dataset: Any) -> type:
    """Resolve the trainer class a training command should construct.

    The fused-epoch trainer is the product path (it is what bench.py, the
    experiments layer, and the multichip dryrun all run); every CLI training
    command routes through here so users get the benched throughput, not the
    per-step streaming loop — the reference's one command *is* its real
    training path (reference: vision_spectra/cli.py:72-157).

    Falls back to the streaming trainer when:
    - ``config.training.streaming`` (the ``--streaming`` escape hatch),
    - smoke mode (caps batches per epoch; fused epochs always run the full
      split, and the mixin would stream anyway — skip the HBM upload too),
    - the dataset has no device-resident split (``get_train_split``).
    """
    if config.training.streaming or config.training.smoke_test:
        return streaming_cls
    if not hasattr(dataset, "get_train_split"):
        return streaming_cls
    return _FUSED_BY_REGIME.get(streaming_cls, streaming_cls)
