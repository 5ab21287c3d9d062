"""Sharded (pjit) training step builders.

Builds the same fused train step as the single-chip trainers but compiled
against an explicit ``Mesh``: batch sharded over ``data``, parameters
replicated over ``data`` and (optionally) tensor-parallel over ``model``.
XLA inserts the gradient all-reduce over ICI; no hand-written collectives.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from vision_spectra_tpu.data.transforms import train_augment
from vision_spectra_tpu.parallel.mesh import (
    batch_sharding,
    replicated,
    state_shardings,
)
from vision_spectra_tpu.training.state import TrainState, apply_updates


def make_sharded_train_step(
    mesh: Mesh,
    model: Any,
    loss_fn: Callable,
    tx: Any,
    state: TrainState,
    num_channels: int = 3,
    augment: bool = True,
) -> tuple[Callable, TrainState]:
    """Returns (train_step, sharded_state).

    ``train_step(state, images_u8, labels, key, lr)`` is jitted with explicit
    in/out shardings: donated sharded state, data-sharded batch, replicated
    key/lr. The returned state is the input state placed onto the mesh.
    """
    st_shard = state_shardings(mesh, state)
    b_shard = batch_sharding(mesh)
    rep = replicated(mesh)

    def step(state, images_u8, labels, key, lr):
        k_aug, k_drop, k_mask = jax.random.split(key, 3)
        if augment:
            images = train_augment(images_u8, k_aug, num_channels=num_channels)
        else:
            images = images_u8.astype(jnp.float32)

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
        new_state = apply_updates(state, grads, tx, lr, None)
        correct = jnp.sum(jnp.argmax(logits, axis=-1) == labels)
        return new_state, {"loss": loss, "correct": correct}

    train_step = jax.jit(
        step,
        in_shardings=(st_shard, b_shard, b_shard, rep, rep),
        out_shardings=(st_shard, {"loss": rep, "correct": rep}),
        donate_argnums=(0,),
    )
    sharded_state = jax.tree.map(jax.device_put, state, st_shard)
    return train_step, sharded_state
