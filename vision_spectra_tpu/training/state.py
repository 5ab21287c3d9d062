"""Train state and optimizer construction.

The optimizer is an optax transform chain **without** a learning-rate scale:
``clip_by_global_norm → scale_by_adam/sgd → add_decayed_weights``; the jitted
train step applies ``param -= lr · mult · update`` where ``lr`` is a traced
scalar from the host scheduler (see training/schedules.py) and ``mult`` is an
optional per-leaf multiplier pytree (layer-wise LR for finetuning, 0.0 for
frozen subtrees — reference: training/finetune.py:102-155).

Reference optimizer factory: training/base.py:110-137 (adam / adamw / sgd
with betas, momentum, weight decay).
"""

from __future__ import annotations

from typing import Any, Callable

import flax.struct
import jax
import jax.numpy as jnp
import optax

from vision_spectra_tpu.config import OptimizerConfig, OptimizerName


@flax.struct.dataclass
class TrainState:
    """Pure pytree train state (no bound functions; fully shardable)."""

    step: jnp.ndarray  # int32 scalar
    params: Any
    opt_state: Any

    @classmethod
    def create(cls, params: Any, tx: optax.GradientTransformation) -> "TrainState":
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
        )


def make_optimizer(
    config: OptimizerConfig, gradient_clip: float = 0.0
) -> optax.GradientTransformation:
    """Build the lr-free transform chain for the configured optimizer."""
    parts: list[optax.GradientTransformation] = []
    if gradient_clip and gradient_clip > 0:
        parts.append(optax.clip_by_global_norm(gradient_clip))
    name = config.name
    if name == OptimizerName.ADAMW:
        parts.append(optax.scale_by_adam(b1=config.betas[0], b2=config.betas[1]))
        if config.weight_decay > 0:
            parts.append(optax.add_decayed_weights(config.weight_decay))
    elif name == OptimizerName.ADAM:
        parts.append(optax.scale_by_adam(b1=config.betas[0], b2=config.betas[1]))
    elif name == OptimizerName.SGD:
        if config.momentum > 0:
            parts.append(optax.trace(decay=config.momentum))
        if config.weight_decay > 0:
            parts.append(optax.add_decayed_weights(config.weight_decay))
    else:
        raise ValueError(f"Unknown optimizer: {name}")
    return optax.chain(*parts)


def apply_updates(
    state: TrainState,
    grads: Any,
    tx: optax.GradientTransformation,
    lr: jnp.ndarray,
    lr_mult: Any | None = None,
) -> TrainState:
    """One optimizer step with traced LR and optional per-leaf multipliers."""
    updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
    if lr_mult is None:
        updates = jax.tree.map(lambda u: -lr * u, updates)
    else:
        updates = jax.tree.map(lambda u, m: -lr * m * u, updates, lr_mult)
    new_params = optax.apply_updates(state.params, updates)
    return state.replace(
        step=state.step + 1, params=new_params, opt_state=new_opt_state
    )


def build_lr_mult(
    params: Any, rules: list[tuple[str, float]], default: float = 1.0
) -> Any:
    """Per-leaf LR multiplier pytree from (path-substring, multiplier) rules.

    First matching rule wins; paths are dotted (e.g. ``blocks.0.attn.qkv``).
    Used for finetune layer-wise LR (encoder · scale) and freezing (0.0).
    """

    def leaf_mult(path, _leaf):
        name = ".".join(str(getattr(p, "key", p)) for p in path)
        for substr, mult in rules:
            if substr in name:
                return mult
        return default

    return jax.tree_util.tree_map_with_path(leaf_mult, params)


StepFn = Callable[..., tuple[TrainState, dict[str, jnp.ndarray]]]
