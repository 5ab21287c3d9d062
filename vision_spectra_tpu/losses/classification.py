"""Classification losses as pure JAX functions.

Reference behavior: vision_spectra/losses/classification.py:19-294. Each loss
is a pure ``(logits, labels) -> scalar`` function (plus builder helpers that
close over hyperparameters), so they inline into the jitted train step and
fuse with the softmax/backward — there is no module state.

Losses:
- cross entropy (optional class weights; torch weighted-mean semantics)
- focal: ``FL = (1 − p_t)^γ · CE`` with optional scalar/per-class α
- label smoothing: soft-target CE with ``(1−ε)·onehot + ε/C``
- class-balanced (Cui et al. 2019): weights ``(1−β)/(1−β^{n_c})`` normalized
  to sum to C, applied to CE or focal
- asymmetric (Ridnik et al. 2021): sigmoid multi-label with probability
  clipping, γ⁻ = 4, γ⁺ = 1
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

LossFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def _log_softmax(logits: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)


def _per_sample_ce(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    logp = _log_softmax(logits)
    return -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]


def cross_entropy_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    weight: jnp.ndarray | None = None,
    reduction: str = "mean",
) -> jnp.ndarray:
    """CE with optional class weights (torch semantics: weighted mean)."""
    ce = _per_sample_ce(logits, labels)
    if weight is not None:
        w = jnp.asarray(weight)[labels]
        ce = ce * w
        if reduction == "mean":
            return ce.sum() / jnp.maximum(w.sum(), 1e-12)
    if reduction == "mean":
        return ce.mean()
    if reduction == "sum":
        return ce.sum()
    return ce


def focal_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    gamma: float = 2.0,
    alpha: float | jnp.ndarray | None = None,
    reduction: str = "mean",
) -> jnp.ndarray:
    """Focal loss: down-weights easy examples by ``(1 − p_t)^γ``."""
    ce = _per_sample_ce(logits, labels)
    p_t = jnp.exp(-ce)
    loss = (1.0 - p_t) ** gamma * ce
    if alpha is not None:
        if np.isscalar(alpha):
            loss = alpha * loss
        else:
            loss = jnp.asarray(alpha)[labels] * loss
    if reduction == "mean":
        return loss.mean()
    if reduction == "sum":
        return loss.sum()
    return loss


def label_smoothing_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    epsilon: float = 0.1,
    reduction: str = "mean",
) -> jnp.ndarray:
    """Soft-target CE: ``y = (1−ε)·onehot + ε/C``."""
    if not 0 <= epsilon < 1:
        raise ValueError(f"epsilon must be in [0, 1), got {epsilon}")
    num_classes = logits.shape[-1]
    logp = _log_softmax(logits)
    onehot = jax.nn.one_hot(labels, num_classes, dtype=logp.dtype)
    smooth = (1.0 - epsilon) * onehot + epsilon / num_classes
    loss = -(smooth * logp).sum(axis=-1)
    if reduction == "mean":
        return loss.mean()
    if reduction == "sum":
        return loss.sum()
    return loss


def class_balanced_weights(
    samples_per_class: np.ndarray | list[int], beta: float = 0.9999
) -> np.ndarray:
    """Per-class weights ``(1−β)/(1−β^{n_c})`` normalized to sum to C."""
    n = np.asarray(samples_per_class, dtype=np.float64)
    effective = 1.0 - np.power(beta, n)
    w = (1.0 - beta) / (effective + 1e-8)
    return (w / w.sum() * len(w)).astype(np.float32)


def class_balanced_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    samples_per_class: np.ndarray | list[int],
    beta: float = 0.9999,
    loss_type: str = "cross_entropy",
    gamma: float = 2.0,
) -> jnp.ndarray:
    """Class-balanced CE/focal on effective number of samples."""
    weights = jnp.asarray(class_balanced_weights(samples_per_class, beta))
    sample_w = weights[labels]
    ce = _per_sample_ce(logits, labels)
    if loss_type == "focal":
        p_t = jnp.exp(-ce)
        loss = (1.0 - p_t) ** gamma * ce
    else:
        loss = ce
    return (sample_w * loss).mean()


def asymmetric_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    gamma_neg: float = 4.0,
    gamma_pos: float = 1.0,
    clip: float = 0.05,
) -> jnp.ndarray:
    """Asymmetric multi-label loss; 1-D integer labels are one-hot converted."""
    if labels.ndim == 1:
        targets = jax.nn.one_hot(labels, logits.shape[-1], dtype=jnp.float32)
    else:
        targets = labels.astype(jnp.float32)
    probs = jax.nn.sigmoid(logits.astype(jnp.float32))
    probs_neg = 1.0 - probs
    if clip > 0:
        probs_neg = jnp.minimum(probs_neg + clip, 1.0)
    loss_pos = targets * jnp.log(jnp.maximum(probs, 1e-8))
    loss_neg = (1.0 - targets) * jnp.log(jnp.maximum(probs_neg, 1e-8))
    if gamma_pos > 0:
        loss_pos = loss_pos * (1.0 - probs) ** gamma_pos
    if gamma_neg > 0:
        loss_neg = loss_neg * probs**gamma_neg
    return -(loss_pos + loss_neg).mean()


# --- Builders (close over hyperparameters → LossFn for the registry) --------


def make_cross_entropy(weight=None) -> LossFn:
    return lambda logits, labels: cross_entropy_loss(logits, labels, weight=weight)


def make_focal(gamma: float = 2.0, alpha=None) -> LossFn:
    return lambda logits, labels: focal_loss(logits, labels, gamma=gamma, alpha=alpha)


def make_label_smoothing(epsilon: float = 0.1) -> LossFn:
    if not 0 <= epsilon < 1:
        raise ValueError(f"epsilon must be in [0, 1), got {epsilon}")
    return lambda logits, labels: label_smoothing_loss(logits, labels, epsilon=epsilon)


def make_class_balanced(
    samples_per_class, beta: float = 0.9999, loss_type: str = "cross_entropy",
    gamma: float = 2.0,
) -> LossFn:
    weights = class_balanced_weights(samples_per_class, beta)  # precompute on host

    def fn(logits, labels):
        w = jnp.asarray(weights)[labels]
        ce = _per_sample_ce(logits, labels)
        if loss_type == "focal":
            p_t = jnp.exp(-ce)
            loss = (1.0 - p_t) ** gamma * ce
        else:
            loss = ce
        return (w * loss).mean()

    return fn


def make_asymmetric(
    gamma_neg: float = 4.0, gamma_pos: float = 1.0, clip: float = 0.05
) -> LossFn:
    return lambda logits, labels: asymmetric_loss(
        logits, labels, gamma_neg=gamma_neg, gamma_pos=gamma_pos, clip=clip
    )
