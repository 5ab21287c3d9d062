"""Reconstruction losses for MIM as pure JAX functions.

Reference behavior: vision_spectra/losses/reconstruction.py:15-495. All share
the signature ``(pred, target, mask=None) -> scalar``; when a mask is given
the per-element loss is first averaged over trailing dims down to the mask's
rank, then masked-mean reduced: ``(loss·mask).sum() / max(mask.sum(), 1)``.

Losses: MSE, L1, Smooth-L1 (β), Cauchy ``log1p((d/γ)²)``, SGT (skewed
generalized-t NLL with precomputed log-beta normalization constants), Huber
(δ), Tukey biweight (flat tail beyond c=4.685).
"""

from __future__ import annotations

import math
from typing import Callable

import jax.numpy as jnp

ReconLossFn = Callable[..., jnp.ndarray]


def _reduce(loss: jnp.ndarray, mask: jnp.ndarray | None, reduction: str) -> jnp.ndarray:
    if mask is not None:
        while loss.ndim > mask.ndim:
            loss = loss.mean(axis=-1)
        return (loss * mask).sum() / jnp.maximum(mask.sum(), 1.0)
    if reduction == "mean":
        return loss.mean()
    if reduction == "sum":
        return loss.sum()
    return loss


def mse_loss(pred, target, mask=None, reduction: str = "mean"):
    return _reduce((pred - target) ** 2, mask, reduction)


def l1_loss(pred, target, mask=None, reduction: str = "mean"):
    return _reduce(jnp.abs(pred - target), mask, reduction)


def smooth_l1_loss(pred, target, mask=None, beta: float = 1.0, reduction: str = "mean"):
    """Quadratic below β, linear above (torch F.smooth_l1_loss semantics)."""
    d = jnp.abs(pred - target)
    loss = jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)
    return _reduce(loss, mask, reduction)


def cauchy_loss(pred, target, mask=None, gamma: float = 1.0, reduction: str = "mean"):
    """Lorentzian NLL: ``log1p((d/γ)²)`` — heavy-tailed, outlier-robust."""
    if gamma <= 0:
        raise ValueError(f"gamma must be positive, got {gamma}")
    d = (pred - target) / gamma
    return _reduce(jnp.log1p(d * d), mask, reduction)


def huber_loss(pred, target, mask=None, delta: float = 1.0, reduction: str = "mean"):
    """Quadratic below δ: ``d²/2``; linear above: ``δ(|d| − δ/2)``."""
    if delta <= 0:
        raise ValueError(f"delta must be positive, got {delta}")
    d = pred - target
    ad = jnp.abs(d)
    loss = jnp.where(ad <= delta, 0.5 * d * d, delta * (ad - 0.5 * delta))
    return _reduce(loss, mask, reduction)


def tukey_loss(pred, target, mask=None, c: float = 4.685, reduction: str = "mean"):
    """Tukey biweight: zero gradient (flat loss c²/6) beyond |d| > c."""
    if c <= 0:
        raise ValueError(f"c must be positive, got {c}")
    d = pred - target
    u = d / c
    max_loss = c * c / 6.0
    inner = 1.0 - u * u
    loss = jnp.where(jnp.abs(d) <= c, max_loss * (1.0 - inner**3), max_loss)
    return _reduce(loss, mask, reduction)


def _log_beta(a: float, b: float) -> float:
    return math.lgamma(a) + math.lgamma(b) - math.lgamma(a + b)


class SGTParams:
    """Precomputed SGT normalization constants (host-side, data-independent).

    Reference: reconstruction.py:268-284. Special cases: p=2, q→∞, λ=0 →
    Normal; p=2, λ=0 → Student-t; p=1, q→∞, λ=0 → Laplace.
    """

    def __init__(
        self, p: float = 2.0, q: float = 2.0, lam: float = 0.0, sigma: float = 1.0
    ) -> None:
        if p <= 0:
            raise ValueError(f"p must be positive, got {p}")
        if q <= 0:
            raise ValueError(f"q must be positive, got {q}")
        if not (-1 < lam < 1):
            raise ValueError(f"lam must be in (-1, 1), got {lam}")
        if sigma <= 0:
            raise ValueError(f"sigma must be positive, got {sigma}")
        self.p, self.q, self.lam, self.sigma = p, q, lam, sigma

        b1 = math.exp(_log_beta(1.0 / p, q))
        b2 = math.exp(_log_beta(2.0 / p, q - 1.0 / p)) if q > 1.0 / p else 1.0
        b3 = math.exp(_log_beta(3.0 / p, q - 2.0 / p)) if q > 2.0 / p else 1.0

        v_denom_sq = (1 + 3 * lam**2) * (b3 / b1) - 4 * lam**2 * (b2 / b1) ** 2
        self.v = (q ** (-1.0 / p)) / math.sqrt(max(v_denom_sq, 1e-10))
        self.m = 2 * lam * self.v * sigma * (q ** (1.0 / p)) * b2 / b1


def sgt_loss(
    pred,
    target,
    mask=None,
    p: float = 2.0,
    q: float = 2.0,
    lam: float = 0.0,
    sigma: float = 1.0,
    reduction: str = "mean",
    _params: SGTParams | None = None,
):
    """Skewed generalized-t negative log-likelihood."""
    sp = _params if _params is not None else SGTParams(p, q, lam, sigma)
    diff = target - pred + sp.m
    z = jnp.abs(diff) / (sp.sigma * sp.v + 1e-10)
    skew = (1.0 + sp.lam * jnp.sign(diff)) ** sp.p
    ratio = z**sp.p / (sp.q * skew + 1e-10)
    loss = (sp.q + 1.0 / sp.p) * jnp.log1p(ratio)
    return _reduce(loss, mask, reduction)


# --- Builders ---------------------------------------------------------------


def make_mse() -> ReconLossFn:
    return mse_loss


def make_l1() -> ReconLossFn:
    return l1_loss


def make_smooth_l1(beta: float = 1.0) -> ReconLossFn:
    return lambda pred, target, mask=None: smooth_l1_loss(pred, target, mask, beta=beta)


def make_cauchy(gamma: float = 1.0) -> ReconLossFn:
    if gamma <= 0:
        raise ValueError(f"gamma must be positive, got {gamma}")
    return lambda pred, target, mask=None: cauchy_loss(pred, target, mask, gamma=gamma)


def make_huber(delta: float = 1.0) -> ReconLossFn:
    if delta <= 0:
        raise ValueError(f"delta must be positive, got {delta}")
    return lambda pred, target, mask=None: huber_loss(pred, target, mask, delta=delta)


def make_tukey(c: float = 4.685) -> ReconLossFn:
    if c <= 0:
        raise ValueError(f"c must be positive, got {c}")
    return lambda pred, target, mask=None: tukey_loss(pred, target, mask, c=c)


def make_sgt(
    p: float = 2.0, q: float = 2.0, lam: float = 0.0, sigma: float = 1.0
) -> ReconLossFn:
    params = SGTParams(p, q, lam, sigma)  # validates + precomputes on host
    return lambda pred, target, mask=None: sgt_loss(
        pred, target, mask, _params=params
    )
