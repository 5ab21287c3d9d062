"""Gradient alignment with the rank-reducing direction.

Reference behavior: vision_spectra/metrics/gradient_alignment.py:48-238. The
hypothesis instrument: the gradient of the nuclear norm ``||W||_*`` is
``U Vᵀ`` (from the SVD of W); the cosine similarity between the actual
training gradient and this direction measures whether optimization is
actively compressing the spectrum.

Pure functions over (params, grads) pytrees — call between ``value_and_grad``
and the optimizer update. Not wired into any trainer by default (as in the
reference); used by analysis code.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import numpy as np

__all__ = [
    "rank_reducing_direction",
    "compute_gradient_alignment",
    "compute_model_alignment",
    "aggregate_alignment",
    "GradientAlignmentTracker",
]


def rank_reducing_direction(weight: np.ndarray) -> np.ndarray | None:
    """``U Vᵀ`` — the nuclear-norm gradient (reference :48-69)."""
    w = np.asarray(weight, dtype=np.float64)
    if w.ndim != 2:
        return None
    try:
        u, _s, vt = np.linalg.svd(w, full_matrices=False)
    except np.linalg.LinAlgError:
        return None
    return u @ vt


def compute_gradient_alignment(
    weight: np.ndarray, grad: np.ndarray
) -> dict[str, float] | None:
    """Cosine / angle / norms between grad and the rank-reducing direction.

    Reference :72-115. Positive cosine means the gradient step *reduces* the
    nuclear norm (gradient descent moves along −grad).
    """
    direction = rank_reducing_direction(weight)
    if direction is None:
        return None
    g = np.asarray(grad, dtype=np.float64)
    if g.shape != direction.shape:
        return None
    g_flat = g.ravel()
    d_flat = direction.ravel()
    g_norm = np.linalg.norm(g_flat)
    d_norm = np.linalg.norm(d_flat)
    if g_norm == 0 or d_norm == 0:
        return None
    cos = float(np.dot(g_flat, d_flat) / (g_norm * d_norm))
    cos = float(np.clip(cos, -1.0, 1.0))
    return {
        "cosine_similarity": cos,
        "angle_degrees": float(np.degrees(np.arccos(cos))),
        "grad_norm": float(g_norm),
        "direction_norm": float(d_norm),
    }


def _flatten_2d(tree: Any) -> dict[str, np.ndarray]:
    import jax

    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if arr.ndim == 2:
            name = ".".join(str(getattr(p, "key", p)) for p in path)
            out[name] = arr
    return out


def compute_model_alignment(
    params: Any, grads: Any
) -> dict[str, dict[str, float]]:
    """Alignment for every 2-D parameter with a matching gradient.

    Reference :118-154 (sweep of all 2-D params with grads).
    """
    p2d = _flatten_2d(params)
    g2d = _flatten_2d(grads)
    out = {}
    for name, w in p2d.items():
        g = g2d.get(name)
        if g is None:
            continue
        result = compute_gradient_alignment(w, g)
        if result is not None:
            out[name] = result
    return out


def aggregate_alignment(
    alignments: dict[str, dict[str, float]],
) -> dict[str, float]:
    """Fraction aligned (cos > 0) + mean/std cosine (reference :157-190)."""
    if not alignments:
        return {
            "fraction_aligned": float("nan"),
            "mean_cosine": float("nan"),
            "std_cosine": float("nan"),
            "num_layers": 0.0,
        }
    cosines = np.array([a["cosine_similarity"] for a in alignments.values()])
    return {
        "fraction_aligned": float(np.mean(cosines > 0)),
        "mean_cosine": float(np.mean(cosines)),
        "std_cosine": float(np.std(cosines)),
        "num_layers": float(len(cosines)),
    }


@dataclass
class GradientAlignmentTracker:
    """Per-step alignment history (reference :193-238)."""

    history: list[dict[str, Any]] = field(default_factory=list)

    def record_step(self, params: Any, grads: Any, step: int) -> dict[str, float]:
        alignments = compute_model_alignment(params, grads)
        agg = aggregate_alignment(alignments)
        self.history.append({"step": step, "aggregated": agg, "per_layer": alignments})
        return agg

    def get_history(self, key: str = "mean_cosine") -> tuple[list[int], list[float]]:
        steps, values = [], []
        for h in self.history:
            v = h["aggregated"].get(key)
            if v is not None and np.isfinite(v):
                steps.append(h["step"])
                values.append(v)
        return steps, values
