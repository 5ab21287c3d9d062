"""SVD tail-truncation ablation.

Reference behavior: vision_spectra/metrics/tail_truncation.py:63-428 — zero
the smallest singular values of the attention weight matrices and measure the
accuracy drop, by retained-count ratio or retained-energy threshold, sweeping
retention levels [1.0 … 0.1].

The JAX version is cleaner than the reference's in-place surgery +
state_dict save/restore dance: params are immutable pytrees, so each
retention level is just a fresh truncated copy.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Callable

import numpy as np

__all__ = [
    "truncate_matrix_by_ratio",
    "truncate_matrix_by_energy",
    "truncate_attention_weights",
    "run_truncation_experiment",
    "analyze_truncation_results",
    "save_truncation_report",
]

DEFAULT_RETENTION_LEVELS = [1.0, 0.9, 0.8, 0.7, 0.6, 0.5, 0.4, 0.3, 0.2, 0.1]


def truncate_matrix_by_ratio(weight: np.ndarray, keep_ratio: float) -> np.ndarray:
    """Keep the top ``ceil(keep_ratio · k)`` singular values (reference :63-105)."""
    w = np.asarray(weight, dtype=np.float64)
    if w.ndim != 2 or keep_ratio >= 1.0:
        return np.asarray(weight)
    u, s, vt = np.linalg.svd(w, full_matrices=False)
    k = max(1, int(np.ceil(keep_ratio * len(s))))
    s_trunc = s.copy()
    s_trunc[k:] = 0.0
    return ((u * s_trunc) @ vt).astype(weight.dtype)


def truncate_matrix_by_energy(weight: np.ndarray, energy: float) -> np.ndarray:
    """Keep the smallest prefix of SVs whose σ² sum reaches ``energy`` of the
    total (reference :108-152)."""
    w = np.asarray(weight, dtype=np.float64)
    if w.ndim != 2 or energy >= 1.0:
        return np.asarray(weight)
    u, s, vt = np.linalg.svd(w, full_matrices=False)
    cum = np.cumsum(s**2) / max(np.sum(s**2), 1e-30)
    k = int(np.searchsorted(cum, energy) + 1)
    s_trunc = s.copy()
    s_trunc[k:] = 0.0
    return ((u * s_trunc) @ vt).astype(weight.dtype)


def truncate_attention_weights(
    params: Any,
    keep_ratio: float | None = None,
    energy: float | None = None,
) -> Any:
    """Return a params copy with truncated attention kernels (qkv + proj).

    Reference (in-place surgery): tail_truncation.py:155-187.
    """
    import jax

    if (keep_ratio is None) == (energy is None):
        raise ValueError("specify exactly one of keep_ratio / energy")

    def maybe_truncate(path, leaf):
        name = ".".join(str(getattr(p, "key", p)) for p in path)
        is_attn_kernel = name.endswith("kernel") and (
            ".attn." in name or name.endswith("qkv.kernel")
        )
        if not is_attn_kernel or getattr(leaf, "ndim", 0) != 2:
            return leaf
        arr = np.asarray(leaf)
        if keep_ratio is not None:
            return truncate_matrix_by_ratio(arr, keep_ratio)
        return truncate_matrix_by_energy(arr, energy)

    return jax.tree_util.tree_map_with_path(maybe_truncate, params)


def run_truncation_experiment(
    params: Any,
    evaluate_fn: Callable[[Any], float],
    retention_levels: list[float] | None = None,
    mode: str = "ratio",
) -> dict[str, Any]:
    """Sweep retention levels and record accuracy at each.

    ``evaluate_fn(params) -> accuracy``. Reference :242-323 (there the sweep
    must save/restore state_dicts; here each level is an independent pytree).
    """
    levels = retention_levels or DEFAULT_RETENTION_LEVELS
    results = []
    baseline = None
    for level in levels:
        if level >= 1.0:
            test_params = params
        elif mode == "ratio":
            test_params = truncate_attention_weights(params, keep_ratio=level)
        else:
            test_params = truncate_attention_weights(params, energy=level)
        acc = float(evaluate_fn(test_params))
        if baseline is None:
            baseline = acc
        results.append(
            {
                "retention": level,
                "accuracy": acc,
                "accuracy_drop": baseline - acc,
                "relative_drop": (baseline - acc) / max(baseline, 1e-12),
            }
        )
    return {"mode": mode, "baseline_accuracy": baseline, "levels": results}


def analyze_truncation_results(experiment: dict[str, Any]) -> dict[str, Any]:
    """Critical 5% / 1% drop thresholds + sensitivity + interpretation.

    Reference :326-394.
    """
    levels = experiment["levels"]

    def critical(threshold: float) -> float | None:
        for row in levels:
            if row["relative_drop"] > threshold:
                return row["retention"]
        return None

    crit5 = critical(0.05)
    crit1 = critical(0.01)
    drops = [row["relative_drop"] for row in levels]
    retentions = [row["retention"] for row in levels]
    # Sensitivity: slope of relative drop vs (1 - retention).
    if len(levels) >= 2:
        sensitivity = float(
            np.polyfit([1 - r for r in retentions], drops, 1)[0]
        )
    else:
        sensitivity = float("nan")

    if crit5 is None:
        interpretation = (
            "The model is highly robust to spectral tail truncation: even "
            "aggressive truncation causes <5% relative accuracy drop, "
            "suggesting the attention weights' information is concentrated "
            "in the leading singular directions."
        )
    elif crit5 <= 0.3:
        interpretation = (
            "The model tolerates substantial truncation before losing 5% "
            "accuracy; the spectral tail carries limited task-relevant "
            "information."
        )
    else:
        interpretation = (
            "Accuracy degrades quickly under truncation: the spectral tail "
            "of the attention weights carries task-relevant information, "
            "indicating limited implicit compression."
        )

    return {
        "critical_retention_5pct": crit5,
        "critical_retention_1pct": crit1,
        "sensitivity": sensitivity,
        "interpretation": interpretation,
    }


def save_truncation_report(
    experiment: dict[str, Any],
    analysis: dict[str, Any],
    path: Path | str,
) -> Path:
    """JSON report (reference :397-428)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        json.dump({"experiment": experiment, "analysis": analysis}, f, indent=2)
    return path
