"""Evaluation metrics (replaces torchmetrics — reference uses
torchmetrics Accuracy / macro-F1 / macro-AUROC, training/classification.py:54-59).

Accuracy and macro-F1 stream through a device-side confusion matrix (one
[C, C] scatter-add per batch inside the jitted eval step); AUROC is computed
on host from collected probabilities via the rank-based (Mann-Whitney)
formulation with tie handling, matching sklearn/torchmetrics semantics.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def confusion_matrix_update(
    cm: jnp.ndarray, preds: jnp.ndarray, labels: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """Scatter-add a batch into a [C, C] confusion matrix (rows = true)."""
    c = cm.shape[0]
    idx = labels * c + preds
    upd = jnp.zeros(c * c, cm.dtype).at[idx].add(mask)
    return cm + upd.reshape(c, c)


def accuracy_from_cm(cm: np.ndarray) -> float:
    total = cm.sum()
    return float(np.trace(cm) / total) if total > 0 else 0.0


def macro_f1_from_cm(cm: np.ndarray) -> float:
    """Macro F1: mean of per-class F1 over classes present in labels.

    torchmetrics macro-F1 averages over all classes, counting absent classes
    as 0 — we match that (zero_division=0 over all C classes).
    """
    tp = np.diag(cm).astype(np.float64)
    fp = cm.sum(axis=0) - tp
    fn = cm.sum(axis=1) - tp
    denom = 2 * tp + fp + fn
    f1 = np.where(denom > 0, 2 * tp / np.where(denom > 0, denom, 1), 0.0)
    return float(f1.mean())


def _binary_auroc(scores: np.ndarray, positives: np.ndarray) -> float:
    """Mann-Whitney AUC with average-rank tie handling."""
    n_pos = int(positives.sum())
    n_neg = len(positives) - n_pos
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    order = np.argsort(scores, kind="mergesort")
    ranks = np.empty(len(scores), dtype=np.float64)
    sorted_scores = scores[order]
    # average ranks for ties
    i = 0
    r = 1.0
    while i < len(scores):
        j = i
        while j + 1 < len(scores) and sorted_scores[j + 1] == sorted_scores[i]:
            j += 1
        avg = (r + r + (j - i)) / 2.0
        ranks[order[i : j + 1]] = avg
        r += j - i + 1
        i = j + 1
    rank_sum_pos = ranks[positives.astype(bool)].sum()
    u = rank_sum_pos - n_pos * (n_pos + 1) / 2.0
    return float(u / (n_pos * n_neg))


def macro_auroc(probs: np.ndarray, labels: np.ndarray, num_classes: int) -> float:
    """One-vs-rest macro AUROC; classes absent from labels are skipped."""
    aucs = []
    for c in range(num_classes):
        pos = (labels == c).astype(np.float64)
        auc = _binary_auroc(probs[:, c], pos)
        if np.isfinite(auc):
            aucs.append(auc)
    return float(np.mean(aucs)) if aucs else float("nan")
