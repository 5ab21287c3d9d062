"""Spectral metrics for weight-matrix analysis — the science core.

Reimplements the reference metric suite (reference:
vision_spectra/metrics/spectral.py:49-460) with two execution paths:

1. **Host reference path** (float64 numpy + LAPACK SVD): bit-comparable to the
   reference semantics, used for tests, publication figures, and as a
   cross-check for the device path.

2. **Device path** (batched ``jnp.linalg.svd`` under jit): matrices of the
   same shape are stacked into ``[G, m, n]`` and their spectra + all four
   metrics are computed in one compiled program on-chip. This is what makes
   per-epoch spectral logging essentially free on TPU — the SVDs ride the
   accelerator and only ``G * 4`` scalars come back to host.

Metrics (all computed from the singular values ``σ₁ ≥ … ≥ σₘ``):

- **spectral entropy**: Shannon entropy of ``p_i = σ_i² / Σσ²`` (nats).
- **stable rank**: ``Σσ² / σ₁²`` — continuous effective dimensionality.
- **alpha exponent**: ``−slope`` of the OLS fit of ``log σ_i`` vs ``log i``
  over the bulk window ``[10%, 60%]`` of the sorted spectrum (min 8 SVs).
- **Hill alpha**: ``1 + 1/mean(log(λ_i/λ_k))`` over the top
  ``k = max(5, 10% · n)`` eigenvalues ``λ = σ²`` (Pareto-tail MLE).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "spectral_entropy",
    "stable_rank",
    "alpha_exponent",
    "power_law_alpha_hill",
    "get_spectral_metrics",
    "aggregate_spectral_metrics",
    "METRIC_KEYS",
    "metrics_from_singular_values",
    "metrics_from_singular_values_dynamic",
    "batched_spectral_metrics",
    "batched_spectral_metrics_padded",
    "batched_singular_values",
    "bucket_dim",
]

METRIC_KEYS = ("spectral_entropy", "stable_rank", "alpha_exponent", "pl_alpha_hill")


# =============================================================================
# Host reference path (float64, LAPACK)
# =============================================================================


def _host_singular_values(weight: np.ndarray) -> np.ndarray | None:
    """Full SVD spectrum in float64, or None on failure / non-2D input."""
    if getattr(weight, "ndim", 0) != 2:
        return None
    from scipy.linalg import svd as _svd

    try:
        return _svd(np.asarray(weight, dtype=np.float64), compute_uv=False)
    except Exception:
        return None


def spectral_entropy(weight_matrix: np.ndarray) -> float:
    """Shannon entropy (nats) of the normalized squared singular values.

    Max ``log(n)`` for a uniform spectrum (identity), 0 for rank-1.
    Reference: metrics/spectral.py:49-109.
    """
    s = _host_singular_values(weight_matrix)
    if s is None:
        return float("nan")
    s = s[np.isfinite(s) & (s > 0)]
    if s.size == 0:
        return float("nan")
    p = (s * s).astype(np.float64)
    total = p.sum()
    if total <= 0 or not np.isfinite(total):
        return float("nan")
    p /= total
    return float(-np.sum(p * np.log(p)))


def stable_rank(weight_matrix: np.ndarray) -> float:
    """``||W||_F² / ||W||_2²`` — in [1, rank(W)].

    Reference: metrics/spectral.py:112-173.
    """
    s = _host_singular_values(weight_matrix)
    if s is None:
        return float("nan")
    s = s[np.isfinite(s) & (s >= 0)]
    if s.size == 0:
        return float("nan")
    top = s.max()
    if top <= 0 or not np.isfinite(top):
        return float("nan")
    return float(np.sum(s * s) / (top * top))


def _bulk_window(m: int, fit_range: tuple[int, int] | None) -> tuple[int, int] | None:
    """The [10%, 60%] bulk fitting window used by the alpha fit.

    Returns (start, end) indices into the descending spectrum, or None when
    the spectrum is too short for a reliable fit. Reference:
    metrics/spectral.py:251-262.
    """
    if fit_range is not None:
        start, end = fit_range
        if end > m or end - start < 2:
            return None
        return start, end
    if m < 8:
        return None
    start = max(1, int(0.10 * m))
    end = min(max(start + 6, int(0.60 * m)), m)
    if end - start < 2:
        return None
    return start, end


def alpha_exponent(
    weight_matrix: np.ndarray,
    fit_range: tuple[int, int] | None = None,
) -> float:
    """Power-law decay rate α from the log-log rank fit ``σ_i ∝ i^(−α)``.

    Fits OLS over the bulk window (default [10%, 60%] of the sorted spectrum,
    ≥ 8 SVs required). Reference: metrics/spectral.py:176-273.
    """
    s = _host_singular_values(weight_matrix)
    if s is None:
        return float("nan")
    s = s[np.isfinite(s) & (s > 0)]
    s = np.sort(s)[::-1]
    window = _bulk_window(s.size, fit_range)
    if window is None:
        return float("nan")
    start, end = window
    log_i = np.log(np.arange(start + 1, end + 1, dtype=np.float64))
    log_s = np.log(s[start:end])
    try:
        slope = np.polyfit(log_i, log_s, 1)[0]
    except Exception:
        return float("nan")
    return float(-slope)


def power_law_alpha_hill(weight_matrix: np.ndarray, k: int | None = None) -> float:
    """Hill MLE of the Pareto tail index on eigenvalues ``λ = σ²``.

    ``α = 1 + 1/H`` with ``H = mean(log(λ_i / λ_k))`` over the top
    ``k = max(5, 10%·n)`` eigenvalues (n ≥ 8 required).
    Reference: metrics/spectral.py:276-368.
    """
    s = _host_singular_values(weight_matrix)
    if s is None:
        return float("nan")
    lam = (s.astype(np.float64)) ** 2
    lam = lam[np.isfinite(lam) & (lam > 0)]
    n = lam.size
    if n < 8:
        return float("nan")
    if k is None:
        k = min(max(5, int(0.10 * n)), max(5, n - 1))
    tail = np.sort(lam)[::-1][:k]
    xmin = tail[-1]
    if xmin <= 0 or np.any(tail <= 0):
        return float("nan")
    h = float(np.mean(np.log(tail / xmin)))
    if h <= 0 or not np.isfinite(h):
        return float("nan")
    return 1.0 + 1.0 / h


def get_spectral_metrics(weight_matrix: Any) -> dict[str, float]:
    """All four spectral metrics for one matrix (host float64 path).

    Accepts numpy arrays, JAX arrays, or anything array-like.
    Reference: metrics/spectral.py:371-414.
    """
    w = np.asarray(weight_matrix, dtype=np.float64)
    return {
        "spectral_entropy": spectral_entropy(w),
        "stable_rank": stable_rank(w),
        "alpha_exponent": alpha_exponent(w),
        "pl_alpha_hill": power_law_alpha_hill(w),
    }


def aggregate_spectral_metrics(
    metrics_list: list[dict[str, float]],
) -> dict[str, float]:
    """NaN-aware mean/std per metric key across layers.

    Reference: metrics/spectral.py:417-460.
    """
    if not metrics_list:
        return {}
    out: dict[str, float] = {}
    for key in metrics_list[0]:
        vals = [m[key] for m in metrics_list if np.isfinite(m.get(key, np.nan))]
        if vals:
            out[f"{key}_mean"] = float(np.mean(vals))
            out[f"{key}_std"] = float(np.std(vals))
        else:
            out[f"{key}_mean"] = float("nan")
            out[f"{key}_std"] = float("nan")
    return out


# =============================================================================
# Device path (batched, jitted)
# =============================================================================


def metrics_from_singular_values(s, m: int | None = None):
    """All four metrics from a descending SV vector — pure jnp, vmap-able.

    ``s`` is one spectrum of static length ``m`` (pass m explicitly when
    tracing). Invalid entries (≤ 0 or non-finite) are masked out; window
    boundaries for the alpha/Hill fits are computed from the static length,
    matching the host path whenever the matrix is full-rank (the typical case
    for trained weights).

    Returns a dict of 4 scalars (float32 on TPU).
    """
    if m is None:
        m = s.shape[-1]
    valid = jnp.isfinite(s) & (s > 0)
    s = jnp.where(valid, s, 0.0)
    s2 = s * s
    total = jnp.sum(s2)

    # Entropy
    p = s2 / jnp.where(total > 0, total, 1.0)
    ent = -jnp.sum(jnp.where(p > 0, p * jnp.log(jnp.where(p > 0, p, 1.0)), 0.0))
    ent = jnp.where(total > 0, ent, jnp.nan)

    # Stable rank
    top = jnp.max(s)
    srank = jnp.where(top > 0, total / (top * top), jnp.nan)

    # Alpha exponent: OLS over static bulk window, masking invalid SVs.
    window = _bulk_window(m, None)
    if window is None:
        alpha = jnp.float32(jnp.nan)
    else:
        start, end = window
        sw = s[start:end]
        wmask = (sw > 0).astype(sw.dtype)
        log_i = jnp.log(jnp.arange(start + 1, end + 1, dtype=sw.dtype))
        log_s = jnp.log(jnp.where(sw > 0, sw, 1.0))
        n_w = jnp.sum(wmask)
        mean_x = jnp.sum(log_i * wmask) / n_w
        mean_y = jnp.sum(log_s * wmask) / n_w
        cov = jnp.sum(wmask * (log_i - mean_x) * (log_s - mean_y))
        var = jnp.sum(wmask * (log_i - mean_x) ** 2)
        alpha = jnp.where((n_w >= 2) & (var > 0), -cov / var, jnp.nan)

    # Hill estimator on eigenvalues λ = σ² (k from static length).
    if m < 8:
        hill = jnp.float32(jnp.nan)
    else:
        k = min(max(5, int(0.10 * m)), max(5, m - 1))
        tail = s2[:k]
        xmin = tail[k - 1]
        ok = xmin > 0
        h = jnp.mean(jnp.log(jnp.where(ok, tail / jnp.where(ok, xmin, 1.0), 1.0)))
        hill = jnp.where(ok & (h > 0), 1.0 + 1.0 / h, jnp.nan)

    return {
        "spectral_entropy": ent,
        "stable_rank": srank,
        "alpha_exponent": alpha,
        "pl_alpha_hill": hill,
    }


@functools.partial(jax.jit, static_argnames=("compute_metrics",))
def _batched_spectra(stack, compute_metrics: bool = True):
    """SVD a stack of same-shape matrices and optionally compute metrics.

    ``stack``: [G, m, n] float32. Returns one packed [G, k+4] array:
    columns [0:k] are the descending singular values, columns [k:k+4] the four
    metrics in METRIC_KEYS order. Packing everything into a single output
    keeps the device→host cost at ONE transfer per call (remote-TPU links pay
    a full round trip per fetched array, and 0-d fetches are pathologically
    slow — see utils/transfer.py).
    """
    stack = stack.astype(jnp.float32)
    s = jnp.linalg.svd(stack, compute_uv=False)  # [G, min(m, n)], descending
    if not compute_metrics:
        return s
    m = s.shape[-1]
    metrics = jax.vmap(lambda row: metrics_from_singular_values(row, m))(s)
    packed = jnp.concatenate(
        [s] + [metrics[k][:, None] for k in METRIC_KEYS], axis=1
    )
    return packed


def batched_singular_values(stack) -> np.ndarray:
    """Device-batched SVD spectra for a [G, m, n] stack; returns numpy [G, k]."""
    return np.asarray(_batched_spectra(jnp.asarray(stack), compute_metrics=False))


def metrics_from_singular_values_dynamic(s, n_true):
    """All four metrics from a zero-padded descending SV vector — pure jnp.

    ``s`` has static padded length; ``n_true`` (traced int32 scalar) is the
    true spectrum length (``min(m, n)`` of the unpadded matrix). Window
    boundaries for the alpha/Hill fits are computed from ``n_true`` with
    index masks, reproducing the host-path semantics exactly — this is what
    lets matrices of DIFFERENT true shapes share one compiled program (the
    SVD compiles once per *padded* shape, not once per model size).
    """
    size = s.shape[-1]
    idx = jnp.arange(size)
    in_range = idx < n_true
    valid = in_range & jnp.isfinite(s) & (s > 0)
    s = jnp.where(valid, s, 0.0)
    s2 = s * s
    total = jnp.sum(s2)

    # Entropy (zero entries contribute nothing).
    p = s2 / jnp.where(total > 0, total, 1.0)
    ent = -jnp.sum(jnp.where(p > 0, p * jnp.log(jnp.where(p > 0, p, 1.0)), 0.0))
    ent = jnp.where(total > 0, ent, jnp.nan)

    # Stable rank.
    top = jnp.max(s)
    srank = jnp.where(top > 0, total / (top * top), jnp.nan)

    # Alpha exponent: OLS over the dynamic [10%, 60%] bulk window
    # (host semantics: start = max(1, int(0.10 m)),
    #  end = min(max(start + 6, int(0.60 m)), m), need m >= 8, end-start >= 2).
    start = jnp.maximum(1, jnp.floor(0.10 * n_true).astype(jnp.int32))
    end = jnp.minimum(
        jnp.maximum(start + 6, jnp.floor(0.60 * n_true).astype(jnp.int32)),
        n_true,
    )
    ok_window = (n_true >= 8) & (end - start >= 2)
    wmask = ((idx >= start) & (idx < end) & (s > 0)).astype(s.dtype)
    log_i = jnp.log(jnp.maximum(idx + 1, 1).astype(s.dtype))
    log_s = jnp.log(jnp.where(s > 0, s, 1.0))
    n_w = jnp.sum(wmask)
    n_w_safe = jnp.where(n_w > 0, n_w, 1.0)
    mean_x = jnp.sum(log_i * wmask) / n_w_safe
    mean_y = jnp.sum(log_s * wmask) / n_w_safe
    cov = jnp.sum(wmask * (log_i - mean_x) * (log_s - mean_y))
    var = jnp.sum(wmask * (log_i - mean_x) ** 2)
    alpha = jnp.where(
        ok_window & (n_w >= 2) & (var > 0),
        -cov / jnp.where(var > 0, var, 1.0),
        jnp.nan,
    )

    # Hill estimator: k = min(max(5, int(0.10 n)), n-1) over eigenvalues.
    k = jnp.minimum(
        jnp.maximum(5, jnp.floor(0.10 * n_true).astype(jnp.int32)),
        jnp.maximum(n_true - 1, 1),
    )
    xmin = jnp.take(s2, jnp.clip(k - 1, 0, size - 1))
    xmin_safe = jnp.where(xmin > 0, xmin, 1.0)
    tail_mask = (idx < k) & (s2 > 0)
    h = jnp.sum(jnp.where(tail_mask, jnp.log(s2 / xmin_safe), 0.0)) / jnp.maximum(
        k, 1
    )
    hill = jnp.where(
        (n_true >= 8) & (xmin > 0) & (h > 0), 1.0 + 1.0 / h, jnp.nan
    )

    return {
        "spectral_entropy": ent,
        "stable_rank": srank,
        "alpha_exponent": alpha,
        "pl_alpha_hill": hill,
    }


# Canonical dimension ladder: padding every matrix up to a ladder shape means
# a handful of SVD compilations cover every model size in a sweep (the cold
# per-model SVD compile was ~20 s on TPU — VERDICT r1 item 7).
_DIM_LADDER = (8, 16, 32, 48, 64, 96, 128, 192, 256, 384, 512, 768, 1024,
               1536, 2048, 3072, 4096)


def bucket_dim(x: int) -> int:
    """Smallest ladder value ≥ x (multiples of 1024 beyond the ladder)."""
    for b in _DIM_LADDER:
        if x <= b:
            return b
    return ((x + 1023) // 1024) * 1024


def _pow2_ceil(x: int) -> int:
    p = 1
    while p < x:
        p *= 2
    return p


@jax.jit
def _batched_spectra_dynamic(stack, n_true):
    """SVD a zero-padded [G, M, N] stack; per-row dynamic-length metrics.

    Returns packed [G, min(M,N)+4] (SVs then METRIC_KEYS). Compiled once per
    PADDED shape — shared by every model whose matrices bucket to (M, N).
    """
    s = jnp.linalg.svd(stack.astype(jnp.float32), compute_uv=False)
    metrics = jax.vmap(metrics_from_singular_values_dynamic)(s, n_true)
    return jnp.concatenate(
        [s] + [metrics[k][:, None] for k in METRIC_KEYS], axis=1
    )


@functools.partial(jax.jit, static_argnames=("target", "batch"))
def _pad_stack(mats: tuple, target: tuple, batch: int):
    """Orient (min-dim first), zero-pad to ``target``, stack, pad batch.

    Compiles per (input-shapes, target) combination — a trivial pad/stack
    program, unlike the SVD which only ever compiles per padded shape.
    """
    tm, tn = target
    padded = []
    for m in mats:
        x = m.astype(jnp.float32)
        if x.shape[0] > x.shape[1]:
            x = x.T
        x = jnp.pad(x, ((0, tm - x.shape[0]), (0, tn - x.shape[1])))
        padded.append(x)
    stack = jnp.stack(padded)
    if batch > len(mats):
        stack = jnp.pad(stack, ((0, batch - len(mats)), (0, 0), (0, 0)))
    return stack


# Padded-target high-water marks seen this process. A later snapshot whose
# matrices fit inside an earlier (batch, tm, tn) triple reuses that triple —
# and therefore the already-compiled SVD program — instead of compiling a
# fresh one per model size, as long as the padding overhead stays bounded
# (see _COVER_VOLUME_RATIO below; far-smaller models compile their own
# program once — the persistent compile cache amortizes it across runs).
_SEEN_TARGETS: list[tuple[int, int, int]] = []


# Reuse a covering high-water triple only while its padded volume is within
# this factor of the requested one: beyond it the per-snapshot SVD runtime on
# the inflated program costs more than the one-off ~20 s compile it saves
# (e.g. a small-model sweep after one large-model snapshot).
_COVER_VOLUME_RATIO = 8


def _covering_target(batch: int, tm: int, tn: int) -> tuple[int, int, int]:
    vol = batch * tm * tn
    covering = [
        t
        for t in _SEEN_TARGETS
        if t[0] >= batch
        and t[1] >= tm
        and t[2] >= tn
        and t[0] * t[1] * t[2] <= _COVER_VOLUME_RATIO * vol
    ]
    if covering:
        return min(covering, key=lambda t: t[0] * t[1] * t[2])
    _SEEN_TARGETS.append((batch, tm, tn))
    return (batch, tm, tn)


def batched_spectral_metrics_padded(
    weights_and_shapes: list,
) -> tuple[list[np.ndarray], list[dict[str, float]]]:
    """Spectra + metrics for matrices of MIXED shapes in ONE device program.

    Args:
        weights_and_shapes: list of 2-D arrays (numpy or device-resident).

    Every matrix is orientation-normalized, zero-padded to one canonical
    ladder shape, and the whole set is SVD'd in a single batched dispatch.
    Returns per-matrix (true-length SVs, metric dict), in input order.
    """
    mats = list(weights_and_shapes)
    if not mats:
        return [], []
    dims = [(min(m.shape), max(m.shape)) for m in mats]
    tm = bucket_dim(max(d[0] for d in dims))
    tn = max(bucket_dim(max(d[1] for d in dims)), tm)
    batch, tm, tn = _covering_target(_pow2_ceil(len(mats)), tm, tn)
    stack = _pad_stack(tuple(jnp.asarray(m) for m in mats), (tm, tn), batch)
    n_true = jnp.asarray(
        [d[0] for d in dims] + [0] * (batch - len(mats)), jnp.int32
    )
    packed = np.asarray(_batched_spectra_dynamic(stack, n_true))  # one fetch
    k = packed.shape[1] - len(METRIC_KEYS)
    svs = [packed[g, : dims[g][0]] for g in range(len(mats))]
    per_matrix = [
        {key: float(packed[g, k + j]) for j, key in enumerate(METRIC_KEYS)}
        for g in range(len(mats))
    ]
    return svs, per_matrix


def batched_spectral_metrics(stack) -> tuple[np.ndarray, list[dict[str, float]]]:
    """Device-batched spectra + metrics for a stack of same-shape matrices.

    Args:
        stack: array-like [G, m, n] (numpy or device-resident; any float dtype).

    Returns:
        (singular_values [G, min(m,n)] numpy,
         list of G per-matrix metric dicts with float values)
    """
    packed = np.asarray(_batched_spectra(jnp.asarray(stack), compute_metrics=True))
    k = packed.shape[1] - len(METRIC_KEYS)
    s = packed[:, :k]
    per_matrix = [
        {key: float(packed[g, k + j]) for j, key in enumerate(METRIC_KEYS)}
        for g in range(packed.shape[0])
    ]
    return s, per_matrix
