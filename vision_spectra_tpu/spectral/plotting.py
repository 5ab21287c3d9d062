"""Publication-style spectral plots.

Reference behavior: vision_spectra/metrics/plotting.py:39-469 — CCDF log-log
with power-law overlay (fit window [10%, 70%]), log-log rank plots with the
[10%, 60%] bulk fit, metric-evolution lines, layer × epoch heatmaps, scenario
bar comparisons, multi-distribution overlays, and a full report renderer.
"""

from __future__ import annotations

from pathlib import Path

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt
import numpy as np

__all__ = [
    "plot_ccdf_loglog",
    "plot_rank_loglog",
    "plot_metric_evolution",
    "plot_layer_epoch_heatmap",
    "plot_scenario_comparison",
    "plot_distribution_overlay",
    "generate_spectral_report",
]


def _clean(svs) -> np.ndarray:
    s = np.asarray(svs, dtype=np.float64)
    s = s[np.isfinite(s) & (s > 0)]
    return np.sort(s)[::-1]


def _save(fig, path: Path | str) -> Path:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    fig.tight_layout()
    fig.savefig(path, dpi=150, bbox_inches="tight")
    plt.close(fig)
    return path


def plot_ccdf_loglog(
    singular_values, path: Path | str, title: str = "", fit: bool = True
) -> Path | None:
    """Empirical CCDF of eigenvalues on log-log axes with power-law overlay.

    Fit window: [10%, 70%] of the sorted spectrum (reference :39-100).
    """
    s = _clean(singular_values)
    if s.size < 4:
        return None
    lam = s**2
    n = lam.size
    ccdf = np.arange(1, n + 1) / n  # P(X >= lam_i) for descending lam
    fig, ax = plt.subplots(figsize=(7, 5))
    ax.loglog(lam, ccdf, "b.", markersize=5, label="empirical CCDF")
    if fit and n >= 8:
        lo, hi = int(0.10 * n), max(int(0.10 * n) + 2, int(0.70 * n))
        hi = min(hi, n)
        x = np.log(lam[lo:hi])
        y = np.log(ccdf[lo:hi])
        slope, intercept = np.polyfit(x, y, 1)
        ax.loglog(
            lam[lo:hi],
            np.exp(intercept) * lam[lo:hi] ** slope,
            "r-",
            label=f"power-law fit (alpha={-slope:.2f})",
        )
    ax.set_xlabel("eigenvalue lambda")
    ax.set_ylabel("P(X >= lambda)")
    ax.legend()
    if title:
        ax.set_title(title)
    return _save(fig, path)


def plot_rank_loglog(
    singular_values, path: Path | str, title: str = ""
) -> Path | None:
    """log σ vs log rank with the bulk [10%, 60%] OLS fit (reference :103-159)."""
    s = _clean(singular_values)
    if s.size < 4:
        return None
    n = s.size
    ranks = np.arange(1, n + 1)
    fig, ax = plt.subplots(figsize=(7, 5))
    ax.loglog(ranks, s, "b.", markersize=5, label="singular values")
    if n >= 8:
        lo = max(1, int(0.10 * n))
        hi = min(max(lo + 6, int(0.60 * n)), n)
        slope, intercept = np.polyfit(np.log(ranks[lo:hi]), np.log(s[lo:hi]), 1)
        ax.loglog(
            ranks[lo:hi],
            np.exp(intercept) * ranks[lo:hi] ** slope,
            "r-",
            label=f"bulk fit (alpha={-slope:.2f})",
        )
    ax.set_xlabel("rank index")
    ax.set_ylabel("sigma")
    ax.legend()
    if title:
        ax.set_title(title)
    return _save(fig, path)


def plot_metric_evolution(
    histories: dict[str, tuple[list[int], list[float]]],
    path: Path | str,
    title: str = "",
) -> Path:
    """Metric-evolution line plots (reference :162-205)."""
    fig, ax = plt.subplots(figsize=(8, 5))
    for name, (epochs, values) in histories.items():
        ax.plot(epochs, values, "o-", label=name)
    ax.set_xlabel("epoch")
    ax.legend()
    ax.grid(alpha=0.3)
    if title:
        ax.set_title(title)
    return _save(fig, path)


def plot_layer_epoch_heatmap(
    layer_names: list[str],
    epochs: list[int],
    values: np.ndarray,
    path: Path | str,
    metric_name: str = "",
) -> Path:
    """Layer × epoch heatmap of a metric (reference :208-260)."""
    fig, ax = plt.subplots(figsize=(9, max(4, 0.4 * len(layer_names))))
    im = ax.imshow(np.asarray(values), aspect="auto", cmap="viridis")
    ax.set_xticks(range(len(epochs)))
    ax.set_xticklabels(epochs)
    ax.set_yticks(range(len(layer_names)))
    ax.set_yticklabels(layer_names, fontsize=7)
    ax.set_xlabel("epoch")
    fig.colorbar(im, label=metric_name)
    if metric_name:
        ax.set_title(f"{metric_name} by layer and epoch")
    return _save(fig, path)


def plot_scenario_comparison(
    scenario_values: dict[str, tuple[float, float]],
    path: Path | str,
    metric_name: str = "",
    threshold: float | None = None,
) -> Path:
    """Bar chart with error bars across scenarios (reference :263-321)."""
    names = list(scenario_values)
    means = [scenario_values[n][0] for n in names]
    stds = [scenario_values[n][1] for n in names]
    fig, ax = plt.subplots(figsize=(8, 5))
    ax.bar(names, means, yerr=stds, capsize=4, alpha=0.8)
    if threshold is not None:
        ax.axhline(threshold, color="red", ls="--", lw=1, label=f"threshold {threshold}")
        ax.legend()
    ax.set_ylabel(metric_name)
    ax.grid(axis="y", alpha=0.3)
    return _save(fig, path)


def plot_distribution_overlay(
    named_svs: dict[str, np.ndarray],
    path: Path | str,
    kind: str = "loglog",
    title: str = "",
) -> Path:
    """Overlay several spectra: 'ccdf' | 'loglog' | 'hist' (reference :324-376)."""
    fig, ax = plt.subplots(figsize=(8, 5))
    for name, svs in named_svs.items():
        s = _clean(svs)
        if s.size == 0:
            continue
        if kind == "ccdf":
            lam = s**2
            ax.loglog(lam, np.arange(1, lam.size + 1) / lam.size, ".", label=name)
            ax.set_xlabel("lambda")
            ax.set_ylabel("CCDF")
        elif kind == "hist":
            ax.hist(np.log10(s + 1e-12), bins=30, alpha=0.5, label=name)
            ax.set_xlabel("log10 sigma")
        else:
            ax.loglog(np.arange(1, s.size + 1), s, ".-", label=name, alpha=0.7)
            ax.set_xlabel("rank")
            ax.set_ylabel("sigma")
    ax.legend(fontsize=7)
    if title:
        ax.set_title(title)
    return _save(fig, path)


def generate_spectral_report(tracker, out_dir: Path | str) -> list[Path]:
    """Render all plot families from a SpectralTracker (reference :379-469)."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    paths: list[Path] = []
    if not tracker.history:
        return paths
    last = tracker.history[-1]
    for dist in last.distributions:
        safe = dist.name.replace(".", "_")
        p = plot_ccdf_loglog(
            dist.singular_values, out_dir / f"ccdf_{safe}.png", title=dist.name
        )
        if p:
            paths.append(p)
        p = plot_rank_loglog(
            dist.singular_values, out_dir / f"rank_{safe}.png", title=dist.name
        )
        if p:
            paths.append(p)
    histories = {}
    for key in ("alpha_exponent_mean", "stable_rank_mean", "spectral_entropy_mean"):
        epochs, vals = tracker.get_metric_history(key)
        if epochs:
            histories[key] = (epochs, vals)
    if histories:
        paths.append(
            plot_metric_evolution(histories, out_dir / "metric_evolution.png")
        )
    # final-epoch overlay across layers
    overlay = {d.name: d.singular_values for d in last.distributions}
    if overlay:
        paths.append(
            plot_distribution_overlay(
                overlay, out_dir / "layers_overlay.png", title="final epoch"
            )
        )
    return paths
