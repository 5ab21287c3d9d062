"""Matplotlib visualization utilities (host-side).

Reference behavior: vision_spectra/utils/visualization.py:48-849 — prediction
grids, MIM reconstruction grids, singular-value distribution plots, metric
histories, and SV-evolution heatmaps. All functions take numpy arrays (NHWC
images in [0,1] after denormalization) and write PNG files.
"""

from __future__ import annotations

from pathlib import Path

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt
import numpy as np

from vision_spectra_tpu.data.transforms import denormalize


def _to_display(img: np.ndarray) -> np.ndarray:
    """[H, W, C] float [0,1] → displayable (squeeze grayscale)."""
    img = np.clip(np.asarray(img), 0, 1)
    if img.shape[-1] == 1:
        return img[:, :, 0]
    return img


def save_prediction_examples(
    images: np.ndarray,
    labels: np.ndarray,
    preds: np.ndarray,
    probs: np.ndarray,
    path: Path | str,
    class_names: list[str] | None = None,
    max_examples: int = 16,
    mode: str = "all",
    num_channels: int = 3,
) -> Path | None:
    """4-column grid of predictions, green/red titles with confidence.

    ``mode``: 'all' | 'correct' | 'incorrect' (reference: visualization.py:48-233).
    ``images`` are normalized NHWC; denormalized for display.
    """
    labels = np.asarray(labels)
    preds = np.asarray(preds)
    correct = preds == labels
    if mode == "correct":
        keep = np.flatnonzero(correct)
    elif mode == "incorrect":
        keep = np.flatnonzero(~correct)
    else:
        keep = np.arange(len(labels))
    if keep.size == 0:
        return None
    keep = keep[:max_examples]

    disp = np.asarray(denormalize(np.asarray(images)[keep], num_channels))
    n = len(keep)
    cols = 4
    rows = (n + cols - 1) // cols
    fig, axes = plt.subplots(rows, cols, figsize=(3 * cols, 3 * rows))
    axes = np.atleast_1d(axes).ravel()
    for ax in axes[n:]:
        ax.axis("off")
    for i, idx in enumerate(keep):
        ax = axes[i]
        ax.imshow(_to_display(disp[i]), cmap="gray" if num_channels == 1 else None)
        ax.axis("off")
        t, p = int(labels[idx]), int(preds[idx])
        conf = float(probs[idx, p])
        tn = class_names[t] if class_names else str(t)
        pn = class_names[p] if class_names else str(p)
        ax.set_title(
            f"true: {tn}\npred: {pn} ({conf:.2f})",
            color="green" if t == p else "red",
            fontsize=9,
        )
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    fig.tight_layout()
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return path


def save_mim_examples(
    originals: np.ndarray,
    masks: np.ndarray,
    reconstructions: np.ndarray,
    path: Path | str,
    patch_size: int,
    max_examples: int = 4,
    num_channels: int = 3,
) -> Path:
    """Rows: original → masked (gray patches) → reconstruction → |diff| heat.

    Reference: visualization.py:292-505. ``originals``/``reconstructions``
    are normalized NHWC; ``masks`` [B, N] with 1 = masked.
    """
    n = min(max_examples, len(originals))
    orig = np.asarray(denormalize(np.asarray(originals)[:n], num_channels))
    recon = np.asarray(denormalize(np.asarray(reconstructions)[:n], num_channels))
    masks = np.asarray(masks)[:n]

    h = orig.shape[1]
    g = h // patch_size
    # Patchification crops the image to a multiple of the patch size (e.g.
    # 28 px / patch 16 → a 16 px grid); crop the originals to match so the
    # mask overlay and diff panels line up with the reconstruction.
    crop = g * patch_size
    orig = orig[:, :crop, :crop]
    recon = recon[:, :crop, :crop]
    fig, axes = plt.subplots(4, n, figsize=(3 * n, 12))
    axes = np.atleast_2d(axes)
    if axes.shape[0] != 4:
        axes = axes.T
    row_titles = ["original", "masked", "reconstructed", "|difference|"]
    for i in range(n):
        mask_img = masks[i, : g * g].reshape(g, g)
        mask_up = np.kron(mask_img, np.ones((patch_size, patch_size)))[..., None]
        masked = orig[i] * (1 - mask_up) + 0.5 * mask_up
        diff = np.abs(recon[i] - orig[i]).mean(axis=-1)
        panels = [_to_display(orig[i]), _to_display(masked), _to_display(recon[i]), diff]
        for r, panel in enumerate(panels):
            ax = axes[r, i]
            if r == 3:
                ax.imshow(panel, cmap="hot")
            else:
                ax.imshow(panel, cmap="gray" if num_channels == 1 else None)
            ax.axis("off")
            if i == 0:
                ax.set_ylabel(row_titles[r])
                ax.axis("on")
                ax.set_xticks([])
                ax.set_yticks([])
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    fig.tight_layout()
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return path


def plot_singular_value_distribution(
    singular_values: np.ndarray,
    path: Path | str,
    title: str = "",
) -> Path:
    """SV spectrum with cumulative-variance twin axis + 90/95% lines.

    Reference: visualization.py:513-583.
    """
    s = np.asarray(singular_values, dtype=np.float64)
    s = s[np.isfinite(s) & (s >= 0)]
    fig, ax1 = plt.subplots(figsize=(7, 5))
    idx = np.arange(1, len(s) + 1)
    ax1.semilogy(idx, s, "b.-", markersize=4)
    ax1.set_xlabel("rank index")
    ax1.set_ylabel("singular value (log)", color="b")
    if s.size and (s**2).sum() > 0:
        cumvar = np.cumsum(s**2) / (s**2).sum()
        ax2 = ax1.twinx()
        ax2.plot(idx, cumvar, "r--")
        ax2.axhline(0.90, color="gray", lw=0.8, ls=":")
        ax2.axhline(0.95, color="gray", lw=0.8, ls=":")
        ax2.set_ylabel("cumulative variance", color="r")
        ax2.set_ylim(0, 1.02)
    if title:
        ax1.set_title(title)
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    fig.tight_layout()
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return path


def plot_metric_history(
    histories: dict[str, tuple[list[int], list[float]]],
    path: Path | str,
) -> Path:
    """Multi-panel metric-evolution plot (reference: visualization.py:586-641)."""
    n = len(histories)
    if n == 0:
        n = 1
    cols = min(2, n)
    rows = (n + cols - 1) // cols
    fig, axes = plt.subplots(rows, cols, figsize=(6 * cols, 4 * rows), squeeze=False)
    flat = axes.ravel()
    for ax in flat[len(histories):]:
        ax.axis("off")
    for ax, (name, (epochs, values)) in zip(flat, histories.items()):
        ax.plot(epochs, values, "o-")
        ax.set_title(name)
        ax.set_xlabel("epoch")
        ax.grid(alpha=0.3)
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    fig.tight_layout()
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return path


def plot_sv_evolution_heatmap(
    epochs: list[int],
    sv_history: list[np.ndarray],
    path: Path | str,
    title: str = "",
) -> Path | None:
    """Epoch × rank heatmap of log10 singular values (visualization.py:691-751)."""
    if not sv_history:
        return None
    k = min(len(s) for s in sv_history)
    mat = np.stack([np.asarray(s[:k], dtype=np.float64) for s in sv_history])
    mat = np.log10(np.maximum(mat, 1e-12))
    fig, ax = plt.subplots(figsize=(8, 5))
    im = ax.imshow(mat, aspect="auto", cmap="viridis", origin="lower")
    ax.set_yticks(range(len(epochs)))
    ax.set_yticklabels(epochs)
    ax.set_xlabel("rank index")
    ax.set_ylabel("epoch")
    if title:
        ax.set_title(title)
    fig.colorbar(im, label="log10(σ)")
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    fig.tight_layout()
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return path


def save_spectral_distribution_plots(
    tracker,
    out_dir: Path | str,
) -> list[Path]:
    """All plot families from a SpectralTracker (visualization.py:754-849)."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    paths = []
    # Final-epoch per-layer SV distributions
    if tracker.history:
        last = tracker.history[-1]
        for dist in last.distributions:
            safe = dist.name.replace(".", "_")
            p = plot_singular_value_distribution(
                dist.singular_values,
                out_dir / f"sv_{safe}.png",
                title=f"{dist.name} (epoch {last.epoch})",
            )
            paths.append(p)
    # Metric histories
    histories = {}
    for key in ("spectral_entropy_mean", "stable_rank_mean", "alpha_exponent_mean"):
        epochs, vals = tracker.get_metric_history(key)
        if epochs:
            histories[key] = (epochs, vals)
    if histories:
        paths.append(plot_metric_history(histories, out_dir / "metric_history.png"))
    # SV evolution heatmaps per layer
    for name in tracker.get_all_layer_names():
        epochs, svs = tracker.get_layer_sv_history(name)
        if len(epochs) > 1:
            safe = name.replace(".", "_")
            p = plot_sv_evolution_heatmap(
                epochs, svs, out_dir / f"sv_evolution_{safe}.png", title=name
            )
            if p:
                paths.append(p)
    return paths
