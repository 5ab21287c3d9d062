"""Spectral distribution tracking across training epochs.

Reference behavior: vision_spectra/metrics/spectral.py:463-843. The TPU-native
difference is *how* spectra are computed: matrices are grouped by shape and
SVD'd in one batched, jitted device call per group (see
``spectral.metrics.batched_spectral_metrics``), instead of one LAPACK SVD per
matrix on host. Distributions (eigenvalues, normalized SVs, cumulative
variance) are derived from the SV vectors — no second decomposition.

The JSON save/load schema matches the reference so downstream analysis and
plotting consume either framework's artifacts.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from datetime import datetime
from pathlib import Path
from typing import Any

import numpy as np

from vision_spectra_tpu.spectral.extraction import (
    WeightInfo,
    extract_all_weights,
)
from vision_spectra_tpu.spectral.metrics import (
    aggregate_spectral_metrics,
    batched_spectral_metrics_padded,
    get_spectral_metrics,
)

__all__ = [
    "SpectralDistribution",
    "EpochSpectralSnapshot",
    "SpectralTracker",
    "get_spectral_distribution",
    "compute_distributions",
]


@dataclass
class SpectralDistribution:
    """Full spectrum + derived quantities for one weight matrix."""

    name: str
    matrix_type: str
    singular_values: np.ndarray  # descending
    eigenvalues: np.ndarray  # σ²
    normalized_sv: np.ndarray  # σ / σ₁
    cumulative_variance: np.ndarray  # cumsum(σ²) / Σσ²
    metrics: dict[str, float]

    def truncated(self, k: int) -> "SpectralDistribution":
        if len(self.singular_values) <= k:
            return self
        return SpectralDistribution(
            name=self.name,
            matrix_type=self.matrix_type,
            singular_values=self.singular_values[:k],
            eigenvalues=self.eigenvalues[:k],
            normalized_sv=self.normalized_sv[:k],
            cumulative_variance=self.cumulative_variance[:k],
            metrics=self.metrics,
        )


def _distribution_from_svs(
    s: np.ndarray, name: str, matrix_type: str, metrics: dict[str, float]
) -> SpectralDistribution:
    s = np.asarray(s, dtype=np.float64)
    s = s[np.isfinite(s) & (s >= 0)]
    s = np.sort(s)[::-1]
    eig = s**2
    top = s[0] if s.size and s[0] > 0 else 1.0
    total = eig.sum()
    cumvar = np.cumsum(eig) / total if total > 0 else np.zeros_like(eig)
    return SpectralDistribution(
        name=name,
        matrix_type=matrix_type,
        singular_values=s,
        eigenvalues=eig,
        normalized_sv=s / top,
        cumulative_variance=cumvar,
        metrics=metrics,
    )


def get_spectral_distribution(
    weight_matrix: np.ndarray,
    name: str = "",
    matrix_type: str = "unknown",
) -> SpectralDistribution | None:
    """Host-path distribution for a single matrix (float64 LAPACK SVD).

    Reference: metrics/spectral.py:495-570.
    """
    w = np.asarray(weight_matrix, dtype=np.float64)
    if w.ndim != 2:
        return None
    from scipy.linalg import svd as _svd

    try:
        s = _svd(w, compute_uv=False)
    except Exception:
        return None
    if s[np.isfinite(s) & (s >= 0)].size == 0:
        return None
    return _distribution_from_svs(s, name, matrix_type, get_spectral_metrics(w))


def compute_distributions(
    weights: list[WeightInfo],
    on_device: bool = True,
) -> list[SpectralDistribution]:
    """Spectral distributions for a set of matrices.

    ``on_device=True`` orientation-normalizes every matrix, zero-pads to ONE
    canonical ladder shape, and runs a single batched jitted SVD + metrics
    program (dynamic true-length masking) — one device dispatch per snapshot
    and one SVD compilation per *padded* shape, shared across model sizes.
    ``False`` falls back to per-matrix host float64 SVDs (the
    reference-equivalent path).
    """
    if not on_device:
        out = []
        for w in weights:
            d = get_spectral_distribution(w.weight, w.name, w.matrix_type)
            if d is not None:
                out.append(d)
        return out

    group = [w for w in weights if len(w.shape) == 2]
    svs, metric_dicts = batched_spectral_metrics_padded([w.weight for w in group])
    return [
        _distribution_from_svs(s, w.name, w.matrix_type, mm)
        for w, s, mm in zip(group, svs, metric_dicts)
    ]


@dataclass
class EpochSpectralSnapshot:
    """All tracked distributions + aggregates at one epoch."""

    epoch: int
    distributions: list[SpectralDistribution]
    aggregated_metrics: dict[str, float]
    timestamp: str = field(default="")

    def __post_init__(self) -> None:
        if not self.timestamp:
            self.timestamp = datetime.now().isoformat()


class SpectralTracker:
    """Tracks spectral distributions across training epochs.

    Reference: metrics/spectral.py:597-843. ``record_epoch`` takes a params
    pytree (not a torch module) and dispatches to the batched device path.
    """

    def __init__(
        self,
        layer_patterns: list[str] | None = None,
        include_qkv: bool = True,
        include_mlp: bool = False,
        include_patch_embed: bool = True,
        max_singular_values: int = 100,
        on_device: bool = True,
    ) -> None:
        self.layer_patterns = layer_patterns or []
        self.include_qkv = include_qkv
        self.include_mlp = include_mlp
        self.include_patch_embed = include_patch_embed
        self.max_singular_values = max_singular_values
        self.on_device = on_device
        self.history: list[EpochSpectralSnapshot] = []

    def record_epoch(self, params: Any, epoch: int) -> EpochSpectralSnapshot:
        """Record spectral distributions of ``params`` for ``epoch``."""
        weights = extract_all_weights(
            params,
            layer_patterns=self.layer_patterns,
            include_qkv=self.include_qkv,
            include_mlp=self.include_mlp,
            include_patch_embed=self.include_patch_embed,
        )
        distributions = [
            d.truncated(self.max_singular_values)
            for d in compute_distributions(weights, on_device=self.on_device)
        ]
        aggregated = (
            aggregate_spectral_metrics([d.metrics for d in distributions])
            if distributions
            else {}
        )
        snapshot = EpochSpectralSnapshot(
            epoch=epoch, distributions=distributions, aggregated_metrics=aggregated
        )
        self.history.append(snapshot)
        return snapshot

    def get_metric_history(self, metric_name: str) -> tuple[list[int], list[float]]:
        epochs, values = [], []
        for snap in self.history:
            v = snap.aggregated_metrics.get(metric_name)
            if v is not None and np.isfinite(v):
                epochs.append(snap.epoch)
                values.append(v)
        return epochs, values

    def get_layer_sv_history(
        self, layer_name: str
    ) -> tuple[list[int], list[np.ndarray]]:
        epochs, svs = [], []
        for snap in self.history:
            for d in snap.distributions:
                if d.name == layer_name:
                    epochs.append(snap.epoch)
                    svs.append(d.singular_values)
                    break
        return epochs, svs

    def get_all_layer_names(self) -> list[str]:
        if not self.history:
            return []
        return [d.name for d in self.history[0].distributions]

    def to_dict(self) -> dict[str, Any]:
        return {
            "layer_patterns": self.layer_patterns,
            "include_qkv": self.include_qkv,
            "include_mlp": self.include_mlp,
            "include_patch_embed": self.include_patch_embed,
            "max_singular_values": self.max_singular_values,
            "history": [
                {
                    "epoch": s.epoch,
                    "timestamp": s.timestamp,
                    "aggregated_metrics": s.aggregated_metrics,
                    "distributions": [
                        {
                            "name": d.name,
                            "matrix_type": d.matrix_type,
                            "singular_values": d.singular_values.tolist(),
                            "metrics": d.metrics,
                        }
                        for d in s.distributions
                    ],
                }
                for s in self.history
            ],
        }

    def save(self, path: Path | str) -> None:
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=2)

    @classmethod
    def load(cls, path: Path | str) -> "SpectralTracker":
        with open(path) as f:
            data = json.load(f)
        tracker = cls(
            layer_patterns=data.get("layer_patterns", []),
            include_qkv=data.get("include_qkv", True),
            include_mlp=data.get("include_mlp", False),
            include_patch_embed=data.get("include_patch_embed", True),
            max_singular_values=data.get("max_singular_values", 100),
        )
        for h in data.get("history", []):
            distributions = [
                _distribution_from_svs(
                    np.asarray(d["singular_values"], dtype=np.float64),
                    d["name"],
                    d["matrix_type"],
                    d.get("metrics", {}),
                )
                for d in h.get("distributions", [])
            ]
            tracker.history.append(
                EpochSpectralSnapshot(
                    epoch=h["epoch"],
                    distributions=distributions,
                    aggregated_metrics=h.get("aggregated_metrics", {}),
                    timestamp=h.get("timestamp", ""),
                )
            )
        return tracker
