"""Spectral instrumentation: batched on-device SVD metrics, extraction, tracking."""

from vision_spectra_tpu.spectral.extraction import (
    WeightInfo,
    extract_all_weights,
    extract_attention_weights,
    extract_mlp_weights,
    extract_patch_embed_weights,
    extract_qkv_weights,
    group_weights_by_layer,
    group_weights_by_shape,
    group_weights_by_type,
)
from vision_spectra_tpu.spectral.metrics import (
    METRIC_KEYS,
    aggregate_spectral_metrics,
    alpha_exponent,
    batched_singular_values,
    batched_spectral_metrics,
    get_spectral_metrics,
    metrics_from_singular_values,
    power_law_alpha_hill,
    spectral_entropy,
    stable_rank,
)
from vision_spectra_tpu.spectral.tracker import (
    EpochSpectralSnapshot,
    SpectralDistribution,
    SpectralTracker,
    compute_distributions,
    get_spectral_distribution,
)

__all__ = [
    "METRIC_KEYS",
    "EpochSpectralSnapshot",
    "SpectralDistribution",
    "SpectralTracker",
    "WeightInfo",
    "aggregate_spectral_metrics",
    "alpha_exponent",
    "batched_singular_values",
    "batched_spectral_metrics",
    "compute_distributions",
    "extract_all_weights",
    "extract_attention_weights",
    "extract_mlp_weights",
    "extract_patch_embed_weights",
    "extract_qkv_weights",
    "get_spectral_distribution",
    "get_spectral_metrics",
    "group_weights_by_layer",
    "group_weights_by_shape",
    "group_weights_by_type",
    "metrics_from_singular_values",
    "power_law_alpha_hill",
    "spectral_entropy",
    "stable_rank",
]
