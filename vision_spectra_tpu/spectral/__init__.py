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
    batched_spectral_metrics_padded,
    bucket_dim,
    metrics_from_singular_values_dynamic,
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
    "batched_spectral_metrics_padded",
    "bucket_dim",
    "metrics_from_singular_values_dynamic",
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

# Science extras
from vision_spectra_tpu.spectral.gradient_alignment import (  # noqa: E402
    GradientAlignmentTracker,
    aggregate_alignment,
    compute_gradient_alignment,
    compute_model_alignment,
    rank_reducing_direction,
)
from vision_spectra_tpu.spectral.statistical import (  # noqa: E402
    ComparisonResult,
    compare_groups,
    format_comparison_table,
    pairwise_comparisons,
    summary_statistics,
    validate_hypothesis,
)
from vision_spectra_tpu.spectral.tail_truncation import (  # noqa: E402
    analyze_truncation_results,
    run_truncation_experiment,
    save_truncation_report,
    truncate_attention_weights,
    truncate_matrix_by_energy,
    truncate_matrix_by_ratio,
)

__all__ += [
    "ComparisonResult",
    "GradientAlignmentTracker",
    "aggregate_alignment",
    "analyze_truncation_results",
    "compare_groups",
    "compute_gradient_alignment",
    "compute_model_alignment",
    "format_comparison_table",
    "pairwise_comparisons",
    "rank_reducing_direction",
    "run_truncation_experiment",
    "save_truncation_report",
    "summary_statistics",
    "truncate_attention_weights",
    "truncate_matrix_by_energy",
    "truncate_matrix_by_ratio",
    "validate_hypothesis",
]
