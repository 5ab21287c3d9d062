"""Statistical comparison of experiment groups.

Reference behavior: vision_spectra/metrics/statistical.py:20-271 — Welch /
paired t-tests, Wilcoxon / Mann-Whitney, Cohen's d, 95% CI, significance at
p < 0.05; pairwise scenario × metric sweeps; markdown table formatting; and
directional hypothesis validation for the capacity-compression predictions
(B α > A, B stable-rank < A, C α < B).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import numpy as np
from scipy import stats

__all__ = [
    "ComparisonResult",
    "compare_groups",
    "pairwise_comparisons",
    "format_comparison_table",
    "summary_statistics",
    "validate_hypothesis",
]


@dataclass
class ComparisonResult:
    group1_name: str
    group2_name: str
    metric: str
    group1_mean: float
    group2_mean: float
    group1_std: float
    group2_std: float
    t_statistic: float
    p_value: float
    nonparametric_statistic: float
    nonparametric_p: float
    cohens_d: float
    ci_lower: float
    ci_upper: float
    significant: bool
    n1: int = 0
    n2: int = 0


def _cohens_d(a: np.ndarray, b: np.ndarray) -> float:
    n1, n2 = len(a), len(b)
    pooled = np.sqrt(
        ((n1 - 1) * np.var(a, ddof=1) + (n2 - 1) * np.var(b, ddof=1))
        / max(n1 + n2 - 2, 1)
    )
    if pooled == 0:
        return 0.0
    return float((np.mean(a) - np.mean(b)) / pooled)


def compare_groups(
    group1: np.ndarray | list[float],
    group2: np.ndarray | list[float],
    group1_name: str = "group1",
    group2_name: str = "group2",
    metric: str = "",
    paired: bool = False,
    alpha: float = 0.05,
) -> ComparisonResult:
    """Full two-group comparison (reference: statistical.py:51-126)."""
    a = np.asarray(group1, dtype=np.float64)
    b = np.asarray(group2, dtype=np.float64)
    a = a[np.isfinite(a)]
    b = b[np.isfinite(b)]

    if paired and len(a) == len(b):
        t_stat, p = stats.ttest_rel(a, b)
        try:
            np_stat, np_p = stats.wilcoxon(a, b)
        except ValueError:  # all differences zero
            np_stat, np_p = 0.0, 1.0
    else:
        t_stat, p = stats.ttest_ind(a, b, equal_var=False)  # Welch
        np_stat, np_p = stats.mannwhitneyu(a, b, alternative="two-sided")

    diff = np.mean(a) - np.mean(b)
    se = np.sqrt(np.var(a, ddof=1) / len(a) + np.var(b, ddof=1) / len(b))
    ci = 1.96 * se

    return ComparisonResult(
        group1_name=group1_name,
        group2_name=group2_name,
        metric=metric,
        group1_mean=float(np.mean(a)),
        group2_mean=float(np.mean(b)),
        group1_std=float(np.std(a, ddof=1)) if len(a) > 1 else 0.0,
        group2_std=float(np.std(b, ddof=1)) if len(b) > 1 else 0.0,
        t_statistic=float(t_stat),
        p_value=float(p),
        nonparametric_statistic=float(np_stat),
        nonparametric_p=float(np_p),
        cohens_d=_cohens_d(a, b),
        ci_lower=float(diff - ci),
        ci_upper=float(diff + ci),
        significant=bool(p < alpha),
        n1=len(a),
        n2=len(b),
    )


def pairwise_comparisons(
    groups: dict[str, dict[str, list[float]]],
    metrics: list[str] | None = None,
) -> list[ComparisonResult]:
    """All scenario-pair × metric comparisons (reference: statistical.py:129-152)."""
    names = sorted(groups)
    if metrics is None:
        metrics = sorted({m for g in groups.values() for m in g})
    out = []
    for i, n1 in enumerate(names):
        for n2 in names[i + 1 :]:
            for metric in metrics:
                v1 = groups[n1].get(metric, [])
                v2 = groups[n2].get(metric, [])
                if len(v1) >= 2 and len(v2) >= 2:
                    out.append(compare_groups(v1, v2, n1, n2, metric))
    return out


def format_comparison_table(results: list[ComparisonResult]) -> str:
    """Markdown table (reference: statistical.py:155-170)."""
    lines = [
        "| Metric | Group 1 | Group 2 | Mean 1 | Mean 2 | t | p | Cohen's d | Sig |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for r in results:
        lines.append(
            f"| {r.metric} | {r.group1_name} | {r.group2_name} "
            f"| {r.group1_mean:.4f} | {r.group2_mean:.4f} "
            f"| {r.t_statistic:.3f} | {r.p_value:.4f} | {r.cohens_d:.3f} "
            f"| {'*' if r.significant else ''} |"
        )
    return "\n".join(lines)


def summary_statistics(values: list[float] | np.ndarray) -> dict[str, float]:
    """Mean/std/min/max/median/sem (reference: statistical.py:173-199)."""
    v = np.asarray(values, dtype=np.float64)
    v = v[np.isfinite(v)]
    if v.size == 0:
        return {k: float("nan") for k in ("mean", "std", "min", "max", "median", "sem", "n")}
    return {
        "mean": float(np.mean(v)),
        "std": float(np.std(v, ddof=1)) if v.size > 1 else 0.0,
        "min": float(np.min(v)),
        "max": float(np.max(v)),
        "median": float(np.median(v)),
        "sem": float(stats.sem(v)) if v.size > 1 else 0.0,
        "n": float(v.size),
    }


def validate_hypothesis(
    scenario_metrics: dict[str, dict[str, list[float]]],
) -> dict[str, Any]:
    """Directional capacity-compression predictions (reference: statistical.py:202-271).

    - B final alpha > A final alpha (complex data compresses more),
    - B stable rank < A stable rank,
    - C alpha > B alpha (reduced capacity compresses more on complex data).

    When ``delta_alpha`` (and optionally ``accuracy``) series are supplied,
    the complex-data qualitative contract is also checked (reference
    README.md:104-106; VERDICT r2 next-round #2):

    - Δα > 0 for each of B, C, F,
    - ordering Δα(B) < Δα(C) < Δα(F),
    - over-compression: scenarios past the Δα ≈ 0.3 threshold have lower
      accuracy than those below it.
    """
    checks: dict[str, Any] = {}

    def mean_of(scn: str, metric: str) -> float:
        vals = scenario_metrics.get(scn, {}).get(metric, [])
        vals = [v for v in vals if np.isfinite(v)]
        return float(np.mean(vals)) if vals else float("nan")

    a_alpha = mean_of("A", "alpha_final")
    b_alpha = mean_of("B", "alpha_final")
    c_alpha = mean_of("C", "alpha_final")
    a_sr = mean_of("A", "stable_rank_final")
    b_sr = mean_of("B", "stable_rank_final")

    checks["B_alpha_gt_A"] = {
        "prediction": "B alpha > A alpha",
        "values": {"A": a_alpha, "B": b_alpha},
        "supported": bool(b_alpha > a_alpha)
        if np.isfinite(a_alpha) and np.isfinite(b_alpha)
        else None,
    }
    checks["B_sr_lt_A"] = {
        "prediction": "B stable rank < A stable rank",
        "values": {"A": a_sr, "B": b_sr},
        "supported": bool(b_sr < a_sr)
        if np.isfinite(a_sr) and np.isfinite(b_sr)
        else None,
    }
    checks["C_alpha_gt_B"] = {
        "prediction": "C alpha > B alpha",
        "values": {"B": b_alpha, "C": c_alpha},
        "supported": bool(c_alpha > b_alpha)
        if np.isfinite(b_alpha) and np.isfinite(c_alpha)
        else None,
    }
    # Complex-data qualitative contract, checked when Δα series exist.
    dalphas = {s: mean_of(s, "delta_alpha") for s in ("B", "C", "F")}
    if any(np.isfinite(v) for v in dalphas.values()):
        finite = {s: v for s, v in dalphas.items() if np.isfinite(v)}
        checks["dalpha_positive_BCF"] = {
            "prediction": "delta alpha > 0 for B, C, F",
            "values": dalphas,
            "supported": bool(all(v > 0 for v in finite.values()))
            if len(finite) == 3
            else None,
        }
        checks["dalpha_ordering_BCF"] = {
            "prediction": "delta alpha B < C < F",
            "values": dalphas,
            "supported": bool(
                dalphas["B"] < dalphas["C"] < dalphas["F"]
            )
            if len(finite) == 3
            else None,
        }
        accs = {s: mean_of(s, "accuracy") for s in ("B", "C", "F")}
        over = [s for s, v in finite.items() if v > 0.3]
        under = [s for s, v in finite.items() if v <= 0.3]
        both = (
            over
            and under
            and all(np.isfinite(accs[s]) for s in over + under)
        )
        checks["overcompression_degrades_accuracy"] = {
            "prediction": "scenarios with delta alpha > 0.3 have lower "
            "accuracy than those below the threshold",
            "values": {"delta_alpha": dalphas, "accuracy": accs},
            "supported": bool(
                max(accs[s] for s in over) < min(accs[s] for s in under)
            )
            if both
            else None,
        }

    supported = [c["supported"] for c in checks.values() if c["supported"] is not None]
    checks["overall"] = {
        "num_checked": len(supported),
        "num_supported": int(sum(supported)),
    }
    return checks
