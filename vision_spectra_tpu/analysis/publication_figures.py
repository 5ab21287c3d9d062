"""Publication figure generation from tracked six-scenario runs.

Reference behavior: vision_spectra/analysis/publication_figures.py:111-1134.
Reads metric histories back from the tracking store (epoch-0 first value vs
final value → Δα per run), then renders:

- Δα bar chart ± std with the 0.3 over-compression threshold line,
- accuracy vs Δα scatter,
- 3×2 capacity × data-complexity heatmap [[A, B], [D, C], [E, F]],
- initial vs final stable-rank bars with % reduction,
- results table (PNG + PDF + LaTeX), results_summary.json,
- pairwise t-tests on the fixed pairs (A,B),(D,C),(E,F),(B,C),(C,F),(A,F)
  → statistical_tests.json.

Commands: generate / summary / table / latex-table / stats / all.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path

import click
import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt
import numpy as np
from scipy import stats as scipy_stats

from vision_spectra_tpu import tracking
from vision_spectra_tpu.config import MLRUNS_DIR, PROJECT_ROOT
from vision_spectra_tpu.utils.logging import logger

FIGURES_DIR = PROJECT_ROOT / "references" / "figures"
OVERCOMPRESSION_THRESHOLD = 0.3

SCENARIO_METADATA = {
    "A": {"name": "A: Expressive+Simple", "description": "ViT-Tiny on synthetic"},
    "B": {"name": "B: Expressive+Complex", "description": "ViT-Tiny on PathMNIST"},
    "C": {"name": "C: Reduced+Complex", "description": "96d/3L on PathMNIST"},
    "D": {"name": "D: Reduced+Simple", "description": "96d/3L on synthetic"},
    "E": {"name": "E: Tiny+Simple", "description": "32d/1L on synthetic"},
    "F": {"name": "F: Tiny+Complex", "description": "32d/1L on PathMNIST"},
}
SCENARIO_COLORS = {
    "A": "#1f77b4", "B": "#ff7f0e", "C": "#2ca02c",
    "D": "#d62728", "E": "#9467bd", "F": "#8c564b",
}
TEST_PAIRS = [("A", "B"), ("D", "C"), ("E", "F"), ("B", "C"), ("C", "F"), ("A", "F")]
# Heatmap layout: rows = capacity (full/reduced/tiny), cols = simple/complex.
HEATMAP_GRID = [["A", "B"], ["D", "C"], ["E", "F"]]


@dataclass
class ScenarioMetrics:
    scenario: str
    name: str
    description: str
    accuracy_mean: float
    accuracy_std: float
    alpha_initial_mean: float
    alpha_final_mean: float
    delta_alpha_mean: float
    delta_alpha_std: float
    delta_alpha_values: list[float] = field(default_factory=list)
    stable_rank_initial_mean: float = float("nan")
    stable_rank_final_mean: float = float("nan")
    num_runs: int = 0
    surrogate: bool = False  # any included run trained on surrogate data


def _is_surrogate_run(run) -> bool:
    return (
        run.tags.get("data") == "surrogate"
        or run.params.get("data_provenance") == "surrogate"
    )


def extract_scenario_metrics(
    scenario: str,
    tracking_uri: Path = MLRUNS_DIR,
    include_surrogate: bool = False,
) -> ScenarioMetrics | None:
    """Replay one scenario's metric histories (reference :160-265).

    Surrogate-data runs (tag ``data=surrogate``) are EXCLUDED by default so
    they can never blend into publication figures; pass
    ``include_surrogate=True`` to include them, which marks the scenario's
    display name with ``(surrogate)``.
    """
    experiment_name = f"spectral_scenario_{scenario}"
    tracking.set_tracking_uri(tracking_uri)
    client = tracking.MlflowClient(tracking_uri)
    exp = client.get_experiment_by_name(experiment_name)
    if exp is None:
        logger.warning("Experiment '%s' not found", experiment_name)
        return None
    runs = [
        r for r in client.search_runs([exp.experiment_id])
        if r.info.status == "FINISHED"
    ]
    n_surrogate = sum(_is_surrogate_run(r) for r in runs)
    if not include_surrogate and n_surrogate:
        logger.warning(
            "Scenario %s: excluding %d surrogate-data run(s) "
            "(use --include-surrogate to keep them, clearly marked)",
            scenario, n_surrogate,
        )
        runs = [r for r in runs if not _is_surrogate_run(r)]
    if not runs:
        logger.warning("No usable finished runs for '%s'", experiment_name)
        return None

    # Comparison-time generation guard (VERDICT r4 weak #5): surrogate runs
    # from different generator calibrations are not commensurable — refuse
    # to aggregate them rather than silently blending (the round-4 store
    # incident, and the round-5 robustness study's stale-cache bug, were
    # both this failure mode).
    gens = {
        r.tags.get("surrogate_gen") for r in runs if _is_surrogate_run(r)
    }
    if len(gens) > 1:
        raise ValueError(
            f"Scenario {scenario}: surrogate runs from {len(gens)} distinct "
            f"generator calibrations ({sorted(str(g) for g in gens)}) — "
            f"purge superseded generations (results/run_bcf.py) before "
            f"aggregating."
        )

    accs = []
    for run in runs:
        for key in ("final/val_accuracy", "val/accuracy"):
            v = run.metrics.get(key)
            if v is not None:
                accs.append(v)
                break

    alpha_init, alpha_final, deltas, sr_init, sr_final = [], [], [], [], []
    for run in runs:
        hist = client.get_metric_history(run.info.run_id, "spectral/alpha_exponent_mean")
        if hist:
            hist = sorted(hist, key=lambda m: m.step)
            alpha_init.append(hist[0].value)
            alpha_final.append(hist[-1].value)
            deltas.append(hist[-1].value - hist[0].value)
        sr = client.get_metric_history(run.info.run_id, "spectral/stable_rank_mean")
        if sr:
            sr = sorted(sr, key=lambda m: m.step)
            sr_init.append(sr[0].value)
            sr_final.append(sr[-1].value)

    meta = SCENARIO_METADATA.get(scenario, {"name": scenario, "description": ""})
    any_surrogate = any(_is_surrogate_run(r) for r in runs)
    display_name = meta["name"] + (" (surrogate)" if any_surrogate else "")

    def m(vals):
        return float(np.mean(vals)) if vals else float("nan")

    return ScenarioMetrics(
        scenario=scenario,
        name=display_name,
        description=meta["description"],
        accuracy_mean=m(accs),
        accuracy_std=float(np.std(accs)) if accs else float("nan"),
        alpha_initial_mean=m(alpha_init),
        alpha_final_mean=m(alpha_final),
        delta_alpha_mean=m(deltas),
        delta_alpha_std=float(np.std(deltas)) if deltas else float("nan"),
        delta_alpha_values=deltas,
        stable_rank_initial_mean=m(sr_init),
        stable_rank_final_mean=m(sr_final),
        num_runs=len(runs),
        surrogate=any_surrogate,
    )


def extract_all_scenarios(
    tracking_uri: Path = MLRUNS_DIR,
    include_surrogate: bool = False,
) -> dict[str, ScenarioMetrics]:
    out = {}
    for s in "ABCDEF":
        m = extract_scenario_metrics(s, tracking_uri, include_surrogate)
        if m is not None:
            out[s] = m
    return out


# -- figures ------------------------------------------------------------------


def _savefig(fig, out_dir: Path, stem: str) -> list[Path]:
    out_dir.mkdir(parents=True, exist_ok=True)
    paths = []
    for ext in ("png", "pdf"):
        p = out_dir / f"{stem}.{ext}"
        fig.savefig(p, dpi=200, bbox_inches="tight")
        paths.append(p)
    plt.close(fig)
    return paths


def generate_delta_alpha_bar(metrics, out_dir: Path) -> list[Path]:
    """Δα bars ± std with the 0.3 threshold (reference :322-368)."""
    scenarios = [s for s in "ABCDEF" if s in metrics]
    fig, ax = plt.subplots(figsize=(8, 5))
    vals = [metrics[s].delta_alpha_mean for s in scenarios]
    stds = [metrics[s].delta_alpha_std for s in scenarios]
    colors = [SCENARIO_COLORS[s] for s in scenarios]
    hatches = ["//" if metrics[s].surrogate else None for s in scenarios]
    labels = [s + ("*" if metrics[s].surrogate else "") for s in scenarios]
    bars = ax.bar(labels, vals, yerr=stds, capsize=4, color=colors, alpha=0.85)
    for bar, hatch in zip(bars, hatches):
        if hatch:
            bar.set_hatch(hatch)
    if any(hatches):
        ax.text(0.99, 0.02, "* surrogate data", transform=ax.transAxes,
                ha="right", fontsize=8, color="gray")
    ax.axhline(
        OVERCOMPRESSION_THRESHOLD, color="red", ls="--", lw=1.2,
        label=f"over-compression threshold ({OVERCOMPRESSION_THRESHOLD})",
    )
    ax.axhline(0, color="black", lw=0.8)
    ax.set_ylabel(r"$\Delta\alpha$ (final $-$ initial)")
    ax.set_xlabel("scenario")
    ax.set_title("Spectral compression by scenario")
    ax.legend()
    return _savefig(fig, out_dir, "delta_alpha_by_scenario")


def generate_accuracy_vs_compression(metrics, out_dir: Path) -> list[Path]:
    """Accuracy vs Δα scatter (reference :371-407)."""
    fig, ax = plt.subplots(figsize=(7, 5))
    for s, m in metrics.items():
        ax.errorbar(
            m.delta_alpha_mean, m.accuracy_mean,
            xerr=m.delta_alpha_std, yerr=m.accuracy_std,
            fmt="o", color=SCENARIO_COLORS[s], markersize=9, capsize=3,
        )
        ax.annotate(s, (m.delta_alpha_mean, m.accuracy_mean),
                    textcoords="offset points", xytext=(7, 5))
    ax.axvline(OVERCOMPRESSION_THRESHOLD, color="red", ls="--", lw=1)
    ax.set_xlabel(r"$\Delta\alpha$")
    ax.set_ylabel("validation accuracy (%)")
    ax.set_title("Accuracy vs spectral compression")
    return _savefig(fig, out_dir, "accuracy_vs_compression")


def generate_capacity_complexity_heatmap(metrics, out_dir: Path) -> list[Path]:
    """3×2 capacity × data-complexity Δα heatmap (reference :410-458)."""
    grid = np.full((3, 2), np.nan)
    for i, row in enumerate(HEATMAP_GRID):
        for j, s in enumerate(row):
            if s in metrics:
                grid[i, j] = metrics[s].delta_alpha_mean
    fig, ax = plt.subplots(figsize=(6, 5))
    im = ax.imshow(grid, cmap="RdYlBu_r", aspect="auto")
    ax.set_xticks([0, 1])
    ax.set_xticklabels(["simple data", "complex data"])
    ax.set_yticks([0, 1, 2])
    ax.set_yticklabels(["full capacity", "reduced", "tiny"])
    for i in range(3):
        for j in range(2):
            s = HEATMAP_GRID[i][j]
            if np.isfinite(grid[i, j]):
                ax.text(j, i, f"{s}\n{grid[i, j]:+.3f}", ha="center", va="center")
    fig.colorbar(im, label=r"$\Delta\alpha$")
    ax.set_title("Compression across capacity and complexity")
    return _savefig(fig, out_dir, "capacity_complexity_heatmap")


def generate_stable_rank_bars(metrics, out_dir: Path) -> list[Path]:
    """Initial vs final stable rank with % reduction (reference :461-499)."""
    scenarios = [s for s in "ABCDEF" if s in metrics]
    x = np.arange(len(scenarios))
    init = [metrics[s].stable_rank_initial_mean for s in scenarios]
    final = [metrics[s].stable_rank_final_mean for s in scenarios]
    fig, ax = plt.subplots(figsize=(8, 5))
    ax.bar(x - 0.2, init, width=0.4, label="initial", alpha=0.8)
    ax.bar(x + 0.2, final, width=0.4, label="final", alpha=0.8)
    for i, s in enumerate(scenarios):
        if np.isfinite(init[i]) and init[i] > 0 and np.isfinite(final[i]):
            pct = 100 * (init[i] - final[i]) / init[i]
            ax.text(i, max(init[i], final[i]) * 1.02, f"{pct:+.1f}%", ha="center",
                    fontsize=8)
    ax.set_xticks(x)
    ax.set_xticklabels(scenarios)
    ax.set_ylabel("stable rank (mean over layers)")
    ax.legend()
    ax.set_title("Stable rank before and after training")
    return _savefig(fig, out_dir, "stable_rank_reduction")


def run_statistical_tests(metrics) -> dict:
    """Pairwise Δα t-tests on the fixed pairs (reference :507-551)."""
    tests = {}
    for s1, s2 in TEST_PAIRS:
        if s1 not in metrics or s2 not in metrics:
            continue
        v1 = metrics[s1].delta_alpha_values
        v2 = metrics[s2].delta_alpha_values
        if len(v1) < 2 or len(v2) < 2:
            tests[f"{s1}_vs_{s2}"] = {"error": "insufficient runs"}
            continue
        t, p = scipy_stats.ttest_ind(v1, v2, equal_var=False)
        tests[f"{s1}_vs_{s2}"] = {
            "mean_1": float(np.mean(v1)),
            "mean_2": float(np.mean(v2)),
            "t_statistic": float(t),
            "p_value": float(p),
            "significant": bool(p < 0.05),
        }
    return tests


def build_summary(metrics) -> dict:
    return {
        s: {
            "name": m.name,
            "data": "surrogate" if m.surrogate else "real",
            "num_runs": m.num_runs,
            "accuracy_mean": m.accuracy_mean,
            "accuracy_std": m.accuracy_std,
            "alpha_initial": m.alpha_initial_mean,
            "alpha_final": m.alpha_final_mean,
            "delta_alpha_mean": m.delta_alpha_mean,
            "delta_alpha_std": m.delta_alpha_std,
            "stable_rank_initial": m.stable_rank_initial_mean,
            "stable_rank_final": m.stable_rank_final_mean,
        }
        for s, m in metrics.items()
    }


def _table_rows(metrics):
    header = ["Scenario", "Runs", "Val Acc (%)", "alpha_init", "alpha_final",
              "Delta alpha", "SR init", "SR final"]
    rows = []
    for s in "ABCDEF":
        if s not in metrics:
            continue
        m = metrics[s]
        rows.append([
            m.name, str(m.num_runs),
            f"{m.accuracy_mean:.1f} ± {m.accuracy_std:.1f}",
            f"{m.alpha_initial_mean:.3f}",
            f"{m.alpha_final_mean:.3f}",
            f"{m.delta_alpha_mean:+.3f} ± {m.delta_alpha_std:.3f}",
            f"{m.stable_rank_initial_mean:.2f}",
            f"{m.stable_rank_final_mean:.2f}",
        ])
    return header, rows


def generate_results_table(metrics, out_dir: Path) -> list[Path]:
    """Table image PNG + PDF (reference :719-793)."""
    header, rows = _table_rows(metrics)
    fig, ax = plt.subplots(figsize=(12, 0.5 + 0.45 * len(rows)))
    ax.axis("off")
    table = ax.table(cellText=rows, colLabels=header, loc="center", cellLoc="center")
    table.auto_set_font_size(False)
    table.set_fontsize(8)
    table.scale(1, 1.4)
    return _savefig(fig, out_dir, "results_table")


def generate_latex_table(metrics, out_dir: Path) -> Path:
    """LaTeX table (reference :845-874)."""
    header, rows = _table_rows(metrics)
    out_dir.mkdir(parents=True, exist_ok=True)
    path = out_dir / "results_table.tex"
    lines = [
        r"\begin{table}[t]",
        r"\centering",
        r"\caption{Six-scenario spectral analysis results.}",
        r"\begin{tabular}{l" + "c" * (len(header) - 1) + "}",
        r"\toprule",
        " & ".join(header).replace("±", r"$\pm$").replace("Delta alpha", r"$\Delta\alpha$")
        + r" \\",
        r"\midrule",
    ]
    for row in rows:
        lines.append(" & ".join(c.replace("±", r"$\pm$") for c in row) + r" \\")
    lines += [r"\bottomrule", r"\end{tabular}", r"\end{table}"]
    path.write_text("\n".join(lines))
    return path


# -- CLI ----------------------------------------------------------------------


def _common(f):
    f = click.option("--include-surrogate", is_flag=True, default=False,
                     help="Include surrogate-data runs (marked in outputs)")(f)
    f = click.option("--output-dir", "out_dir", type=click.Path(path_type=Path),
                     default=FIGURES_DIR, help="Figure output directory")(f)
    f = click.option("--tracking-uri", type=click.Path(path_type=Path),
                     default=MLRUNS_DIR, help="Tracking store root")(f)
    return f


@click.group("figures")
def figures() -> None:
    """Publication figures from tracked scenario runs."""


@figures.command("generate")
@_common
def generate(tracking_uri, out_dir, include_surrogate):
    """All four figures (reference :559-618)."""
    metrics = extract_all_scenarios(tracking_uri, include_surrogate)
    if not metrics:
        click.echo("No scenario runs found.", err=True)
        raise SystemExit(1)
    paths = []
    paths += generate_delta_alpha_bar(metrics, out_dir)
    paths += generate_accuracy_vs_compression(metrics, out_dir)
    paths += generate_capacity_complexity_heatmap(metrics, out_dir)
    paths += generate_stable_rank_bars(metrics, out_dir)
    for p in paths:
        click.echo(str(p))


@figures.command("summary")
@_common
def summary(tracking_uri, out_dir, include_surrogate):
    """results_summary.json (reference :621-793)."""
    metrics = extract_all_scenarios(tracking_uri, include_surrogate)
    out_dir.mkdir(parents=True, exist_ok=True)
    path = out_dir / "results_summary.json"
    with open(path, "w") as f:
        json.dump(build_summary(metrics), f, indent=2, default=float)
    click.echo(str(path))


@figures.command("table")
@_common
def table(tracking_uri, out_dir, include_surrogate):
    """Results table image (reference :796-874)."""
    metrics = extract_all_scenarios(tracking_uri, include_surrogate)
    for p in generate_results_table(metrics, out_dir):
        click.echo(str(p))


@figures.command("latex-table")
@_common
def latex_table(tracking_uri, out_dir, include_surrogate):
    """LaTeX results table (reference :877-905)."""
    metrics = extract_all_scenarios(tracking_uri, include_surrogate)
    click.echo(str(generate_latex_table(metrics, out_dir)))


@figures.command("stats")
@_common
def stats_cmd(tracking_uri, out_dir, include_surrogate):
    """Pairwise t-tests → statistical_tests.json (reference :908-962)."""
    metrics = extract_all_scenarios(tracking_uri, include_surrogate)
    tests = run_statistical_tests(metrics)
    out_dir.mkdir(parents=True, exist_ok=True)
    path = out_dir / "statistical_tests.json"
    with open(path, "w") as f:
        json.dump(tests, f, indent=2)
    click.echo(str(path))


@figures.command("all")
@_common
def all_cmd(tracking_uri, out_dir, include_surrogate):
    """Figures + table + LaTeX + summary + stats (reference :965-1083)."""
    metrics = extract_all_scenarios(tracking_uri, include_surrogate)
    if not metrics:
        click.echo("No scenario runs found.", err=True)
        raise SystemExit(1)
    paths = []
    paths += generate_delta_alpha_bar(metrics, out_dir)
    paths += generate_accuracy_vs_compression(metrics, out_dir)
    paths += generate_capacity_complexity_heatmap(metrics, out_dir)
    paths += generate_stable_rank_bars(metrics, out_dir)
    paths += generate_results_table(metrics, out_dir)
    paths.append(generate_latex_table(metrics, out_dir))
    with open(out_dir / "results_summary.json", "w") as f:
        json.dump(build_summary(metrics), f, indent=2, default=float)
    paths.append(out_dir / "results_summary.json")
    with open(out_dir / "statistical_tests.json", "w") as f:
        json.dump(run_statistical_tests(metrics), f, indent=2)
    paths.append(out_dir / "statistical_tests.json")
    for p in paths:
        click.echo(str(p))
