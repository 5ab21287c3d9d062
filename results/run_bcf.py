"""One-command PathMNIST B/C/F refresh (VERDICT r1 item 2).

Runs scenarios B, C, F (3 seeds each), regenerates BOTH figure sets
(`results/figures/` real-only, `results/figures_all/` with surrogate runs
hatched), and rewrites the B/C/F table inside results/RESULTS.md between the
``<!-- BCF:BEGIN -->`` / ``<!-- BCF:END -->`` markers — including the data
provenance, so the moment a validated ``data/pathmnist.npz`` is dropped in
(schema+digest checks: data/medmnist.validate_medmnist_npz), rerunning this
script closes the real-data half of the north star with zero manual steps.

Usage:
    PYTHONPATH=/root/repo:$PYTHONPATH python results/run_bcf.py [--dry-run]

--dry-run: skip the (13-min) scenario training and only refresh figures +
RESULTS.md from whatever runs the tracking store already holds — used to
prove the refresh loop end-to-end against the committed surrogate store.
"""
import re
import sys
import time
from pathlib import Path

from vision_spectra_tpu.core.runtime import enable_compilation_cache

enable_compilation_cache()

from vision_spectra_tpu.experiments.run_spectral_analysis import (  # noqa: E402
    ScenarioType,
    run_scenario,
)

REPO = Path("/root/repo")
OUT = REPO / "results" / "mlruns"
RESULTS_MD = REPO / "results" / "RESULTS.md"
REF_DELTAS = {"B": "+0.127", "C": "+0.315", "F": "+0.451"}
REF_ACCS = {"B": "70.9%", "C": "65.3%", "F": "56.8%"}


def purge_superseded_surrogate_runs(
    scenario: str, newer_than: float
) -> None:
    """Soft-delete ONE scenario's prior SURROGATE runs, AFTER its
    replacement runs have finished (ADVICE r4: purging everything up front
    left the store empty for un-retrained scenarios when a refresh died
    mid-way — tunnel outages are routine here). Only runs started before
    ``newer_than`` are purged, so the replacements survive.

    Surrogate generations are not commensurable — the generator's
    calibration constants (tint amplitude, noise std, …) change between
    refreshes, and the figures/table extractor averages over all finished
    runs of a scenario, so stale generations would blend into the refreshed
    means (this exact bug produced a 50/50 v3+v4 mix in round 4). Real-data
    runs are never purged."""
    from vision_spectra_tpu import tracking

    tracking.set_tracking_uri(OUT)
    client = tracking.MlflowClient(OUT)
    n = 0
    exp = client.get_experiment_by_name(f"spectral_scenario_{scenario}")
    if exp is None:
        return
    for run in client.search_runs([exp.experiment_id]):
        if (run.tags.get("data") == "surrogate"
                and run.info.start_time / 1000.0 < newer_than):
            client.delete_run(run.info.run_id)
            n += 1
    print(f"{scenario}: purged {n} superseded surrogate run(s)", flush=True)


def run_scenarios(num_seeds=None, epochs=None, data_dir=None):
    """Full-epoch 3-seed B/C/F by default; the real-data rehearsal drill
    (results/run_realdata_drill.py) shrinks seeds/epochs and points
    ``data_dir`` at a staged npz — same code path either way."""
    t0 = time.time()
    kwargs = {}
    if epochs is not None:
        kwargs["epochs"] = epochs
    if data_dir is not None:
        kwargs["data_dir"] = data_dir
    for st in [ScenarioType.F_TINY_COMPLEX, ScenarioType.C_REDUCED_COMPLEX,
               ScenarioType.B_EXPRESSIVE_COMPLEX]:
        print(f"=== {st.value} start t={time.time()-t0:.0f}s ===", flush=True)
        started = time.time()
        results = run_scenario(st, num_seeds=num_seeds, output_dir=OUT,
                               histogram_artifacts=False, **kwargs)
        if all(r.success for r in results):
            # Replacements landed: now (and only now) retire this
            # scenario's previous surrogate generation.
            purge_superseded_surrogate_runs(st.value, started)
        for r in results:
            print(
                f"{st.value} seed {r.seed}: ok={r.success} "
                f"acc={r.best_val_accuracy:.2f}% "
                f"alpha_final={r.final_metrics.get('alpha_exponent_mean', float('nan')):.4f} "
                f"time={r.training_time:.0f}s",
                flush=True,
            )
    print("scenarios done", round(time.time() - t0), "s", flush=True)


def refresh_figures():
    from vision_spectra_tpu.analysis import publication_figures as pf

    all_metrics = None
    for out_dir, include in ((REPO / "results/figures", False),
                             (REPO / "results/figures_all", True)):
        metrics = pf.extract_all_scenarios(str(OUT), include_surrogate=include)
        if include:
            all_metrics = metrics  # reuse for RESULTS.md — no third store scan
        out_dir.mkdir(parents=True, exist_ok=True)
        pf.generate_delta_alpha_bar(metrics, out_dir)
        pf.generate_accuracy_vs_compression(metrics, out_dir)
        pf.generate_capacity_complexity_heatmap(metrics, out_dir)
        pf.generate_stable_rank_bars(metrics, out_dir)
        pf.generate_results_table(metrics, out_dir)
        pf.generate_latex_table(metrics, out_dir)
        print(f"figures -> {out_dir} (include_surrogate={include})", flush=True)
    return all_metrics


def rewrite_results_md(metrics):
    # metrics: dict "A".."F" -> ScenarioMetrics (publication_figures).
    bcf = {s: m for s, m in metrics.items() if s in ("B", "C", "F")}
    if not bcf:
        print("no B/C/F runs in the store; RESULTS.md untouched", flush=True)
        return
    surrogate = any(m.surrogate for m in bcf.values())
    prov = "SURROGATE" if surrogate else "REAL PathMNIST"
    lines = [
        "<!-- BCF:BEGIN -->",
        f"### PathMNIST scenarios (B/C/F) — **{prov}** data, 3 seeds",
        "",
    ]
    if surrogate:
        lines += [
            "Real PathMNIST is unavailable here (zero egress); these runs use",
            "the deterministic surrogate and validate the **pipeline at full",
            "scale**, not the published numbers. Every run carries the",
            "`data=surrogate` tag; the default `figures` path excludes them.",
            "Drop a validated `pathmnist.npz` into `data/` (schema + digest",
            "checks run automatically) and rerun `results/run_bcf.py` — this",
            "table, both figure sets, and the provenance flip to real data",
            "with no manual steps.",
            "",
        ]
    else:
        lines += [
            "Runs carry the `data_sha256` tag of the validated npz artifact.",
            "",
        ]
    lines += [
        "| Scenario | Δα (ours) | Δα (ref, real data) | acc (ours) | acc (ref) |",
        "|---|---|---|---|---|",
    ]
    label = {"B": "B — ViT-Tiny", "C": "C — 96d/3L", "F": "F — 32d/1L"}
    for s in ("B", "C", "F"):
        m = bcf.get(s)
        if m is None:
            lines.append(f"| {label[s]} | — | {REF_DELTAS[s]} | — | {REF_ACCS[s]} |")
            continue
        lines.append(
            f"| {label[s]} | {m.delta_alpha_mean:+.3f} | {REF_DELTAS[s]} "
            f"| {m.accuracy_mean:.1f}% | {REF_ACCS[s]} |"
        )
    lines.append("<!-- BCF:END -->")
    block = "\n".join(lines)

    text = RESULTS_MD.read_text()
    if "<!-- BCF:BEGIN -->" in text:
        text = re.sub(
            r"<!-- BCF:BEGIN -->.*?<!-- BCF:END -->", block, text, flags=re.S
        )
    else:
        text += "\n\n" + block + "\n"
    RESULTS_MD.write_text(text)
    print(f"RESULTS.md B/C/F section refreshed ({prov})", flush=True)


def check_contract(metrics):
    """Qualitative B/C/F contract (VERDICT r2 next-round #2): Δα > 0 on all
    three, ordering B < C < F, accuracy degradation past Δα ≈ 0.3 — checked
    via spectral.statistical.validate_hypothesis on whatever provenance the
    store holds (surrogate must now reproduce the *shape* of the effect;
    real data must reproduce the numbers)."""
    from vision_spectra_tpu.spectral.statistical import validate_hypothesis

    series = {
        s: {
            "delta_alpha": m.delta_alpha_values or [m.delta_alpha_mean],
            "accuracy": [m.accuracy_mean],
        }
        for s, m in metrics.items()
        if s in ("B", "C", "F")
    }
    checks = validate_hypothesis(series)
    ok = True
    for key in ("dalpha_positive_BCF", "dalpha_ordering_BCF",
                "overcompression_degrades_accuracy"):
        c = checks.get(key)
        if c is None:
            print(f"contract {key}: not checkable (missing scenarios)")
            continue
        status = {True: "PASS", False: "FAIL", None: "n/a"}[c["supported"]]
        ok = ok and c["supported"] is not False
        print(f"contract {key}: {status}  {c['values']}", flush=True)
    return ok


if __name__ == "__main__":
    if "--dry-run" not in sys.argv:
        run_scenarios()
    metrics = refresh_figures()
    rewrite_results_md(metrics)
    contract_ok = check_contract(
        {s: m for s, m in (metrics or {}).items()}
    )
    print("ALL DONE" + ("" if contract_ok else " (CONTRACT VIOLATIONS ABOVE)"),
          flush=True)
