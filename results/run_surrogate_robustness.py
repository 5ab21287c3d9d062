"""Surrogate-calibration robustness study (VERDICT r4 next #5).

Round 4 froze the surrogate's two calibration knobs (SURROGATE_TINT_AMP,
SURROGATE_NOISE_STD — data/medmnist.py). This study asks the question that
matters more than further tuning: is the B/C/F qualitative contract
(Δα > 0 on all three, ordering B < C < F, over-compression degrading
accuracy — spectral/statistical.validate_hypothesis) a knife-edge artifact
of those exact values, or a robust property of the surrogate family?

Grid: the four corners of (tint x0.5 / x1.5) x (noise -0.03 / +0.03) around
the shipped center, 1 seed x full scenario epochs each, in a sandboxed
tracking store (the committed store never sees off-calibration runs).
Reports per-corner contract outcomes; the table lands in RESULTS.md.

Usage (TPU): PYTHONPATH=/root/repo:$PYTHONPATH \
    python results/run_surrogate_robustness.py
"""

import json
import tempfile
import time
from pathlib import Path

from vision_spectra_tpu.core.runtime import enable_compilation_cache

enable_compilation_cache()

from vision_spectra_tpu.data import medmnist as mm  # noqa: E402
from vision_spectra_tpu.experiments.run_spectral_analysis import (  # noqa: E402
    ScenarioType,
    run_scenario,
)

REPO = Path("/root/repo")
CENTER_TINT = mm.SURROGATE_TINT_AMP
CENTER_NOISE = mm.SURROGATE_NOISE_STD

CORNERS = [
    ("tint x0.5, noise -0.03", CENTER_TINT * 0.5, CENTER_NOISE - 0.03),
    ("tint x0.5, noise +0.03", CENTER_TINT * 0.5, CENTER_NOISE + 0.03),
    ("tint x1.5, noise -0.03", CENTER_TINT * 1.5, CENTER_NOISE - 0.03),
    ("tint x1.5, noise +0.03", CENTER_TINT * 1.5, CENTER_NOISE + 0.03),
]


def run_corner(label: str, tint: float, noise: float) -> dict:
    from vision_spectra_tpu.analysis import publication_figures as pf
    from vision_spectra_tpu.spectral.statistical import validate_hypothesis

    mm.SURROGATE_TINT_AMP = tint
    mm.SURROGATE_NOISE_STD = noise
    tmp = Path(tempfile.mkdtemp(prefix="vst_robust_"))
    t0 = time.time()
    accs = {}
    for st in (ScenarioType.F_TINY_COMPLEX, ScenarioType.C_REDUCED_COMPLEX,
               ScenarioType.B_EXPRESSIVE_COMPLEX):
        rs = run_scenario(st, num_seeds=1, output_dir=tmp / "mlruns",
                          data_dir=tmp / "data", histogram_artifacts=False)
        accs[st.value] = [r.best_val_accuracy for r in rs]
    metrics = pf.extract_all_scenarios(str(tmp / "mlruns"),
                                       include_surrogate=True)
    series = {
        s: {"delta_alpha": m.delta_alpha_values or [m.delta_alpha_mean],
            "accuracy": [m.accuracy_mean]}
        for s, m in metrics.items() if s in ("B", "C", "F")
    }
    checks = validate_hypothesis(series)
    out = {
        "label": label, "tint": tint, "noise": noise,
        "delta_alpha": {s: round(m.delta_alpha_mean, 4)
                        for s, m in metrics.items()},
        "accuracy": {s: round(m.accuracy_mean, 2)
                     for s, m in metrics.items()},
        "contract": {
            k: checks[k]["supported"]
            for k in ("dalpha_positive_BCF", "dalpha_ordering_BCF",
                      "overcompression_degrades_accuracy")
            if k in checks
        },
        "minutes": round((time.time() - t0) / 60, 1),
    }
    print(json.dumps(out), flush=True)
    return out


def main() -> None:
    out = REPO / "results" / "surrogate_robustness.json"
    results = []
    try:
        for label, tint, noise in CORNERS:
            print(f"=== corner: {label} ===", flush=True)
            results.append(run_corner(label, tint, noise))
            # Incremental write: a killed run keeps its finished corners.
            out.write_text(json.dumps(results, indent=1))
    finally:
        mm.SURROGATE_TINT_AMP = CENTER_TINT
        mm.SURROGATE_NOISE_STD = CENTER_NOISE
    n_pass = sum(
        all(v is not False for v in r["contract"].values()) for r in results
    )
    print(f"\n{n_pass}/{len(results)} corners uphold the qualitative "
          f"contract -> {out}", flush=True)


if __name__ == "__main__":
    main()
