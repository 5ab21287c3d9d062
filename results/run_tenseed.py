"""10-seed A/D/E estimate under the SHIPPED configuration.

The reference protocol (seeds 42/123/456) carries ~0.6-1.5 pt standard
error on 3-seed accuracy means; this runs the synthetic scenarios on 10
seeds with the production defaults (torchvision-faithful augmentation,
timm-faithful init, XLA block path at the science geometry) and writes
``results/tenseed/summary.json`` — the better estimate of the true gap
reported alongside the protocol table in RESULTS.md.

Usage (TPU):  PYTHONPATH=/root/repo:$PYTHONPATH python results/run_tenseed.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

from vision_spectra_tpu.core.runtime import enable_compilation_cache

enable_compilation_cache()

from vision_spectra_tpu.experiments.run_spectral_analysis import (  # noqa: E402
    SCENARIO_CONFIGS,
    ScenarioType,
    run_scenario_experiment,
)

REFERENCE = {  # /root/reference/README.md:93-98
    "A": {"delta_alpha": 0.004, "accuracy": 96.5},
    "D": {"delta_alpha": 0.009, "accuracy": 96.0},
    "E": {"delta_alpha": 0.015, "accuracy": 86.5},
}
SEEDS = [42, 123, 456, 789, 1024, 7, 2024, 31337, 555, 90210]
SCENARIOS = [ScenarioType.A_EXPRESSIVE_SIMPLE,
             ScenarioType.D_REDUCED_SIMPLE,
             ScenarioType.E_TINY_SIMPLE]


def main() -> None:
    out_root = Path(__file__).parent / "tenseed"
    store = out_root / "mlruns"
    results: dict[str, dict] = {}
    for st in SCENARIOS:
        cfg = SCENARIO_CONFIGS[st]
        accs, deltas = [], []
        for seed in SEEDS:
            r = run_scenario_experiment(
                cfg, seed, output_dir=store, histogram_artifacts=False,
            )
            if not r.success:
                print(f"FAILED {st.value} seed {seed}: {r.error_message}",
                      file=sys.stderr)
                continue
            hist = r.metrics_history
            epochs_sorted = sorted(hist)
            delta = (
                hist[epochs_sorted[-1]]["alpha_exponent_mean"]
                - hist[epochs_sorted[0]]["alpha_exponent_mean"]
            )
            accs.append(r.best_val_accuracy)
            deltas.append(delta)
            print(
                f"{st.value} seed {seed}: acc={r.best_val_accuracy:.2f}% "
                f"dA={delta:+.4f} ({r.training_time:.0f}s)",
                flush=True,
            )
        ref = REFERENCE[st.value]
        results[st.value] = {
            "accuracy_mean": float(np.mean(accs)) if accs else None,
            "accuracy_std": float(np.std(accs)) if accs else None,
            "delta_alpha_mean": float(np.mean(deltas)) if deltas else None,
            "delta_alpha_std": float(np.std(deltas)) if deltas else None,
            "acc_diff_vs_ref": (
                float(np.mean(accs) - ref["accuracy"]) if accs else None
            ),
            "dalpha_diff_vs_ref": (
                float(np.mean(deltas) - ref["delta_alpha"]) if deltas else None
            ),
            "seeds": SEEDS,
            "per_seed_acc": [float(a) for a in accs],
            "per_seed_dalpha": [float(d) for d in deltas],
        }
        # Write incrementally after EACH scenario: a tunnel outage hours in
        # must not discard the aggregates of scenarios already finished.
        out_root.mkdir(parents=True, exist_ok=True)
        with open(out_root / "summary.json", "w") as f:
            json.dump(results, f, indent=2, default=float)

    print("\n=== 10-seed summary (target: |acc diff| <= 1.0 pt, |dA| <= 0.02) ===")
    print(f"{'scn':3} {'acc':>7} {'ref':>6} {'diff':>6} {'sigma':>6}  "
          f"{'dA':>8} {'ref':>7} {'diff':>7}")
    for st in SCENARIOS:
        ref = REFERENCE[st.value]
        r = results[st.value]
        if r["accuracy_mean"] is None:
            continue
        print(
            f"{st.value:3} {r['accuracy_mean']:7.2f} {ref['accuracy']:6.1f} "
            f"{r['acc_diff_vs_ref']:+6.2f} {r['accuracy_std']:6.2f}  "
            f"{r['delta_alpha_mean']:+8.4f} {ref['delta_alpha']:+7.3f} "
            f"{r['dalpha_diff_vs_ref']:+7.4f}"
        )


if __name__ == "__main__":
    main()
