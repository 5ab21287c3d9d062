"""Run PathMNIST scenarios F, C, B (3 seeds each; surrogate when npz absent).

Surrogate runs are tagged data=surrogate and excluded from default figures.
"""
import time
from pathlib import Path

from vision_spectra_tpu.core.runtime import enable_compilation_cache

enable_compilation_cache()

from vision_spectra_tpu.experiments.run_spectral_analysis import (  # noqa: E402
    ScenarioType,
    run_scenario,
)

out = Path("/root/repo/results/mlruns")
t0 = time.time()
for st in [ScenarioType.F_TINY_COMPLEX, ScenarioType.C_REDUCED_COMPLEX,
           ScenarioType.B_EXPRESSIVE_COMPLEX]:
    print(f"=== {st.value} start t={time.time()-t0:.0f}s ===", flush=True)
    results = run_scenario(st, output_dir=out, histogram_artifacts=False)
    for r in results:
        print(
            f"{st.value} seed {r.seed}: ok={r.success} "
            f"acc={r.best_val_accuracy:.2f}% "
            f"alpha_final={r.final_metrics.get('alpha_exponent_mean', float('nan')):.4f} "
            f"time={r.training_time:.0f}s",
            flush=True,
        )
print("ALL DONE", round(time.time() - t0), flush=True)
