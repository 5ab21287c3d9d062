"""Run synthetic scenarios E, D, A with 3 seeds on the TPU, log to results/mlruns."""
import time
from pathlib import Path
from vision_spectra_tpu.core.runtime import enable_compilation_cache
enable_compilation_cache()
from vision_spectra_tpu.experiments.run_spectral_analysis import (
    ScenarioType, run_scenario)

out = Path("/root/repo/results/mlruns")
t0 = time.time()
for st in [ScenarioType.E_TINY_SIMPLE, ScenarioType.D_REDUCED_SIMPLE, ScenarioType.A_EXPRESSIVE_SIMPLE]:
    print(f"=== {st.value} start t={time.time()-t0:.0f}s ===", flush=True)
    results = run_scenario(st, output_dir=out, histogram_artifacts=False)
    for r in results:
        print(f"{st.value} seed {r.seed}: ok={r.success} acc={r.best_val_accuracy:.2f}% "
              f"alpha_final={r.final_metrics.get('alpha_exponent_mean', float('nan')):.4f} "
              f"time={r.training_time:.0f}s", flush=True)
print("ALL DONE", round(time.time()-t0), flush=True)
