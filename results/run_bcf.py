"""Single-seed surrogate runs of PathMNIST scenarios B, C, F (pipeline proof)."""
import time
from pathlib import Path
from vision_spectra_tpu.core.runtime import enable_compilation_cache
enable_compilation_cache()
from vision_spectra_tpu.experiments.run_spectral_analysis import (
    SCENARIO_CONFIGS, ScenarioConfig, ScenarioType, run_scenario_experiment)

out = Path("/root/repo/results/mlruns")
t0 = time.time()
for st in [ScenarioType.F_TINY_COMPLEX, ScenarioType.C_REDUCED_COMPLEX, ScenarioType.B_EXPRESSIVE_COMPLEX]:
    cfg = SCENARIO_CONFIGS[st]
    print(f"=== {st.value} start t={time.time()-t0:.0f}s ===", flush=True)
    r = run_scenario_experiment(cfg, 42, out, histogram_artifacts=False)
    print(f"{st.value} seed 42: ok={r.success} acc={r.best_val_accuracy:.2f}% "
          f"alpha_final={r.final_metrics.get('alpha_exponent_mean', float('nan')):.4f} "
          f"time={r.training_time:.0f}s", flush=True)
print("ALL DONE", round(time.time()-t0), flush=True)
