"""Run ALL six scenarios (3 seeds each) on the TPU, log to results/mlruns.

A/D/E use real (procedurally generated) synthetic-shapes data; B/C/F use
PathMNIST, which falls back to the tagged deterministic surrogate when
pathmnist.npz is absent (runs carry the data=surrogate tag and are excluded
from default figures). Augmentation: torchvision-faithful (the adopted
default after the 10-seed A/B in results/aug_ab).
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
ORDER = [ScenarioType.E_TINY_SIMPLE, ScenarioType.D_REDUCED_SIMPLE,
         ScenarioType.A_EXPRESSIVE_SIMPLE, ScenarioType.F_TINY_COMPLEX,
         ScenarioType.C_REDUCED_COMPLEX, ScenarioType.B_EXPRESSIVE_COMPLEX]
for st in ORDER:
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
