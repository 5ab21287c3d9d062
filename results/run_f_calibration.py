"""Scenario-F tint calibration (VERDICT r3 item 3, surrogate v4).

Runs scenario F (32d/1L, pathmnist surrogate, 1 seed) for one or more
``SURROGATE_TINT_AMP`` values and prints val accuracy + Δα per amp, into a
THROWAWAY tracking store so calibration runs never pollute results/mlruns
(the store behind the published BCF table and figures).

Target: F accuracy within ~2 pt of the reference's 56.8% while Δα stays
positive and large (ref +0.451). B must be re-checked at the chosen amp
(results/run_bcf.py full refresh does that).

Usage (TPU):
    PYTHONPATH=/root/repo:$PYTHONPATH python results/run_f_calibration.py [amp ...]
"""

import sys
import tempfile
from pathlib import Path

from vision_spectra_tpu.core.runtime import enable_compilation_cache

enable_compilation_cache()

import vision_spectra_tpu.data.medmnist as mm  # noqa: E402
from vision_spectra_tpu.experiments.run_spectral_analysis import (  # noqa: E402
    ScenarioType,
    run_scenario,
)


def run_f(amp: float) -> None:
    mm.SURROGATE_TINT_AMP = amp
    mm._SURROGATE_BANKS.clear()
    mm._SURROGATE_CACHE.clear()
    out = Path(tempfile.mkdtemp(prefix=f"vst_fcal_{amp}_"))
    results = run_scenario(
        ScenarioType.F_TINY_COMPLEX, num_seeds=1, output_dir=out,
        histogram_artifacts=False,
    )
    for r in results:
        epochs = sorted(r.metrics_history)
        a0 = r.metrics_history[epochs[0]].get("alpha_exponent_mean",
                                              float("nan"))
        a1 = r.metrics_history[epochs[-1]].get("alpha_exponent_mean",
                                               float("nan"))
        print(
            f"TINT={amp}: F seed {r.seed} ok={r.success} "
            f"best_val_acc={r.best_val_accuracy:.2f}% "
            f"delta_alpha={a1 - a0:+.4f} (a0={a0:.3f} a1={a1:.3f}) "
            f"time={r.training_time:.0f}s  [ref: 56.8% / +0.451]",
            flush=True,
        )


if __name__ == "__main__":
    amps = [float(a) for a in sys.argv[1:]] or [mm.SURROGATE_TINT_AMP]
    for amp in amps:
        run_f(amp)
