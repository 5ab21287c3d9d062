"""Experiment sweep drivers."""

from vision_spectra_tpu.experiments.run_spectral_analysis import (
    SCENARIO_CONFIGS,
    ScenarioConfig,
    ScenarioResult,
    ScenarioType,
    run_scenario,
    run_scenario_experiment,
)

__all__ = [
    "SCENARIO_CONFIGS",
    "ScenarioConfig",
    "ScenarioResult",
    "ScenarioType",
    "run_scenario",
    "run_scenario_experiment",
]
