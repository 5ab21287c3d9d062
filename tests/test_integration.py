"""End-to-end integration: scenario run → tracking replay → figures."""

from pathlib import Path

import numpy as np
import pytest

from vision_spectra_tpu.experiments.run_spectral_analysis import (
    SCENARIO_CONFIGS,
    ScenarioConfig,
    ScenarioType,
    run_scenario_experiment,
)


@pytest.fixture(scope="module")
def scenario_store(tmp_path_factory):
    """One tiny scenario-E run recorded to a fresh tracking store."""
    out = tmp_path_factory.mktemp("mlruns")
    base = SCENARIO_CONFIGS[ScenarioType.E_TINY_SIMPLE]
    cfg = ScenarioConfig(
        **{
            **base.__dict__,
            "epochs": 2,
            "log_epochs": [0, 2],
            "num_samples": 64,
            "batch_size": 16,
        }
    )
    result = run_scenario_experiment(
        cfg, seed=42, output_dir=out, histogram_artifacts=False
    )
    return out, result


class TestScenarioPipeline:
    def test_run_succeeds(self, scenario_store):
        _, result = scenario_store
        assert result.success, result.error_message
        assert 0 in result.metrics_history and 2 in result.metrics_history
        assert np.isfinite(result.metrics_history[0]["alpha_exponent_mean"])

    def test_metrics_replay(self, scenario_store):
        from vision_spectra_tpu.analysis.publication_figures import (
            extract_scenario_metrics,
        )

        out, result = scenario_store
        m = extract_scenario_metrics("E", out)
        assert m is not None
        assert m.num_runs == 1
        # replayed delta matches the in-run history
        expected = (
            result.metrics_history[2]["alpha_exponent_mean"]
            - result.metrics_history[0]["alpha_exponent_mean"]
        )
        assert m.delta_alpha_mean == pytest.approx(expected, abs=1e-6)
        assert m.accuracy_mean == pytest.approx(result.best_val_accuracy, abs=1e-6)

    def test_figures_generate(self, scenario_store, tmp_path):
        from vision_spectra_tpu.analysis.publication_figures import (
            build_summary,
            extract_all_scenarios,
            generate_delta_alpha_bar,
            generate_results_table,
        )

        out, _ = scenario_store
        metrics = extract_all_scenarios(out)
        assert "E" in metrics
        paths = generate_delta_alpha_bar(metrics, tmp_path)
        assert all(Path(p).exists() for p in paths)
        paths = generate_results_table(metrics, tmp_path)
        assert all(Path(p).exists() for p in paths)
        summary = build_summary(metrics)
        assert "E" in summary and np.isfinite(summary["E"]["delta_alpha_mean"])

    def test_spectral_artifacts_layout(self, scenario_store):
        """spectral/epoch_N JSON artifacts exist with the reference layout."""
        out, _ = scenario_store
        svs = list(Path(out).rglob("spectral/epoch_0/singular_values.json"))
        metrics = list(Path(out).rglob("spectral/epoch_0/layer_metrics.json"))
        assert svs and metrics
        import json

        layers = json.load(open(metrics[0]))
        assert any(".attn.qkv.q" in k for k in layers)
        some_layer = next(iter(layers.values()))
        assert set(some_layer) == {
            "spectral_entropy", "stable_rank", "alpha_exponent", "pl_alpha_hill",
        }
