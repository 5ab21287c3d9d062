"""Tracking store tests: fluent API + file-store layout + read-back."""

import numpy as np
import pytest

from vision_spectra_tpu import tracking


@pytest.fixture(autouse=True)
def _isolated_uri(tmp_path):
    tracking.set_tracking_uri(tmp_path / "mlruns")
    yield
    tracking._state["run"] = None


class TestFluent:
    def test_run_lifecycle(self, tmp_path):
        tracking.set_experiment("exp1")
        with tracking.start_run(run_name="r1") as info:
            assert info.status == "RUNNING"
            tracking.log_param("lr", 1e-4)
            tracking.log_params({"a.b": 1, "a.c": "x"})
            for step in range(3):
                tracking.log_metric("train/loss", 1.0 / (step + 1), step=step)
            tracking.log_metrics({"val/acc": 0.9, "skipme": float("nan")}, step=0)
        run = tracking.MlflowClient().get_run(info.run_id)
        assert run.info.status == "FINISHED"
        assert run.params["lr"] == "0.0001"
        assert run.params["a.b"] == "1"
        assert run.metrics["train/loss"] == pytest.approx(1 / 3)
        assert "skipme" not in run.metrics

    def test_failed_run_marked(self):
        tracking.set_experiment("exp1")
        with pytest.raises(RuntimeError):
            with tracking.start_run() as info:
                raise RuntimeError("boom")
        run = tracking.MlflowClient().get_run(info.run_id)
        assert run.info.status == "FAILED"

    def test_metric_history_order(self):
        tracking.set_experiment("exp2")
        with tracking.start_run() as info:
            for step in [0, 5, 10]:
                tracking.log_metric("spectral/alpha_exponent_mean", step * 0.1, step=step)
        hist = tracking.MlflowClient().get_metric_history(
            info.run_id, "spectral/alpha_exponent_mean"
        )
        assert [m.step for m in hist] == [0, 5, 10]
        assert hist[-1].value == pytest.approx(1.0)

    def test_artifacts(self, tmp_path):
        tracking.set_experiment("exp3")
        src = tmp_path / "plot.txt"
        src.write_text("hello")
        with tracking.start_run() as info:
            tracking.log_artifact(src, artifact_path="spectral/plots")
            tracking.log_dict({"x": 1}, "spectral/json/epoch_0000.json")
        store = tracking.FileStore(tracking.get_tracking_uri())
        art = store.artifact_dir(info)
        assert (art / "spectral/plots/plot.txt").read_text() == "hello"
        assert (art / "spectral/json/epoch_0000.json").exists()

    def test_delete_artifact(self, tmp_path):
        tracking.set_experiment("exp3b")
        src = tmp_path / "epoch_0001.msgpack"
        src.write_text("ckpt")
        with tracking.start_run() as info:
            tracking.log_artifact(src, artifact_path="checkpoints")
            store = tracking.FileStore(tracking.get_tracking_uri())
            art = store.artifact_dir(info)
            assert (art / "checkpoints/epoch_0001.msgpack").exists()
            tracking.delete_artifact("checkpoints/epoch_0001.msgpack")
            assert not (art / "checkpoints/epoch_0001.msgpack").exists()
            # no-op on a missing file
            tracking.delete_artifact("checkpoints/never_there.msgpack")
            # escaping the run's artifact dir is rejected
            with pytest.raises(ValueError):
                tracking.delete_artifact("../meta.yaml")

    def test_search_runs(self):
        tracking.set_experiment("scan")
        with tracking.start_run(run_name="seed_42"):
            tracking.log_metric("val/accuracy", 0.8, step=0)
            tracking.log_param("seed", 42)
        with tracking.start_run(run_name="seed_43"):
            tracking.log_metric("val/accuracy", 0.9, step=0)
        df = tracking.search_runs(experiment_names=["scan"])
        assert len(df) == 2
        assert set(df["metrics.val/accuracy"]) == {0.8, 0.9}
        df2 = tracking.search_runs(
            experiment_names=["scan"],
            filter_string="attributes.status = 'FINISHED'",
        )
        assert len(df2) == 2

    def test_delete_run_is_soft_and_filtered(self):
        """delete_run sets lifecycle_stage: deleted (mlflow FileStore
        semantics): search/list stop returning the run, the directory stays
        on disk, and include_deleted=True still sees it — the mechanism
        run_bcf.py uses to purge superseded surrogate generations before a
        refresh (a stale generation blending into refreshed means is the
        round-4 bug this guards against)."""
        exp = tracking.set_experiment("purge")
        with tracking.start_run(run_name="old") as info_old:
            tracking.log_metric("final/val_accuracy", 50.0, step=0)
        with tracking.start_run(run_name="new") as info_new:
            tracking.log_metric("final/val_accuracy", 57.0, step=0)
        client = tracking.MlflowClient()
        client.delete_run(info_old.run_id)

        runs = client.search_runs([exp.experiment_id])
        assert [r.info.run_id for r in runs] == [info_new.run_id]
        df = tracking.search_runs(experiment_names=["purge"])
        assert len(df) == 1

        store = tracking.FileStore(tracking.get_tracking_uri())
        all_runs = store.list_runs(exp.experiment_id, include_deleted=True)
        assert len(all_runs) == 2
        deleted = {r.info.run_id: r.info.lifecycle_stage for r in all_runs}
        assert deleted[info_old.run_id] == "deleted"
        assert deleted[info_new.run_id] == "active"
        with pytest.raises(KeyError):
            client.delete_run("no-such-run")

    def test_experiment_ids_increment(self):
        e0 = tracking.set_experiment("a")
        e1 = tracking.set_experiment("b")
        ea = tracking.set_experiment("a")
        assert e0.experiment_id != e1.experiment_id
        assert ea.experiment_id == e0.experiment_id


class TestStoreLayout:
    def test_mlflow_file_format(self, tmp_path):
        """Metric files use the 'ts value step' line format mlflow reads."""
        tracking.set_experiment("layout")
        with tracking.start_run() as info:
            tracking.log_metric("m", 0.5, step=7)
        store = tracking.FileStore(tracking.get_tracking_uri())
        exp = store.get_experiment_by_name("layout")
        f = store.root / exp.experiment_id / info.run_id / "metrics" / "m"
        parts = f.read_text().split()
        assert len(parts) == 3
        assert float(parts[1]) == 0.5
        assert int(parts[2]) == 7

    def test_invalid_keys_rejected(self):
        tracking.set_experiment("bad")
        with tracking.start_run():
            with pytest.raises(ValueError):
                tracking.log_param("../escape", 1)
            with pytest.raises(ValueError):
                tracking.log_metric("a|b", 1.0)


class TestSurrogateProvenance:
    """Surrogate-data runs are tagged and excluded from figures by default."""

    def _make_run(self, output_dir, provenance, acc, alphas):
        from vision_spectra_tpu import tracking

        tracking.set_tracking_uri(output_dir)
        tracking.set_experiment("spectral_scenario_B")
        with tracking.start_run(run_name=f"{provenance}_run"):
            tracking.set_tag("data", provenance)
            tracking.log_param("data_provenance", provenance)
            tracking.log_metric("final/val_accuracy", acc)
            for step, a in alphas:
                tracking.log_metric("spectral/alpha_exponent_mean", a, step=step)

    def test_default_excludes_surrogate(self, tmp_path):
        from vision_spectra_tpu.analysis.publication_figures import (
            extract_scenario_metrics,
        )

        out = tmp_path / "mlruns"
        self._make_run(out, "real", 70.0, [(0, 0.40), (50, 0.52)])
        self._make_run(out, "surrogate", 100.0, [(0, 0.40), (50, 0.90)])

        m = extract_scenario_metrics("B", out)
        assert m is not None
        assert m.num_runs == 1
        assert not m.surrogate
        assert "(surrogate)" not in m.name
        assert m.accuracy_mean == pytest.approx(70.0)
        assert m.delta_alpha_mean == pytest.approx(0.12)

    def test_include_surrogate_marks_name(self, tmp_path):
        from vision_spectra_tpu.analysis.publication_figures import (
            extract_scenario_metrics,
        )

        out = tmp_path / "mlruns"
        self._make_run(out, "surrogate", 100.0, [(0, 0.40), (50, 0.90)])
        m = extract_scenario_metrics("B", out, include_surrogate=True)
        assert m is not None
        assert m.surrogate
        assert "(surrogate)" in m.name

    def test_only_surrogate_yields_none_by_default(self, tmp_path):
        from vision_spectra_tpu.analysis.publication_figures import (
            extract_scenario_metrics,
        )

        out = tmp_path / "mlruns"
        self._make_run(out, "surrogate", 100.0, [(0, 0.40), (50, 0.90)])
        assert extract_scenario_metrics("B", out) is None

    def test_trainer_tags_provenance(self, tmp_path):
        """BaseTrainer writes the data tag into the store."""
        from vision_spectra_tpu import tracking
        from vision_spectra_tpu.config import (
            DatasetConfig,
            DatasetName,
            ExperimentConfig,
            ModelConfig,
            SpectralConfig,
            TrainingConfig,
        )
        from vision_spectra_tpu.data import get_dataset
        from vision_spectra_tpu.losses import get_loss
        from vision_spectra_tpu.models import build_vit
        from vision_spectra_tpu.training import ClassificationTrainer

        cfg = ExperimentConfig(
            name="prov_test",
            dataset=DatasetConfig(
                name=DatasetName.SYNTHETIC, batch_size=8, num_classes=3,
                num_samples_train=16, num_samples_val=8, num_samples_test=8,
            ),
            model=ModelConfig(name="vit_tiny_patch4_28", embed_dim=32, depth=1,
                              drop_path_rate=0.0),
            training=TrainingConfig(epochs=1, smoke_test=True),
            spectral=SpectralConfig(enabled=False),
            output_dir=tmp_path / "mlruns",
            data_dir=tmp_path / "data",
        )
        ds = get_dataset(cfg.dataset, cfg.data_dir)
        info = ds.get_info()
        model, _ = build_vit(cfg.model.name, num_classes=info.num_classes,
                             num_channels=info.num_channels, image_size=28,
                             embed_dim=32, depth=1, drop_path_rate=0.0)
        trainer = ClassificationTrainer(cfg, model, ds, get_loss(cfg.loss))
        trainer.train()
        trainer.cleanup()

        client = tracking.MlflowClient(cfg.output_dir)
        exp = client.get_experiment_by_name("prov_test")
        runs = client.search_runs([exp.experiment_id])
        assert runs and runs[0].tags.get("data") == "real"
        assert runs[0].params.get("data_provenance") == "real"
