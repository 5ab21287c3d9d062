"""Experiment tracking with an mlflow-compatible fluent API.

Drop-in replacement for the subset of ``mlflow`` the reference framework
uses (set_tracking_uri / set_experiment / start_run / log_params /
log_metric(s) / log_artifact(s) / search_runs / MlflowClient.get_metric_history
— reference: training/base.py:209-275, analysis/publication_figures.py:160-265),
backed by :class:`vision_spectra_tpu.tracking.store.FileStore` writing
MLflow's on-disk file-store layout.

Usage mirrors mlflow::

    from vision_spectra_tpu import tracking as mlflow
    mlflow.set_tracking_uri(output_dir)
    mlflow.set_experiment("my_exp")
    with mlflow.start_run(run_name="seed_42"):
        mlflow.log_params({...})
        mlflow.log_metric("val/loss", 0.3, step=epoch)
"""

from __future__ import annotations

import json
import shutil
from contextlib import contextmanager
from pathlib import Path
from typing import Any, Iterator

import numpy as np

from vision_spectra_tpu.tracking.store import (
    Experiment,
    FileStore,
    Metric,
    Run,
    RunInfo,
)

__all__ = [
    "Experiment",
    "FileStore",
    "Metric",
    "MlflowClient",
    "Run",
    "RunInfo",
    "active_run",
    "end_run",
    "get_tracking_uri",
    "log_artifact",
    "log_artifacts",
    "log_dict",
    "log_figure",
    "log_metric",
    "log_metrics",
    "log_param",
    "log_params",
    "search_runs",
    "set_experiment",
    "set_tag",
    "set_tracking_uri",
    "start_run",
]

_state: dict[str, Any] = {
    "uri": Path("mlruns"),
    "store": None,
    "experiment": None,
    "run": None,
}


def _normalize_uri(uri) -> Path:
    s = str(uri)
    if s.startswith("file://"):
        s = s[len("file://"):]
    return Path(s)


def set_tracking_uri(uri) -> None:
    _state["uri"] = _normalize_uri(uri)
    _state["store"] = None
    _state["experiment"] = None


def get_tracking_uri() -> str:
    return str(_state["uri"])


def _store() -> FileStore:
    if _state["store"] is None or _state["store"].root != _normalize_uri(_state["uri"]):
        _state["store"] = FileStore(_state["uri"])
    return _state["store"]


def set_experiment(name: str) -> Experiment:
    exp = _store().create_experiment(name)
    _state["experiment"] = exp
    return exp


def active_run() -> RunInfo | None:
    return _state["run"]


@contextmanager
def start_run(run_name: str | None = None) -> Iterator[RunInfo]:
    if _state["experiment"] is None:
        set_experiment("Default")
    info = _store().create_run(_state["experiment"].experiment_id, run_name)
    _state["run"] = info
    try:
        yield info
    except Exception:
        _store().end_run(info, "FAILED")
        _state["run"] = None
        raise
    else:
        if _state["run"] is not None:  # not ended explicitly
            _store().end_run(info, "FINISHED")
        _state["run"] = None


def end_run(status: str = "FINISHED") -> None:
    if _state["run"] is not None:
        _store().end_run(_state["run"], status)
        _state["run"] = None


def _require_run() -> RunInfo:
    if _state["run"] is None:
        raise RuntimeError("No active run. Use tracking.start_run().")
    return _state["run"]


def log_param(key: str, value: Any) -> None:
    _store().log_param(_require_run(), key, value)


def log_params(params: dict[str, Any]) -> None:
    info = _require_run()
    for k, v in params.items():
        _store().log_param(info, k, v)


def set_tag(key: str, value: Any) -> None:
    _store().set_tag(_require_run(), key, value)


def log_metric(key: str, value: float, step: int = 0) -> None:
    _store().log_metric(_require_run(), key, value, step)


def log_metrics(metrics: dict[str, float], step: int = 0) -> None:
    info = _require_run()
    for k, v in metrics.items():
        if v is None or (isinstance(v, float) and not np.isfinite(v)):
            continue
        _store().log_metric(info, k, float(v), step)


def log_artifact(local_path, artifact_path: str | None = None) -> None:
    info = _require_run()
    dst = _store().artifact_dir(info, artifact_path)
    local_path = Path(local_path)
    if local_path.is_dir():
        shutil.copytree(local_path, dst / local_path.name, dirs_exist_ok=True)
    else:
        shutil.copy2(local_path, dst / local_path.name)


def delete_artifact(artifact_file: str) -> None:
    """Delete one artifact file from the active run (no-op if absent).

    ``artifact_file`` is the run-relative artifact path, e.g.
    ``checkpoints/epoch_0010.msgpack``. The public counterpart of
    :func:`log_artifact` — used by checkpoint retention (``keep_top_k``).
    """
    info = _require_run()
    rel = Path(artifact_file)
    base = _store().artifact_dir(info)
    target = (base / rel).resolve()
    if base.resolve() not in target.parents:
        raise ValueError(f"artifact path escapes the run: {artifact_file!r}")
    target.unlink(missing_ok=True)


def log_artifacts(local_dir, artifact_path: str | None = None) -> None:
    info = _require_run()
    dst = _store().artifact_dir(info, artifact_path)
    shutil.copytree(local_dir, dst, dirs_exist_ok=True)


def log_dict(d: dict, artifact_file: str) -> None:
    info = _require_run()
    rel = Path(artifact_file)
    dst = _store().artifact_dir(info, str(rel.parent) if rel.parent != Path(".") else None)
    with open(dst / rel.name, "w") as f:
        json.dump(d, f, indent=2, default=float)


def log_figure(fig, artifact_file: str) -> None:
    info = _require_run()
    rel = Path(artifact_file)
    dst = _store().artifact_dir(info, str(rel.parent) if rel.parent != Path(".") else None)
    fig.savefig(dst / rel.name, dpi=150, bbox_inches="tight")


def search_runs(
    experiment_names: list[str] | None = None,
    filter_string: str = "",
    output_format: str = "pandas",
):
    """Search runs across experiments; returns a pandas DataFrame.

    Supports the filter subset the reference uses:
    ``attributes.status = 'FINISHED'``.
    """
    import pandas as pd

    store = _store()
    exps = store.list_experiments()
    if experiment_names is not None:
        exps = [e for e in exps if e.name in experiment_names]
    rows = []
    for exp in exps:
        for run in store.list_runs(exp.experiment_id):
            if "status = 'FINISHED'" in filter_string and run.info.status != "FINISHED":
                continue
            row = {
                "run_id": run.info.run_id,
                "experiment_id": exp.experiment_id,
                "status": run.info.status,
                "start_time": run.info.start_time,
                "end_time": run.info.end_time,
                "tags.mlflow.runName": run.info.run_name,
            }
            for k, v in run.metrics.items():
                row[f"metrics.{k}"] = v
            for k, v in run.params.items():
                row[f"params.{k}"] = v
            rows.append(row)
    return pd.DataFrame(rows)


class MlflowClient:
    """Client API subset (get_metric_history etc.)."""

    def __init__(self, tracking_uri=None) -> None:
        self._store = FileStore(_normalize_uri(tracking_uri or _state["uri"]))

    def get_experiment_by_name(self, name: str) -> Experiment | None:
        return self._store.get_experiment_by_name(name)

    def get_run(self, run_id: str) -> Run | None:
        return self._store.get_run(run_id)

    def get_metric_history(self, run_id: str, key: str) -> list[Metric]:
        return self._store.get_metric_history(run_id, key)

    def list_experiments(self) -> list[Experiment]:
        return self._store.list_experiments()

    def search_runs(self, experiment_ids: list[str]) -> list[Run]:
        out = []
        for eid in experiment_ids:
            out.extend(self._store.list_runs(eid))
        return out

    def delete_run(self, run_id: str) -> None:
        """Soft-delete a run (``lifecycle_stage: deleted``); search/list
        stop returning it, matching mlflow's ACTIVE_ONLY default."""
        self._store.delete_run(run_id)
