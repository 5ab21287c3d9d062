"""File-backed experiment tracking store, MLflow-file-store compatible.

The reference logs everything through the ``mlflow`` package to a local file
store (reference: vision_spectra/training/base.py:209-215,
analysis/publication_figures.py:160-265). mlflow is not available in this
environment, so this module implements the tracking subsystem from scratch
using MLflow's documented on-disk layout — a real mlflow client pointed at
the same directory can read these runs, and vice versa:

    <root>/
      <experiment_id>/
        meta.yaml                      # experiment metadata
        <run_id>/
          meta.yaml                    # run metadata (status, times, name)
          metrics/<key>                # lines: "<ts_ms> <value> <step>"
          params/<key>                 # single-line value
          tags/<key>
          artifacts/...

Metric keys may contain ``/`` (e.g. ``spectral/alpha_exponent_mean``) and map
to nested directories, exactly as mlflow's FileStore does.
"""

from __future__ import annotations

import os
import time
import uuid
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Iterable

import yaml

__all__ = ["Metric", "RunInfo", "Experiment", "FileStore"]

_INVALID = set('<>:"|?*')

# mlflow's FileStore persists run status as the RunStatus proto enum int
# (mlflow/entities/run_status.py) and, on read, silently coerces anything
# that is not a valid enum back to RUNNING — a string status would therefore
# break ``search_runs(... status = 'FINISHED')`` under a real mlflow client.
# We write ints and read both forms (our pre-interop stores used strings).
_STATUS_TO_INT = {
    "RUNNING": 1,
    "SCHEDULED": 2,
    "FINISHED": 3,
    "FAILED": 4,
    "KILLED": 5,
}
_INT_TO_STATUS = {v: k for k, v in _STATUS_TO_INT.items()}


def _sanitize_key(key: str) -> str:
    """Keys become relative file paths; keep them safe."""
    if not key or key.startswith("/") or ".." in key:
        raise ValueError(f"invalid key: {key!r}")
    if any(ch in _INVALID for ch in key):
        raise ValueError(f"invalid characters in key: {key!r}")
    return key


@dataclass
class Metric:
    key: str
    value: float
    timestamp: int  # epoch millis
    step: int


@dataclass
class RunInfo:
    run_id: str
    experiment_id: str
    run_name: str
    status: str  # RUNNING | FINISHED | FAILED | KILLED
    start_time: int
    end_time: int | None = None
    artifact_uri: str = ""
    lifecycle_stage: str = "active"  # active | deleted (mlflow semantics)

    @property
    def run_uuid(self) -> str:  # mlflow compat
        return self.run_id


@dataclass
class Experiment:
    experiment_id: str
    name: str
    artifact_location: str
    lifecycle_stage: str = "active"


@dataclass
class Run:
    """A run record with its data bags (mlflow ``Run`` shape)."""

    info: RunInfo
    params: dict[str, str] = field(default_factory=dict)
    metrics: dict[str, float] = field(default_factory=dict)  # latest values
    tags: dict[str, str] = field(default_factory=dict)

    @property
    def data(self) -> "Run":  # mlflow compat: run.data.metrics / run.data.params
        return self


def _now_ms() -> int:
    return int(time.time() * 1000)


class FileStore:
    """Reads and writes the MLflow file-store layout."""

    def __init__(self, root: Path | str) -> None:
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    # -- experiments ---------------------------------------------------------

    def _experiment_dirs(self) -> Iterable[Path]:
        for p in sorted(self.root.iterdir()) if self.root.exists() else []:
            if p.is_dir() and (p / "meta.yaml").exists():
                yield p

    def list_experiments(self) -> list[Experiment]:
        out = []
        for p in self._experiment_dirs():
            meta = yaml.safe_load((p / "meta.yaml").read_text()) or {}
            out.append(
                Experiment(
                    experiment_id=str(meta.get("experiment_id", p.name)),
                    name=meta.get("name", p.name),
                    artifact_location=meta.get("artifact_location", str(p)),
                    lifecycle_stage=meta.get("lifecycle_stage", "active"),
                )
            )
        return out

    def get_experiment_by_name(self, name: str) -> Experiment | None:
        for exp in self.list_experiments():
            if exp.name == name:
                return exp
        return None

    def get_experiment(self, experiment_id: str) -> Experiment | None:
        p = self.root / experiment_id
        if not (p / "meta.yaml").exists():
            return None
        meta = yaml.safe_load((p / "meta.yaml").read_text()) or {}
        return Experiment(
            experiment_id=experiment_id,
            name=meta.get("name", experiment_id),
            artifact_location=meta.get("artifact_location", str(p)),
        )

    def create_experiment(self, name: str) -> Experiment:
        existing = self.get_experiment_by_name(name)
        if existing is not None:
            return existing
        ids = [int(p.name) for p in self._experiment_dirs() if p.name.isdigit()]
        exp_id = str(max(ids) + 1 if ids else 0)
        exp_dir = self.root / exp_id
        exp_dir.mkdir(parents=True, exist_ok=True)
        now = _now_ms()
        meta = {
            "artifact_location": exp_dir.resolve().as_uri(),
            "creation_time": now,
            "experiment_id": exp_id,
            "last_update_time": now,
            "lifecycle_stage": "active",
            "name": name,
        }
        (exp_dir / "meta.yaml").write_text(yaml.dump(meta))
        return Experiment(exp_id, name, meta["artifact_location"])

    # -- runs ----------------------------------------------------------------

    def _run_dir(self, experiment_id: str, run_id: str) -> Path:
        return self.root / experiment_id / run_id

    def create_run(self, experiment_id: str, run_name: str | None = None) -> RunInfo:
        run_id = uuid.uuid4().hex
        run_dir = self._run_dir(experiment_id, run_id)
        for sub in ("metrics", "params", "tags", "artifacts"):
            (run_dir / sub).mkdir(parents=True, exist_ok=True)
        info = RunInfo(
            run_id=run_id,
            experiment_id=experiment_id,
            run_name=run_name or f"run-{run_id[:8]}",
            status="RUNNING",
            start_time=_now_ms(),
            artifact_uri=(run_dir / "artifacts").resolve().as_uri(),
        )
        self._write_run_meta(info)
        if run_name:
            self.set_tag(info, "mlflow.runName", run_name)
        return info

    def _write_run_meta(self, info: RunInfo) -> None:
        run_dir = self._run_dir(info.experiment_id, info.run_id)
        # Field set and status encoding match what mlflow's FileStore writes
        # (RunInfo.from_dictionary filters unknown keys, so supersets are
        # safe; missing keys and string statuses are not — see _STATUS_TO_INT).
        meta = {
            "artifact_uri": info.artifact_uri,
            "end_time": info.end_time,
            "entry_point_name": "",
            "experiment_id": info.experiment_id,
            "lifecycle_stage": info.lifecycle_stage,
            "run_id": info.run_id,
            "run_name": info.run_name,
            "run_uuid": info.run_id,
            "source_name": "",
            "source_type": 4,  # mlflow SourceType.LOCAL
            "source_version": "",
            "start_time": info.start_time,
            "status": _STATUS_TO_INT.get(info.status, 1),
            "tags": [],
            "user_id": os.environ.get("USER", "unknown"),
        }
        (run_dir / "meta.yaml").write_text(yaml.dump(meta))

    def end_run(self, info: RunInfo, status: str = "FINISHED") -> None:
        info.status = status
        info.end_time = _now_ms()
        self._write_run_meta(info)

    def get_run(self, run_id: str) -> Run | None:
        for exp_dir in self._experiment_dirs():
            run_dir = exp_dir / run_id
            if (run_dir / "meta.yaml").exists():
                return self._load_run(run_dir)
        return None

    def _load_run(self, run_dir: Path) -> Run:
        meta = yaml.safe_load((run_dir / "meta.yaml").read_text()) or {}
        status = meta.get("status", "FINISHED")
        if isinstance(status, int):  # mlflow RunStatus enum encoding
            status = _INT_TO_STATUS.get(status, "RUNNING")
        info = RunInfo(
            run_id=meta.get("run_id", run_dir.name),
            experiment_id=str(meta.get("experiment_id", run_dir.parent.name)),
            run_name=meta.get("run_name", run_dir.name),
            status=status,
            start_time=meta.get("start_time", 0),
            end_time=meta.get("end_time"),
            artifact_uri=meta.get("artifact_uri", str(run_dir / "artifacts")),
            lifecycle_stage=meta.get("lifecycle_stage", "active"),
        )
        run = Run(info=info)
        params_dir = run_dir / "params"
        if params_dir.exists():
            for f in params_dir.rglob("*"):
                if f.is_file():
                    run.params[str(f.relative_to(params_dir))] = f.read_text().strip()
        tags_dir = run_dir / "tags"
        if tags_dir.exists():
            for f in tags_dir.rglob("*"):
                if f.is_file():
                    run.tags[str(f.relative_to(tags_dir))] = f.read_text().strip()
        metrics_dir = run_dir / "metrics"
        if metrics_dir.exists():
            for f in metrics_dir.rglob("*"):
                if f.is_file():
                    key = str(f.relative_to(metrics_dir))
                    hist = self._read_metric_file(f, key)
                    if hist:
                        run.metrics[key] = hist[-1].value
        return run

    def list_runs(
        self, experiment_id: str, include_deleted: bool = False
    ) -> list[Run]:
        """Runs of one experiment; soft-deleted runs are excluded unless
        asked for (mlflow's ACTIVE_ONLY search default)."""
        exp_dir = self.root / experiment_id
        runs = []
        if exp_dir.exists():
            for run_dir in sorted(exp_dir.iterdir()):
                if run_dir.is_dir() and (run_dir / "meta.yaml").exists():
                    run = self._load_run(run_dir)
                    if include_deleted or run.info.lifecycle_stage != "deleted":
                        runs.append(run)
        return runs

    def delete_run(self, run_id: str) -> None:
        """Soft-delete: set ``lifecycle_stage: deleted`` in the run's
        meta.yaml (what mlflow's FileStore does — the run directory and its
        metrics/artifacts stay on disk, and real mlflow clients reading the
        store see the same ACTIVE_ONLY filtering)."""
        for exp_dir in self._experiment_dirs():
            run_dir = exp_dir / run_id
            if (run_dir / "meta.yaml").exists():
                info = self._load_run(run_dir).info
                info.lifecycle_stage = "deleted"
                self._write_run_meta(info)
                return
        raise KeyError(f"run {run_id!r} not found")

    # -- data ----------------------------------------------------------------

    def log_param(self, info: RunInfo, key: str, value: Any) -> None:
        key = _sanitize_key(key)
        path = self._run_dir(info.experiment_id, info.run_id) / "params" / key
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(str(value))

    def set_tag(self, info: RunInfo, key: str, value: Any) -> None:
        key = _sanitize_key(key)
        path = self._run_dir(info.experiment_id, info.run_id) / "tags" / key
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(str(value))

    def log_metric(
        self, info: RunInfo, key: str, value: float, step: int = 0,
        timestamp: int | None = None,
    ) -> None:
        key = _sanitize_key(key)
        path = self._run_dir(info.experiment_id, info.run_id) / "metrics" / key
        path.parent.mkdir(parents=True, exist_ok=True)
        ts = timestamp if timestamp is not None else _now_ms()
        with open(path, "a") as f:
            f.write(f"{ts} {float(value)} {int(step)}\n")

    @staticmethod
    def _read_metric_file(path: Path, key: str) -> list[Metric]:
        out = []
        for line in path.read_text().splitlines():
            parts = line.split()
            if len(parts) >= 3:
                out.append(
                    Metric(
                        key=key,
                        value=float(parts[1]),
                        timestamp=int(parts[0]),
                        step=int(parts[2]),
                    )
                )
        return out

    def get_metric_history(self, run_id: str, key: str) -> list[Metric]:
        for exp_dir in self._experiment_dirs():
            f = exp_dir / run_id / "metrics" / key
            if f.exists():
                return self._read_metric_file(f, key)
        return []

    def artifact_dir(self, info: RunInfo, artifact_path: str | None = None) -> Path:
        base = self._run_dir(info.experiment_id, info.run_id) / "artifacts"
        if artifact_path:
            base = base / artifact_path
        base.mkdir(parents=True, exist_ok=True)
        return base
