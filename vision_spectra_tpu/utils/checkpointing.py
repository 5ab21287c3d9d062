"""Checkpoint save/load for train-state pytrees.

Reference behavior: vision_spectra/utils/checkpointing.py:15-136 and the
trainer-inline mechanism (training/base.py:576-608). A checkpoint is a single
msgpack file containing the full train state (params + optimizer state +
step), epoch, best metric, metrics, and the experiment config as JSON — so a
checkpoint is self-describing (eval reads the model architecture out of the
stored config, reference: cli.py:477-507).

Serialization uses ``flax.serialization`` (msgpack), which round-trips
arbitrary pytrees of arrays without pickling.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

import flax.serialization

from vision_spectra_tpu.utils.logging import logger
from vision_spectra_tpu.utils.transfer import fetch_pytree as _to_host

CHECKPOINT_SUFFIX = ".msgpack"


def save_checkpoint(
    path: Path | str,
    state: Any,
    epoch: int,
    metrics: dict[str, float] | None = None,
    config: Any = None,
    best_val_metric: float | None = None,
) -> Path:
    """Serialize a checkpoint. ``config`` may be an ExperimentConfig or dict."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    if config is not None and hasattr(config, "model_dump"):
        config = config.model_dump(mode="json")
    payload = {
        "epoch": int(epoch),
        "best_val_metric": float(best_val_metric)
        if best_val_metric is not None
        else None,
        "metrics": {k: float(v) for k, v in (metrics or {}).items()},
        "config_json": json.dumps(config, default=str) if config is not None else None,
        "state": flax.serialization.to_state_dict(_to_host(state)),
    }
    path.write_bytes(flax.serialization.msgpack_serialize(payload))
    logger.info("Saved checkpoint to %s (epoch %d)", path, epoch)
    return path


def load_checkpoint(path: Path | str, state_template: Any = None) -> dict[str, Any]:
    """Load a checkpoint.

    Returns dict with keys epoch / best_val_metric / metrics / config (parsed)
    / state (restored onto ``state_template`` if given, else raw state dict).
    """
    path = Path(path)
    payload = flax.serialization.msgpack_restore(path.read_bytes())
    out: dict[str, Any] = {
        "epoch": int(payload.get("epoch", 0)),
        "best_val_metric": payload.get("best_val_metric"),
        "metrics": payload.get("metrics", {}),
        "config": json.loads(payload["config_json"])
        if payload.get("config_json")
        else None,
    }
    raw_state = payload.get("state", {})
    if state_template is not None:
        out["state"] = flax.serialization.from_state_dict(state_template, raw_state)
    else:
        out["state"] = raw_state
    return out


def get_best_checkpoint(checkpoint_dir: Path | str) -> Path | None:
    """Prefer ``best``, else the latest ``epoch_*`` checkpoint.

    Reference: utils/checkpointing.py:117-136.
    """
    checkpoint_dir = Path(checkpoint_dir)
    best = checkpoint_dir / f"best{CHECKPOINT_SUFFIX}"
    if best.exists():
        return best
    epochs = sorted(checkpoint_dir.glob(f"epoch_*{CHECKPOINT_SUFFIX}"))
    return epochs[-1] if epochs else None
