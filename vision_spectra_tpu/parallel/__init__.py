"""Device mesh, sharding rules, and pjit train steps (dp × tp)."""

from vision_spectra_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    param_shardings,
    replicated,
    shard_state,
    state_shardings,
)
from vision_spectra_tpu.parallel.train import make_sharded_train_step

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "batch_sharding",
    "make_mesh",
    "make_sharded_train_step",
    "param_shardings",
    "replicated",
    "shard_state",
    "state_shardings",
]
