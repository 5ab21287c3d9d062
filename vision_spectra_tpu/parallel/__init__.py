"""Device mesh and sharding rules (dp × tp).

Trainers consume these through BaseTrainer (training/base.py) and the
fused-epoch scan (training/fused.py); there is no separate pjit step builder
in the package (the test-only one lives in tests/helpers_sharded.py).
"""

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

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "batch_sharding",
    "make_mesh",
    "param_shardings",
    "replicated",
    "shard_state",
    "state_shardings",
]
