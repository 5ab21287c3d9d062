"""Reproducibility helpers (API parity with reference utils/reproducibility.py:16-73).

``set_seed`` is re-exported from config (single source of truth — the
reference duplicates it, documented quirk in SURVEY.md §7).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np

from vision_spectra_tpu.config import root_key, set_seed  # noqa: F401

__all__ = ["set_seed", "root_key", "get_device", "count_parameters"]


def get_device(device: str = "auto"):
    """Resolve the primary JAX device (reference resolves a torch.device)."""
    if device == "auto":
        return jax.devices()[0]
    devs = jax.devices(device)
    if not devs:
        raise ValueError(f"no devices for platform {device!r}")
    return devs[0]


def count_parameters(params: Any) -> int:
    """Total number of parameters in a pytree (reference counts module params)."""
    return sum(int(np.prod(np.shape(p))) for p in jax.tree.leaves(params))
