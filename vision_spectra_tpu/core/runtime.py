"""Runtime configuration for TPU execution.

Centralizes process-level knobs every entry point (CLI, bench, experiment
drivers) applies before heavy work:

- **persistent compilation cache**: TPU compiles — especially SVD/eigh — can
  take minutes on remote-compile platforms; caching them on disk makes every
  run after the first start instantly.
- profiler helpers around ``jax.profiler`` for perf work.
"""

from __future__ import annotations

import contextlib
import os
from pathlib import Path

__all__ = ["apply_platform", "enable_compilation_cache", "env_flag", "trace"]


def env_flag(name: str) -> bool:
    """True iff the env var is set to a truthy value ('1'/'true'/'yes'/'on').

    Kill switches must not trigger on ``FLAG=0`` — a non-empty-but-falsy
    value means "explicitly off".
    """
    return os.environ.get(name, "").strip().lower() in {"1", "true", "yes", "on"}


def apply_platform(device: str | None = None) -> None:
    """Force the JAX platform in-process ('cpu' / 'tpu').

    Precedence: explicit ``device`` (a resolved ``ExperimentConfig.device``)
    > ``JAX_PLATFORMS`` env var > leave JAX's default. The in-process
    ``jax.config.update`` is required because environments whose
    sitecustomize imports jax at interpreter startup (e.g. remote-TPU
    attachments) resolve the platform before shell env vars are consulted.
    No-op if the backend is already initialized to something else.
    """
    import jax

    plat = device if device not in (None, "", "auto") else os.environ.get(
        "JAX_PLATFORMS"
    )
    if not plat or plat == "auto":
        return
    try:
        jax.config.update("jax_platforms", plat)
    except RuntimeError:
        # Backend already initialized; too late to switch. Be loud — on
        # single-tenant TPU attachments a silently-ignored 'cpu' means the
        # run grabs the TPU.
        import logging

        logging.getLogger(__name__).warning(
            "apply_platform(%r) ignored: JAX backend already initialized "
            "to %s", plat, jax.default_backend(),
        )

_DEFAULT_CACHE = Path.home() / ".cache" / "vision_spectra_tpu" / "jax_cache"


def enable_compilation_cache(cache_dir: Path | str | None = None) -> None:
    """Turn on JAX's persistent compilation cache (idempotent).

    Disable with ``VISION_SPECTRA_NO_COMPILATION_CACHE=1``.
    """
    if env_flag("VISION_SPECTRA_NO_COMPILATION_CACHE"):
        return
    import jax

    cache_dir = Path(cache_dir or _DEFAULT_CACHE)
    cache_dir.mkdir(parents=True, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # cache options unavailable on some builds — best effort
        pass


@contextlib.contextmanager
def trace(log_dir: Path | str):
    """``jax.profiler`` trace context for perf analysis."""
    import jax

    log_dir = Path(log_dir)
    log_dir.mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()
