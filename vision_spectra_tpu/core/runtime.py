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

__all__ = ["enable_compilation_cache", "trace"]

_DEFAULT_CACHE = Path.home() / ".cache" / "vision_spectra_tpu" / "jax_cache"


def enable_compilation_cache(cache_dir: Path | str | None = None) -> None:
    """Turn on JAX's persistent compilation cache (idempotent).

    Disable with ``VISION_SPECTRA_NO_COMPILATION_CACHE=1``.
    """
    if os.environ.get("VISION_SPECTRA_NO_COMPILATION_CACHE") == "1":
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
