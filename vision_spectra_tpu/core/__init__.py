"""Core runtime utilities."""

from vision_spectra_tpu.core.runtime import enable_compilation_cache, trace

__all__ = ["enable_compilation_cache", "trace"]
