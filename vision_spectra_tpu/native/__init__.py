"""ctypes bindings for the native (C++) components.

The shared library is built on demand (``make -C vision_spectra_tpu/native``
or automatically on first use when a compiler is present). All entry points
degrade gracefully: :func:`available` is False when the library can't be
built/loaded and callers fall back to the Python paths.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

from vision_spectra_tpu.utils.logging import logger

__all__ = ["available", "generate_split_native", "rasterize_native", "mt19937_randint"]

_DIR = Path(__file__).resolve().parent
_LIB_PATH = _DIR / "librasterizer.so"
_lib: ctypes.CDLL | None = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", str(_DIR)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return _LIB_PATH.exists()
    except Exception as e:  # no compiler / make failure → Python fallback
        logger.debug("native rasterizer build failed: %s", e)
        return False


def _load() -> ctypes.CDLL | None:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists() and not _build():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError as e:
        logger.debug("native rasterizer load failed: %s", e)
        return None
    lib.vst_generate_split.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_uint32,
    ]
    lib.vst_rasterize.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int,
        ctypes.c_uint32,
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.vst_mt19937_randint.argtypes = [
        ctypes.c_uint32,
        ctypes.c_uint64,
        ctypes.c_uint64,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint64),
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def generate_split_native(
    num_samples: int,
    num_classes: int,
    image_size: int,
    num_channels: int,
    seed: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Render a whole split natively. Returns (images u8 NHWC, labels i32)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native rasterizer unavailable")
    images = np.empty(
        (num_samples, image_size, image_size, num_channels), dtype=np.uint8
    )
    labels = np.empty(num_samples, dtype=np.int32)
    lib.vst_generate_split(
        images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        num_samples,
        num_classes,
        image_size,
        num_channels,
        ctypes.c_uint32(seed),
    )
    return images, labels


def rasterize_native(
    label: int, seed: int, image_size: int, num_channels: int
) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native rasterizer unavailable")
    out = np.empty((image_size, image_size, num_channels), dtype=np.uint8)
    lib.vst_rasterize(
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        label,
        ctypes.c_uint32(seed),
        image_size,
        num_channels,
    )
    return out


def mt19937_randint(seed: int, low: int, high: int, count: int) -> np.ndarray:
    """Probe the C++ MT19937 bounded-draw stream (for numpy parity tests)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native rasterizer unavailable")
    out = np.empty(count, dtype=np.uint64)
    lib.vst_mt19937_randint(
        ctypes.c_uint32(seed),
        ctypes.c_uint64(low),
        ctypes.c_uint64(high),
        count,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
    )
    return out
