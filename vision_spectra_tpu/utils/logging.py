"""Lightweight structured console/file logging.

The reference uses loguru (utils/logging.py:13); loguru is not available in
this environment, so this module provides a compatible-enough ``logger``
object (``logger.info/debug/warning/error/success``) on top of stdlib logging
with rich-style formatting, plus ``setup_logging`` for optional file sinks.
"""

from __future__ import annotations

import logging
import sys
from pathlib import Path

_FMT = "%(asctime)s | %(levelname)-8s | %(name)s:%(funcName)s:%(lineno)d - %(message)s"
_DATEFMT = "%Y-%m-%d %H:%M:%S"

# `SUCCESS` level between INFO and WARNING, loguru-style.
SUCCESS = 25
logging.addLevelName(SUCCESS, "SUCCESS")


class _Logger(logging.Logger):
    def success(self, msg, *args, **kwargs):  # noqa: D102
        if self.isEnabledFor(SUCCESS):
            self._log(SUCCESS, msg, args, **kwargs)


logging.setLoggerClass(_Logger)

logger: _Logger = logging.getLogger("vision_spectra_tpu")  # type: ignore[assignment]
logger.setLevel(logging.INFO)

if not logger.handlers:
    _console = logging.StreamHandler(sys.stderr)
    _console.setFormatter(logging.Formatter(_FMT, datefmt=_DATEFMT))
    logger.addHandler(_console)
    logger.propagate = False


def setup_logging(
    level: str = "INFO",
    log_file: Path | str | None = None,
) -> None:
    """Configure console level and an optional file sink.

    Mirrors the reference ``setup_logging`` (utils/logging.py:13-56) minus
    loguru's rotation (files are appended; callers manage rotation).
    """
    logger.setLevel(getattr(logging, level.upper(), logging.INFO))
    if log_file is not None:
        log_file = Path(log_file)
        log_file.parent.mkdir(parents=True, exist_ok=True)
        fh = logging.FileHandler(log_file)
        fh.setFormatter(logging.Formatter(_FMT, datefmt=_DATEFMT))
        logger.addHandler(fh)
