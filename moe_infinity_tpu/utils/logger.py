"""Structured logging for the engine.

The reference builds its logging on a vendored muduo `base::Logger`
(/root/reference/core/utils/logger.h); we use stdlib logging with one shared
engine logger plus rate-limited helpers for hot paths.
"""

from __future__ import annotations

import logging
import os
import sys
import time
from typing import Dict

_FMT = "%(asctime)s.%(msecs)03d %(levelname).1s %(name)s %(message)s"
_DATEFMT = "%H:%M:%S"

_configured = False


def init_logging(level: str | int | None = None) -> None:
    global _configured
    if _configured:
        return
    lvl = level or os.environ.get("MOE_TPU_LOG_LEVEL", "INFO")
    handler = logging.StreamHandler(sys.stderr)
    handler.setFormatter(logging.Formatter(_FMT, _DATEFMT))
    root = logging.getLogger("moe_tpu")
    root.addHandler(handler)
    root.setLevel(lvl)
    root.propagate = False
    _configured = True


def get_logger(name: str = "") -> logging.Logger:
    init_logging()
    return logging.getLogger(f"moe_tpu.{name}" if name else "moe_tpu")


class RateLimited:
    """Emit at most one log record per `interval_s` per call-site key."""

    def __init__(self, logger: logging.Logger, interval_s: float = 5.0):
        self._logger = logger
        self._interval = interval_s
        self._last: Dict[str, float] = {}

    def warning(self, key: str, msg: str, *args) -> None:
        now = time.monotonic()
        if now - self._last.get(key, 0.0) >= self._interval:
            self._last[key] = now
            self._logger.warning(msg, *args)
