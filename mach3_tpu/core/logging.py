"""Logging, TPU-native equivalent of ``Manager/MaCh3Logger.h``.

The reference wraps spdlog with ``MACH3LOG_{TRACE..CRITICAL}`` macros and a
compile-time level (``cmake/Modules/Logger.cmake``). Here we use stdlib logging
with a process-wide level configurable via ``MACH3_LOG_LEVEL``.
"""
from __future__ import annotations

import logging
import os
import sys

_FORMAT = "[%(asctime)s] [%(name)s] [%(levelname)s] %(message)s"
_configured = False


def _configure() -> None:
    global _configured
    if _configured:
        return
    level = os.environ.get("MACH3_LOG_LEVEL", "INFO").upper()
    handler = logging.StreamHandler(sys.stderr)
    handler.setFormatter(logging.Formatter(_FORMAT, datefmt="%H:%M:%S"))
    root = logging.getLogger("mach3")
    root.setLevel(getattr(logging, level, logging.INFO))
    root.addHandler(handler)
    root.propagate = False
    _configured = True


def get_logger(name: str = "mach3") -> logging.Logger:
    _configure()
    if name != "mach3" and not name.startswith("mach3."):
        name = f"mach3.{name}"
    return logging.getLogger(name)
