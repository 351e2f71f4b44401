"""Logger singleton: level-colored console logging with stage contexts.

Parity with the reference's rich-based logger (cpmcu/common/logging.py:16-145):
level coloring, ``stage()`` context headers, plain mode for non-TTY/CI, and
capture of external loggers (uvicorn) into the same stream.
"""

from __future__ import annotations

import contextlib
import logging as _pylogging
import os
import sys
import time
from typing import Optional

_COLORS = {
    "DEBUG": "\033[2m",
    "INFO": "\033[36m",
    "SUCCESS": "\033[32m",
    "WARNING": "\033[33m",
    "ERROR": "\033[31m",
}
_RESET = "\033[0m"
_LEVELS = {"DEBUG": 10, "INFO": 20, "SUCCESS": 25, "WARNING": 30, "ERROR": 40}


class Logger:
    _instance: Optional["Logger"] = None

    def __init__(self, plain: Optional[bool] = None, level: str = "INFO"):
        if plain is None:
            plain = not sys.stderr.isatty() or bool(os.environ.get("CPMCU_PLAIN"))
        self.plain = plain
        self.level = _LEVELS.get(level.upper(), 20)
        self._stage: Optional[str] = None

    @classmethod
    def get(cls) -> "Logger":
        if cls._instance is None:
            cls._instance = Logger()
        return cls._instance

    def _emit(self, level: str, msg: str):
        if _LEVELS[level] < self.level:
            return
        ts = time.strftime("%H:%M:%S")
        prefix = f"[{ts}] {level:<7}"
        if not self.plain:
            prefix = f"{_COLORS.get(level, '')}{prefix}{_RESET}"
        if self._stage:
            msg = f"[{self._stage}] {msg}"
        print(f"{prefix} {msg}", file=sys.stderr, flush=True)

    def debug(self, msg):
        self._emit("DEBUG", str(msg))

    def info(self, msg):
        self._emit("INFO", str(msg))

    def success(self, msg):
        self._emit("SUCCESS", str(msg))

    def warning(self, msg):
        self._emit("WARNING", str(msg))

    def error(self, msg):
        self._emit("ERROR", str(msg))

    @contextlib.contextmanager
    def stage(self, name: str):
        """Stage context: messages inside are tagged, timing logged on exit
        (the reference's stage headers, logging.py:97-120)."""
        prev, self._stage = self._stage, name
        t0 = time.time()
        self.info("start")
        try:
            yield
            self.success(f"done in {time.time() - t0:.2f}s")
        except Exception as e:
            self.error(f"failed after {time.time() - t0:.2f}s: {e}")
            raise
        finally:
            self._stage = prev

    def capture_external(self, *names: str):
        """Route stdlib loggers (e.g. uvicorn) through this logger
        (logging.py:122-145)."""
        logger = self

        class _Handler(_pylogging.Handler):
            def emit(self, record):
                fn = {
                    "DEBUG": logger.debug, "INFO": logger.info,
                    "WARNING": logger.warning, "ERROR": logger.error,
                    "CRITICAL": logger.error,
                }.get(record.levelname, logger.info)
                fn(record.getMessage())

        for name in names:
            ext = _pylogging.getLogger(name)
            ext.handlers = [_Handler()]
            ext.propagate = False


logger = Logger.get()
