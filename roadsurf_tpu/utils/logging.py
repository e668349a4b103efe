"""Leveled, colored logging matching the reference's loguru formatting.

The reference configures loguru with per-level colored sinks
(scripts/functions/fct_misc.py:16-26).  loguru is not a dependency here;
this module provides the same surface (``logger.info/success/warning/error``)
on top of the standard library, with identical line format::

    2026-01-01 12:00:00 - INFO - message
"""

from __future__ import annotations

import logging
import sys

SUCCESS = 25
logging.addLevelName(SUCCESS, "SUCCESS")

_COLORS = {
    "SUCCESS": "\x1b[32m",   # green
    "WARNING": "\x1b[33m",   # yellow
    "ERROR": "\x1b[31m",     # red
    "CRITICAL": "\x1b[31m",  # red
}
_RESET = "\x1b[0m"


class _Formatter(logging.Formatter):
    def __init__(self, color: bool):
        super().__init__(fmt="%(asctime)s - %(levelname)s - %(message)s",
                         datefmt="%Y-%m-%d %H:%M:%S")
        self._color = color

    def format(self, record: logging.LogRecord) -> str:
        line = super().format(record)
        if self._color and record.levelname in _COLORS:
            c = _COLORS[record.levelname]
            ts, _, rest = line.partition(" - ")
            lvl, _, msg = rest.partition(" - ")
            if record.levelname in ("ERROR", "CRITICAL"):
                return f"{ts} - {c}{lvl}{_RESET} - {c}{msg}{_RESET}"
            return f"{ts} - {c}{lvl}{_RESET} - {msg}"
        return line


class _Logger(logging.Logger):
    def success(self, msg, *args, **kwargs):
        if self.isEnabledFor(SUCCESS):
            self._log(SUCCESS, msg, args, **kwargs)


logging.setLoggerClass(_Logger)


def get_logger(name: str = "roadsurf") -> _Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(_Formatter(color=sys.stderr.isatty()))
        logger.addHandler(handler)
        logger.setLevel(logging.INFO)
        logger.propagate = False
    return logger  # type: ignore[return-value]


def format_logger(logger=None):
    """Reference-compatible alias (fct_misc.format_logger)."""
    return get_logger()


logger = get_logger()
