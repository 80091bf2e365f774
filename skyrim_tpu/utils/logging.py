"""Structured logging for skyrim_tpu.

The reference uses loguru everywhere with level semantics
(debug=internals, info=progress, success=milestones, warning/error);
see reference skyrim/core/utils.py and SURVEY.md §5.  loguru is not in
this environment, so this module provides the same surface (including
``logger.success``) on top of stdlib logging, plus ``logger.disable`` /
``logger.enable`` niceties used by the reference notebooks.
"""

from __future__ import annotations

import logging
import os
import sys

SUCCESS = 25  # between INFO (20) and WARNING (30), mirroring loguru
logging.addLevelName(SUCCESS, "SUCCESS")

_COLORS = {
    "DEBUG": "\x1b[36m",
    "INFO": "\x1b[37m",
    "SUCCESS": "\x1b[32m",
    "WARNING": "\x1b[33m",
    "ERROR": "\x1b[31m",
    "CRITICAL": "\x1b[41m",
}
_RESET = "\x1b[0m"


class _Formatter(logging.Formatter):
    def __init__(self, color: bool):
        super().__init__()
        self.color = color

    def format(self, record: logging.LogRecord) -> str:
        ts = self.formatTime(record, "%H:%M:%S")
        level = record.levelname
        msg = record.getMessage()
        if record.exc_info:
            msg += "\n" + self.formatException(record.exc_info)
        if self.color:
            c = _COLORS.get(level, "")
            return f"{ts} | {c}{level:<8}{_RESET} | {record.name}: {msg}"
        return f"{ts} | {level:<8} | {record.name}: {msg}"


class _Logger:
    """loguru-like facade over a stdlib logger hierarchy."""

    def __init__(self, name: str = "skyrim_tpu"):
        self._name = name
        self._logger = logging.getLogger(name)
        if not self._logger.handlers:
            handler = logging.StreamHandler(sys.stderr)
            handler.setFormatter(_Formatter(color=sys.stderr.isatty()))
            self._logger.addHandler(handler)
            self._logger.setLevel(os.environ.get("SKYRIM_LOG_LEVEL", "INFO"))
            self._logger.propagate = False

    def bind(self, name: str) -> "_Logger":
        child = _Logger.__new__(_Logger)
        child._name = name
        child._logger = logging.getLogger(name)
        return child

    def debug(self, msg, *a):
        self._logger.debug(msg, *a)

    def info(self, msg, *a):
        self._logger.info(msg, *a)

    def success(self, msg, *a):
        self._logger.log(SUCCESS, msg, *a)

    def warning(self, msg, *a):
        self._logger.warning(msg, *a)

    def error(self, msg, *a):
        self._logger.error(msg, *a)

    def exception(self, msg, *a):
        self._logger.exception(msg, *a)

    def set_level(self, level: str | int):
        self._logger.setLevel(level)

    def disable(self):
        self._logger.disabled = True

    def enable(self):
        self._logger.disabled = False


logger = _Logger()
