"""Structured logging — the slam_log_reporter equivalent.

The reference logs through ReportInfo/Warn/Error/Text macros with ANSI color
codes (SURVEY.md §5 metrics/logging row; used at e.g.
nn_feature_point_detector.cpp:44-46, test_feature_point_detector.cpp:29).
This module provides the same four severities on top of Python logging, with
colors when the stream is a TTY, so library code and demos share one sink.
"""

from __future__ import annotations

import logging
import sys

_RESET = "\033[0m"
_COLORS = {
    logging.DEBUG: "\033[90m",
    logging.INFO: "\033[32m",
    logging.WARNING: "\033[33m",
    logging.ERROR: "\033[31m",
}


class _ColorFormatter(logging.Formatter):
    def __init__(self, use_color: bool):
        super().__init__("%(levelname).1s %(asctime)s %(name)s] %(message)s", "%H:%M:%S")
        self._use_color = use_color

    def format(self, record):
        msg = super().format(record)
        if self._use_color:
            color = _COLORS.get(record.levelno)
            if color:
                return f"{color}{msg}{_RESET}"
        return msg


_logger = logging.getLogger("feature_detector_tpu")
if not _logger.handlers:
    _handler = logging.StreamHandler(sys.stderr)
    _handler.setFormatter(_ColorFormatter(use_color=sys.stderr.isatty()))
    _logger.addHandler(_handler)
    _logger.setLevel(logging.INFO)
    _logger.propagate = False


def set_level(level) -> None:
    _logger.setLevel(level)


def report_debug(msg: str, *args) -> None:
    _logger.debug(msg, *args)


def report_info(msg: str, *args) -> None:
    """ReportInfo equivalent."""
    _logger.info(msg, *args)


def report_warn(msg: str, *args) -> None:
    """ReportWarn / ReportColorWarn equivalent."""
    _logger.warning(msg, *args)


def report_error(msg: str, *args) -> None:
    """ReportError equivalent."""
    _logger.error(msg, *args)


def report_text(msg: str, *args) -> None:
    """ReportText equivalent: raw text to stdout, no decoration."""
    print(msg % args if args else msg)
