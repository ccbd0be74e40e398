"""Logging setup — one consistent configuration replacing the reference's mix
of logging.basicConfig and bare print (SURVEY.md §5 "Metrics / logging")."""

from __future__ import annotations

import logging

_FORMAT = "%(asctime)s %(levelname)s:%(name)s:%(message)s"
_CONFIGURED = False


def setup_logging(level: int = logging.INFO) -> None:
    global _CONFIGURED
    if not _CONFIGURED:
        logging.basicConfig(level=level, format=_FORMAT)
        _CONFIGURED = True


def get_logger(name: str = "options_model_tpu") -> logging.Logger:
    setup_logging()
    return logging.getLogger(name)
