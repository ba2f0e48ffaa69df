"""Hierarchical logging for transformers_tpu.

TPU-native analog of the reference's ``utils/logging.py`` (reference:
src/transformers/utils/logging.py:1-441): a package-scoped logger tree with
env-var controlled verbosity and a ``warning_once`` helper.
"""

from __future__ import annotations

import functools
import logging
import os
import sys
import threading
from typing import Optional

_lock = threading.Lock()
_default_handler: Optional[logging.Handler] = None

log_levels = {
    "detail": logging.DEBUG,
    "debug": logging.DEBUG,
    "info": logging.INFO,
    "warning": logging.WARNING,
    "error": logging.ERROR,
    "critical": logging.CRITICAL,
}

_default_log_level = logging.WARNING

_ROOT_NAME = "transformers_tpu"


def _get_default_logging_level() -> int:
    env_level_str = os.getenv("TRANSFORMERS_TPU_VERBOSITY", None)
    if env_level_str:
        if env_level_str in log_levels:
            return log_levels[env_level_str]
        logging.getLogger().warning(
            f"Unknown TRANSFORMERS_TPU_VERBOSITY={env_level_str}, "
            f"has to be one of: {', '.join(log_levels.keys())}"
        )
    return _default_log_level


def _get_library_root_logger() -> logging.Logger:
    return logging.getLogger(_ROOT_NAME)


def _configure_library_root_logger() -> None:
    global _default_handler
    with _lock:
        if _default_handler:
            return
        _default_handler = logging.StreamHandler(sys.stderr)
        _default_handler.flush = sys.stderr.flush
        library_root_logger = _get_library_root_logger()
        library_root_logger.addHandler(_default_handler)
        library_root_logger.setLevel(_get_default_logging_level())
        library_root_logger.propagate = False


def get_logger(name: Optional[str] = None) -> logging.Logger:
    """Return a logger under the ``transformers_tpu`` tree."""
    if name is None:
        name = _ROOT_NAME
    _configure_library_root_logger()
    logger = logging.getLogger(name)
    if not hasattr(logger, "warning_once"):
        logger.warning_once = functools.partial(_warning_once, logger)  # type: ignore[attr-defined]
    return logger


def get_verbosity() -> int:
    _configure_library_root_logger()
    return _get_library_root_logger().getEffectiveLevel()


def set_verbosity(verbosity: int) -> None:
    _configure_library_root_logger()
    _get_library_root_logger().setLevel(verbosity)


def set_verbosity_info():
    set_verbosity(logging.INFO)


def set_verbosity_warning():
    set_verbosity(logging.WARNING)


def set_verbosity_debug():
    set_verbosity(logging.DEBUG)


def set_verbosity_error():
    set_verbosity(logging.ERROR)


@functools.lru_cache(None)
def _warning_once_cached(logger_name: str, msg: str) -> None:
    logging.getLogger(logger_name).warning(msg)


def _warning_once(logger: logging.Logger, msg: str, *args, **kwargs) -> None:
    _warning_once_cached(logger.name, msg % args if args else msg)
