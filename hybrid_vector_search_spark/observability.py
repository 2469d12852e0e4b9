"""Logging + query observability for the engine.

The reference logs every pipeline it executes to a dated logfile
(reference utils/logger.py:11-53: per-name cached loggers, a shared
``LOG_DIR``/log-YYYY-MM-DD.log file handler plus a console handler, format
``%(asctime)s [%(levelname)s] %(message)s``) and calls it at each execution
point (reference backend/api.py:93,202,254,281 "Executing ... pipeline",
:288 "Aggregation failed"). This module reproduces that observable contract
and adds the two things a Spark engine should log that a pymongo client
can't: wall-time per query and the physical plan Catalyst actually chose.

One deliberate deviation, because this is a library not an app: the file
handler is attached only when ``LOG_DIR`` is set in the environment.
Unset, loggers are console-only — importing the engine never creates a
``logs/`` directory as a side effect. Set ``LOG_DIR`` to restore the
reference's file behavior byte-for-byte.

On a cluster these are *driver-side* logs (query shape, plan, wall time) —
per-task logs stay in the Spark executor logs / event log, where they
belong; nothing here adds per-row logging cost to the hot path.
"""

from __future__ import annotations

import contextlib
import io
import logging
import os
import time
from datetime import datetime
from typing import Iterator

_FORMAT = "%(asctime)s [%(levelname)s] %(message)s"
_cache: dict[str, logging.Logger] = {}
_file_handler: logging.Handler | None = None


class _DatedFileHandler(logging.FileHandler):
    """FileHandler writing to LOG_DIR/log-YYYY-MM-DD.log, rolling AT EMIT
    TIME when the date changes. Rolling inside emit (not inside get_logger)
    means cached loggers — e.g. a module-level api logger created at import
    — roll at midnight too, and the one shared instance is never closed out
    from under other loggers."""

    def __init__(self, log_dir: str):
        self._log_dir = log_dir
        self._date = f"{datetime.now():%Y-%m-%d}"
        os.makedirs(log_dir, exist_ok=True)
        super().__init__(self._path(), mode="a", encoding="utf-8")

    def _path(self) -> str:
        return os.path.join(self._log_dir, f"log-{self._date}.log")

    def emit(self, record: logging.LogRecord) -> None:
        today = f"{datetime.now():%Y-%m-%d}"
        if today != self._date:
            self._date = today
            self.close()
            self.baseFilename = os.path.abspath(self._path())
            self.stream = None  # FileHandler reopens lazily on next emit
        super().emit(record)


def _shared_file_handler() -> logging.Handler | None:
    """The one file handler every logger shares (the reference's scheme);
    None when LOG_DIR is unset (console-only). When LOG_DIR changes, the
    replacement handler is swapped onto every CACHED logger too — closing
    the old handler alone is not enough, because FileHandler.emit lazily
    reopens a closed stream, so loggers still holding it would silently keep
    appending to the old directory."""
    global _file_handler
    log_dir = os.environ.get("LOG_DIR")
    if not log_dir:
        if _file_handler is not None:
            _swap_cached(_file_handler, None)
            _file_handler.close()
            _file_handler = None
        return None
    if (
        _file_handler is not None
        and getattr(_file_handler, "_log_dir", None) == log_dir
    ):
        return _file_handler
    handler = _DatedFileHandler(log_dir)
    handler.setLevel(logging.INFO)
    handler.setFormatter(logging.Formatter(_FORMAT))
    if _file_handler is not None:
        _swap_cached(_file_handler, handler)
        _file_handler.close()
    _file_handler = handler
    return handler


def _swap_cached(old: logging.Handler, new: logging.Handler | None) -> None:
    """Replace ``old`` with ``new`` (or just detach, when None) on every
    cached logger."""
    for logger in _cache.values():
        if old in logger.handlers:
            logger.removeHandler(old)
            if new is not None:
                logger.addHandler(new)


def get_logger(name: str = "engine") -> logging.Logger:
    """Cached named logger: console always, dated file when LOG_DIR is set."""
    if name in _cache:
        return _cache[name]
    logger = logging.getLogger(f"hybrid_vector_search_spark.{name}")
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    fh = _shared_file_handler()
    if fh is not None:
        logger.addHandler(fh)
    sh = logging.StreamHandler()
    sh.setLevel(logging.INFO)
    sh.setFormatter(logging.Formatter(_FORMAT))
    logger.addHandler(sh)
    logger.propagate = False
    _cache[name] = logger
    return logger


def reset_loggers() -> None:
    """Drop cached loggers/handlers (tests; or after changing LOG_DIR)."""
    global _file_handler
    for logger in _cache.values():
        for h in list(logger.handlers):
            h.close()
            logger.removeHandler(h)
    _cache.clear()
    _file_handler = None


@contextlib.contextmanager
def timed(logger: logging.Logger, label: str) -> Iterator[None]:
    """Log wall seconds for a block; failures log the exception and re-raise
    (the reference's "Aggregation failed" path, backend/api.py:288)."""
    t0 = time.perf_counter()
    try:
        yield
    except Exception as exc:
        logger.exception("%s failed after %.3fs: %s", label, time.perf_counter() - t0, exc)
        raise
    logger.info("%s completed in %.3fs", label, time.perf_counter() - t0)


def plan_string(df, mode: str = "formatted") -> str:
    """The physical plan Catalyst chose, as a string. df.explain() only
    prints, so capture stdout — public API, no JVM internals."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue().strip()


def log_plan(logger: logging.Logger, df, label: str) -> None:
    """INFO-log the query's formatted physical plan. The Spark analogue of
    the reference logging its pipeline dict before running it: the pipeline
    IS the plan here, and the formatted form shows what a reviewer needs —
    scan pushdowns, join strategies, exchanges."""
    logger.info("%s plan:\n%s", label, plan_string(df))
