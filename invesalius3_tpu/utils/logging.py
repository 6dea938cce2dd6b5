"""Structured logging + performance tracing.

Reference: invesalius/enhanced_logging.py (dictConfig with console /
rotating-file / in-memory ring handlers, per-component filtering, export)
and the ad-hoc ``[PERF]`` stage timers in the surface pipeline
(surface_process.py:186-408) + ``timing`` decorator (utils.py:392).

TPU additions: ``span`` timers block on device results so spans measure
compute (not async dispatch), and ``trace`` wraps jax.profiler for XLA
traces.
"""

from __future__ import annotations

import contextlib
import functools
import json
import logging
import logging.handlers
import time
from collections import deque
from pathlib import Path
from typing import Deque, Optional

LOGGER_NAME = "invesalius3_tpu"


class InMemoryHandler(logging.Handler):
    """Ring-buffer handler (reference enhanced_logging.py:177) so the GUI /
    API can show recent log lines without touching files."""

    def __init__(self, capacity: int = 2000):
        super().__init__()
        self.records: Deque[str] = deque(maxlen=capacity)
        # structured view for the log API / viewer panel (reference
        # LogViewerFrame filter-by-level + search, enhanced_logging.py:212)
        self.entries: Deque[dict] = deque(maxlen=capacity)

    def emit(self, record: logging.LogRecord) -> None:
        self.records.append(self.format(record))
        comp = record.name
        if comp.startswith(LOGGER_NAME):
            comp = comp[len(LOGGER_NAME):].lstrip(".") or "app"
        self.entries.append({
            "ts": record.created,
            "level": record.levelname,
            "levelno": record.levelno,
            "component": comp,
            "message": record.getMessage(),
        })

    def dump(self) -> list:
        return list(self.records)


_memory_handler: Optional[InMemoryHandler] = None


def setup_logging(level: int = logging.INFO, log_dir: Optional[Path] = None,
                  console: bool = True) -> logging.Logger:
    """Console + rotating-file + in-memory ring (reference dictConfig)."""
    global _memory_handler
    logger = logging.getLogger(LOGGER_NAME)
    logger.setLevel(level)
    logger.handlers.clear()
    fmt = logging.Formatter("%(asctime)s %(levelname)s %(name)s: %(message)s")
    if console:
        h = logging.StreamHandler()
        h.setFormatter(fmt)
        logger.addHandler(h)
    if log_dir is not None:
        log_dir = Path(log_dir)
        log_dir.mkdir(parents=True, exist_ok=True)
        fh = logging.handlers.RotatingFileHandler(
            log_dir / "invesalius3_tpu.log", maxBytes=2_000_000, backupCount=3)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    _memory_handler = InMemoryHandler()
    _memory_handler.setFormatter(fmt)
    logger.addHandler(_memory_handler)
    return logger


def ensure_logging(**kw) -> None:
    """Idempotent setup: install the in-memory ring if absent so the log
    API always has a source, without clobbering an explicit setup."""
    if _memory_handler is None:
        setup_logging(**kw)


def get_logger(component: str = "") -> logging.Logger:
    name = f"{LOGGER_NAME}.{component}" if component else LOGGER_NAME
    return logging.getLogger(name)


def recent_log_lines() -> list:
    return _memory_handler.dump() if _memory_handler else []


def query_log(level: Optional[str] = None, component: Optional[str] = None,
              search: Optional[str] = None, limit: int = 500) -> list:
    """Filtered view of the in-memory ring for the log API / viewer panel
    (reference enhanced_logging.py:177-212 LogViewerFrame: level filter,
    text search, export)."""
    if _memory_handler is None:
        return []
    entries = list(_memory_handler.entries)
    if level:
        min_no = logging.getLevelName(level.upper())
        if isinstance(min_no, int):
            entries = [e for e in entries if e["levelno"] >= min_no]
    if component:
        entries = [e for e in entries if component in e["component"]]
    if search:
        s = search.lower()
        entries = [e for e in entries if s in e["message"].lower()]
    return entries[-int(limit):]


# ---------------------------------------------------------------------------
# perf spans
# ---------------------------------------------------------------------------

_spans: list = []


@contextlib.contextmanager
def span(name: str, sync_result=None):
    """[PERF]-style stage timer; pass a jax value as sync_result to block
    until the device finishes (otherwise you measure dispatch only)."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if sync_result is not None:
            import jax

            jax.block_until_ready(sync_result)
        dt = time.perf_counter() - t0
        _spans.append({"name": name, "seconds": dt, "ts": time.time()})
        get_logger("perf").info("[PERF] %s: %.4fs", name, dt)


def timing(fn):
    """Decorator timing a function (reference utils.py:392)."""

    @functools.wraps(fn)
    def wrapper(*a, **kw):
        with span(fn.__qualname__):
            return fn(*a, **kw)

    return wrapper


def perf_report() -> list:
    return list(_spans)


def export_perf_report(path) -> None:
    Path(path).write_text(json.dumps(_spans, indent=2))


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """Capture an XLA profiler trace around a region."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
