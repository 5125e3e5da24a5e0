"""Structured progress events + stage timing.

The reference tracks progress by regex-scraping subprocess stdout
(ref: app.py:1297-1323, 1386-1398).  Here every stage emits machine-readable
JSONL events alongside human-readable logs, and `stage_timer` wraps stages
with wall-clock + optional jax.profiler traces.
"""

from __future__ import annotations

import contextlib
import json
import logging
import os
import sys
import time
from pathlib import Path

_LOGGERS: dict[str, logging.Logger] = {}


def get_logger(tag: str) -> logging.Logger:
    if tag in _LOGGERS:
        return _LOGGERS[tag]
    logger = logging.getLogger(f"omfs4d.{tag}")
    if not logger.handlers:
        h = logging.StreamHandler(sys.stdout)
        h.setFormatter(logging.Formatter(f"[{tag}] %(message)s"))
        logger.addHandler(h)
        logger.setLevel(os.environ.get("OMFS4D_LOGLEVEL", "INFO"))
        logger.propagate = False
    _LOGGERS[tag] = logger
    return logger


class EventLogger:
    """Append-only JSONL event stream (replaces stdout-regex scraping)."""

    def __init__(self, path: str | Path | None = None):
        self.path = Path(path) if path else None
        if self.path:
            self.path.parent.mkdir(parents=True, exist_ok=True)

    def emit(self, event: str, **fields):
        record = {"t": time.time(), "event": event, **fields}
        if self.path:
            with open(self.path, "a", encoding="utf-8") as f:
                f.write(json.dumps(record, default=float) + "\n")
        return record


@contextlib.contextmanager
def stage_timer(name: str, events: EventLogger | None = None, profile_dir: str | None = None):
    """Time a pipeline stage; optionally capture a jax.profiler trace."""
    log = get_logger("pipeline")
    events = events or EventLogger()
    events.emit("stage_start", stage=name)
    t0 = time.perf_counter()
    trace_cm = contextlib.nullcontext()
    if profile_dir:
        import jax
        trace_cm = jax.profiler.trace(str(Path(profile_dir) / name))
    try:
        with trace_cm:
            yield events
    finally:
        dt = time.perf_counter() - t0
        events.emit("stage_end", stage=name, seconds=dt)
        log.info(f"stage {name} finished in {dt:.2f}s")
