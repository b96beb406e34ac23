"""Structured logging (reference parity:
/root/reference/src/utils/logger.py:12-25 — timestamped module-level
loggers; /root/reference/src/transform/transform.py:29,75-77 — per-run
transform timing logged as a wall-clock line).

JSON lines to stderr so driver logs are machine-collectable alongside
Spark's own event logs; ``timed_stage`` is the engine's version of the
reference's measure-and-log pattern.
"""

from __future__ import annotations

import json
import logging
import sys
import time
from contextlib import contextmanager


class JsonFormatter(logging.Formatter):
    def format(self, record: logging.LogRecord) -> str:
        out = {
            "ts": self.formatTime(record, "%Y-%m-%dT%H:%M:%S"),
            "level": record.levelname,
            "logger": record.name,
            "msg": record.getMessage(),
        }
        if record.exc_info:
            out["exc"] = self.formatException(record.exc_info)
        extra = getattr(record, "extra_fields", None)
        if extra:
            out.update(extra)
        return json.dumps(out)


def get_logger(name: str) -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(JsonFormatter())
        logger.addHandler(handler)
        logger.setLevel(logging.INFO)
        logger.propagate = False
    return logger


@contextmanager
def timed_stage(logger: logging.Logger, stage: str, **fields):
    """Log stage start/finish with wall-clock seconds (the reference's
    transform-timing pattern, transform.py:29,75-77)."""
    t0 = time.perf_counter()
    logger.info("%s started", stage, extra={"extra_fields": fields})
    try:
        yield
    except Exception:
        logger.error(
            "%s failed after %.3fs", stage, time.perf_counter() - t0,
            exc_info=True, extra={"extra_fields": fields},
        )
        raise
    logger.info(
        "%s finished in %.3fs", stage, time.perf_counter() - t0,
        extra={"extra_fields": fields},
    )


__all__ = ["JsonFormatter", "get_logger", "timed_stage"]
