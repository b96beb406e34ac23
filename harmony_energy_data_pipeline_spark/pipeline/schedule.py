"""Interval scheduler: the reference's hourly background job
(/root/reference/src/scheduler/job.py:10-34) without the APScheduler
dependency — a daemon thread firing ``job()`` every ``interval``
seconds, immediately on start (reference: ``next_run_time=now()``).

Driver-side only: on a real cluster the equivalent is an external
orchestrator (Airflow cron) or a Structured Streaming trigger
(``Trigger.ProcessingTime``, see streaming.incremental); this exists
for single-driver parity with the reference deployment shape.
"""

from __future__ import annotations

import logging
import threading
import time

logger = logging.getLogger(__name__)


class IntervalScheduler:
    def __init__(self, job, interval_seconds: float, run_immediately: bool = True):
        if not interval_seconds > 0:
            # a non-positive interval would make every slot already in
            # the past — the loop would spin at 100% CPU advancing k
            # one slot at a time and never check _stop (ADVICE r3)
            raise ValueError(
                f"interval_seconds must be > 0, got {interval_seconds!r}"
            )
        self._job = job
        self._interval = interval_seconds
        self._immediate = run_immediately
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self.run_count = 0

    def _loop(self) -> None:
        # FIXED-RATE schedule (APScheduler interval-trigger semantics):
        # fire times are anchor + k*interval, so job duration does not
        # drift the schedule (fixed-DELAY would fire at interval +
        # duration). A run that overshoots its slot skips straight to
        # the next future slot rather than firing a burst.
        anchor = time.monotonic()
        if self._immediate and not self._stop.is_set():
            self._fire()
        k = 1
        while True:
            now = time.monotonic()
            # jump straight to the next FUTURE slot (no one-slot-at-a-
            # time catch-up loop): a run that overshot s slots resumes
            # at slot floor(elapsed/interval)+1
            k = max(k, int((now - anchor) // self._interval) + 1)
            next_at = anchor + k * self._interval
            if self._stop.wait(next_at - now):
                return
            self._fire()
            k += 1

    def _fire(self) -> None:
        try:
            self._job()
            self.run_count += 1
        except Exception:  # the loop must survive a failed run
            logger.exception("scheduled job failed; next run continues")
            self.run_count += 1

    def start(self) -> "IntervalScheduler":
        if self._thread is not None:
            raise RuntimeError("scheduler already started")
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        return self

    def stop(self, timeout: float = 5.0) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout)


__all__ = ["IntervalScheduler"]
