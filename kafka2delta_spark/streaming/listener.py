"""Streaming progress observability + synchronization.

The reference's test harness synchronizes on micro-batch progress with a
``StreamingQueryListener`` that polls shared counters once a second (ref
stream/test/stream_listener.py:10-80). This is also the production
observability surface: numInputRows per trigger, batch cadence, terminal
exceptions.

``StreamProgressListener`` is the Spark-first re-expression: the same
events (pure-Python ``StreamingQueryListener`` callbacks, public API since
Spark 3.4), but waiters block on a condition variable the callbacks
notify — no polling latency, no sleep granularity. ``mark()`` +
``wait_for_rows(n)`` gives tests and backfill drivers a precise "this
batch landed" barrier without ``processAllAvailable`` (which busy-waits
and is driver-internal API).
"""

from __future__ import annotations

import threading
import time

from pyspark.sql.streaming import StreamingQueryListener


class StreamProgressListener(StreamingQueryListener):
    """Tracks rows/batches across all queries it is attached to and lets
    callers block until progress (or failure) happens.

    Attach with ``spark.streams.addListener(listener)``; detach with
    ``spark.streams.removeListener(listener)``.
    """

    def __init__(self) -> None:
        super().__init__()
        self._cond = threading.Condition()
        self.total_rows = 0
        self.marker_rows = 0
        self.n_batches = 0
        self.error: str | None = None
        self.terminated = False

    # -- listener callbacks (run on the listener bus thread) ---------------
    def onQueryStarted(self, event) -> None:  # noqa: N802 — Spark API
        with self._cond:
            self.terminated = False
            self.error = None

    def onQueryProgress(self, event) -> None:  # noqa: N802
        with self._cond:
            n = int(event.progress.numInputRows)
            self.total_rows += n
            self.marker_rows += n
            self.n_batches += 1
            self._cond.notify_all()

    def onQueryIdle(self, event) -> None:  # noqa: N802
        with self._cond:
            self._cond.notify_all()

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        with self._cond:
            self.terminated = True
            if event.exception:
                self.error = str(event.exception)
            self._cond.notify_all()

    # -- waiter API --------------------------------------------------------
    def mark(self) -> None:
        """Start counting rows for the next ``wait_for_rows`` barrier."""
        with self._cond:
            self.marker_rows = 0

    def wait_for_rows(self, expected: int, timeout: float = 120.0) -> bool:
        """Block until ``expected`` input rows have been processed since the
        last ``mark()``. Returns False on timeout or query failure."""
        deadline = time.monotonic() + timeout
        with self._cond:
            while self.marker_rows < expected:
                if self.error or self.terminated:
                    return False
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    return False
                self._cond.wait(remaining)
            return True

    def wait_for_termination(self, timeout: float = 120.0) -> bool:
        """Block until the query terminates (e.g. an AvailableNow drain
        finishes). Returns False on timeout; check ``error`` for failures."""
        deadline = time.monotonic() + timeout
        with self._cond:
            while not self.terminated:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    return False
                self._cond.wait(remaining)
            return True

    def progress_summary(self) -> dict:
        """Snapshot for dashboards/logs."""
        with self._cond:
            return {
                "total_rows": self.total_rows,
                "n_batches": self.n_batches,
                "error": self.error,
                "terminated": self.terminated,
            }
