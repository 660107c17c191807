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
        # Terminal state is keyed per query id: query A failing must stay
        # visible to waiters even if query B starts afterwards (a shared
        # flag pair would be cleared by B's onQueryStarted).
        self._active: set[str] = set()
        self._errors: dict[str, str] = {}
        self._terminated: dict[str, bool] = {}
        # Generation barrier: mark() snapshots which errors/terminations
        # already existed, so a waiter reused after an old query failed
        # reacts only to NEW events (stale entries stay readable via
        # .error / progress_summary, but no longer fail-fast a fresh wait).
        self._err_seen: frozenset[str] = frozenset()
        self._term_seen: frozenset[str] = frozenset()

    # -- aggregate views (back-compat with the flag-pair API) --------------
    @property
    def error(self) -> str | None:
        """First recorded error across tracked queries (None if clean).
        A restart of the *same* query id clears only that query's error."""
        with self._cond:
            return next(iter(self._errors.values()), None)

    @property
    def terminated(self) -> bool:
        """True once any tracked query has terminated."""
        with self._cond:
            return any(self._terminated.values())

    # -- listener callbacks (run on the listener bus thread) ---------------
    def onQueryStarted(self, event) -> None:  # noqa: N802 — Spark API
        with self._cond:
            qid = str(event.id)
            self._active.add(qid)
            self._errors.pop(qid, None)
            self._terminated[qid] = False

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
            qid = str(event.id)
            self._active.discard(qid)
            self._terminated[qid] = True
            if event.exception:
                self._errors[qid] = str(event.exception)
            self._cond.notify_all()

    # -- waiter API --------------------------------------------------------
    def mark(self) -> None:
        """Start counting rows for the next ``wait_for_rows`` barrier and
        open a new generation: errors/terminations recorded before this
        call no longer fail-fast subsequent waits."""
        with self._cond:
            self.marker_rows = 0
            self._err_seen = frozenset(self._errors)
            self._term_seen = frozenset(
                q for q, t in self._terminated.items() if t
            )

    def wait_for_rows(self, expected: int, timeout: float = 120.0) -> bool:
        """Block until ``expected`` input rows have been processed since the
        last ``mark()``. Returns False on timeout or query failure."""
        deadline = time.monotonic() + timeout
        with self._cond:
            while self.marker_rows < expected:
                # Fail fast on any error NEW since mark(); on clean
                # termination only once NO tracked query is still active
                # (an unrelated query finishing must not abort a waiter on
                # a live one) and that termination is likewise new.
                new_err = any(q not in self._err_seen for q in self._errors)
                new_term = any(
                    t and q not in self._term_seen
                    for q, t in self._terminated.items()
                )
                if new_err or (new_term and not self._active):
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
            while not any(
                t and q not in self._term_seen
                for q, t in self._terminated.items()
            ):
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
                "error": next(iter(self._errors.values()), None),
                "errors": dict(self._errors),
                "terminated": any(self._terminated.values()),
            }
