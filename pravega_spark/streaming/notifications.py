"""Notifications (SURVEY §2.11 M1-M2).

Reference: ``SegmentNotification`` (segment count changed) and
``EndOfDataNotification`` delivered through the client NotificationSystem
(client/.../stream/notifications/). Spark-native: a
``StreamingQueryListener`` wrapping query progress, plus a poller that
diffs the epoch chain for segment-count changes.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql.streaming import StreamingQueryListener

from pravega_spark.store import StreamStore


class SegmentNotifier:
    """Poll-based segment-count notifications (SegmentNotification)."""

    def __init__(self, store: StreamStore, scope: str, stream: str):
        self.store = store
        self.scope, self.stream = scope, stream
        self._last_count: int | None = None
        self.listeners: list[Callable[[int, int], None]] = []

    def register_listener(self, fn: Callable[[int, int], None]) -> None:
        self.listeners.append(fn)

    def poll(self) -> None:
        n = len(self.store.current_segments(self.scope, self.stream))
        if self._last_count is not None and n != self._last_count:
            readers = n  # recommended reader count == segment count
            for fn in self.listeners:
                fn(n, readers)
        self._last_count = n


class ReaderGroupProgressListener(StreamingQueryListener):
    """Query-progress events → reader-group metrics (M2: per-segment
    distribution introspection / EndOfData via no-new-rows)."""

    # retained history is bounded: a continuous 1 s-trigger query emits
    # ~86k progress events/day — an unbounded list slowly exhausts the
    # driver on multi-day jobs. Callers needing full history stream it
    # through on_progress.
    MAX_RETAINED = 10_000

    def __init__(self, on_progress: Callable[[dict], None] | None = None,
                 on_idle: Callable[[str], None] | None = None):
        from collections import deque

        self.on_progress = on_progress
        self.on_idle = on_idle
        self.progress: "deque[dict]" = deque(maxlen=self.MAX_RETAINED)

    def onQueryStarted(self, event) -> None:
        pass

    def onQueryProgress(self, event) -> None:
        p = {
            "id": str(event.progress.id),
            "numInputRows": event.progress.numInputRows,
            "batchId": event.progress.batchId,
        }
        self.progress.append(p)
        if self.on_progress:
            self.on_progress(p)
        if event.progress.numInputRows == 0 and self.on_idle:
            self.on_idle(str(event.progress.id))

    def onQueryIdle(self, event) -> None:
        if self.on_idle:
            self.on_idle(str(event.id))

    def onQueryTerminated(self, event) -> None:
        pass
