"""Event-time watermarks (SURVEY §2.5 T1-T3).

Reference: writers publish time marks (``EventStreamWriter.noteTime`` →
``Controller.noteTimestampFromWriter``, WriterMark records);
``PeriodicWatermarking`` (controller/.../bucket/
PeriodicWatermarking.java:75-346) periodically emits a ``Watermark
{lowerTimeBound, upperTimeBound, streamCut}`` to the ``_MARK<stream>``
system stream; readers query ``getCurrentTimeWindow`` for a TimeWindow
bracketing their position (WatermarkReaderImpl.java:45).

Spark-native: marks live in the ``marks.json`` metadata doc (written by
``StreamStore.note_time`` / sink commits); the watermark emitter is a
periodic job appending to the ``watermarks.json`` history = the mark
stream; TimeWindow lookup joins a read position against that history.
For streaming aggregations the engine separately wires
``withWatermark`` (streaming layer) — this module reproduces the
*queryable* watermark artifact.
"""

from __future__ import annotations

from dataclasses import dataclass

from pravega_spark.store import StreamStore
from pravega_spark.streamcut import StreamCut


@dataclass(frozen=True)
class TimeWindow:
    """Reference: client/.../stream/TimeWindow.java:36."""

    lower_time_bound: int | None  # ms; None = unknown yet
    upper_time_bound: int | None


class WatermarkEmitter:
    def __init__(self, store: StreamStore):
        self.store = store

    def emit(self, scope: str, stream: str) -> dict | None:
        """One PeriodicWatermarking cycle: aggregate active writer marks
        into {lower, upper, cut} and append to the watermark history.

        lower bound = min over writers' noted times (every writer has
        passed this time); upper = max; cut = ceiling of the writers'
        positions (per-segment max), like the reference's combined
        position upper bound.
        """
        marks = self.store.meta.writer_marks(scope, stream)
        if not marks:
            return None
        # expire stale writers (PeriodicWatermarking's
        # timestampAggregationTimeoutMs): a writer that crashed without
        # remove_writer must not pin the lower bound forever. A writer
        # is stale when its noted time lags the NEWEST noted time by
        # more than the configured timeout (deterministic — no wall
        # clock); 0 disables expiry.
        timeout = self.store.meta.get_config(scope, stream).timestamp_aggregation_timeout_ms
        newest = max(m["timestamp"] for m in marks.values())
        live = {
            w: m
            for w, m in marks.items()
            if not timeout or newest - m["timestamp"] <= timeout
        }
        times = [m["timestamp"] for m in live.values()]
        positions: dict[int, int] = {}
        for m in live.values():
            for sid, off in m["position"].items():
                sid = int(sid)
                positions[sid] = max(positions.get(sid, 0), off)
        wm = {
            "lower_bound": min(times),
            "upper_bound": max(times),
            "cut": StreamCut.of(positions).to_json(),
        }
        self.store.meta.append_watermark(scope, stream, wm)
        return wm

    def history(self, scope: str, stream: str) -> list[dict]:
        return self.store.meta.watermarks(scope, stream)

    def current_time_window(self, scope: str, stream: str, position: StreamCut) -> TimeWindow:
        """TimeWindow bracketing a reader position
        (EventStreamReader.getCurrentTimeWindow): the newest watermark
        whose cut is wholly ≤ position bounds time from below; the
        oldest watermark whose cut is ≥ position bounds it from above."""
        history = self.history(scope, stream)
        lower = None
        upper = None
        for wm in history:  # ascending seq
            cut = StreamCut.from_json(wm["cut"])
            # the reader must be AT OR PAST every cut segment: a fresh
            # (empty) position, or one omitting a cut segment, has NOT
            # passed the watermark — defaulting missing segments to
            # +inf would hand a position-zero reader the newest
            # watermark's lower bound (time progress it never made)
            if cut.positions and position.positions and all(
                s in position.positions and cut.offset_for(s, 0) <= position.positions[s]
                for s in cut.positions
            ):
                lower = wm["lower_bound"]
        for wm in history:
            cut = StreamCut.from_json(wm["cut"])
            if position.positions and all(
                position.offset_for(s, 0) <= cut.offset_for(s, 0) for s in position.positions
            ):
                upper = wm["upper_bound"]
                break
        return TimeWindow(lower, upper)
