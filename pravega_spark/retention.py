"""Retention / truncation maintenance job (SURVEY §2.6 N1-N3).

Reference: ``PeriodicRetention`` (controller/.../bucket/
PeriodicRetention.java:33-66) drives ``StreamMetadataTasks.retention``
(StreamMetadataTasks.java:1038-1154) which computes a truncation
StreamCut by time limit or size limit — and, for consumption-based
retention (ReaderGroupConfig.StreamDataRetention), the min over
subscriber-published StreamCuts clamped to [min, max] bounds.

Spark-native: the time cut comes from a stats-pruned parquet scan
(min offset with event_time inside the horizon); the size cut from the
metadata tail offsets (retain the last N events per segment). Truncation
itself is the metadata head-offset bump + compaction (StreamStore).
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from pyspark.sql import functions as F

from pravega_spark.config import RetentionType
from pravega_spark.store import StreamStore
from pravega_spark.streamcut import StreamCut


class RetentionJob:
    def __init__(self, store: StreamStore):
        self.store = store

    def cut_by_time(self, scope: str, stream: str, horizon_ms: int, now=None) -> StreamCut:
        """First retained offset per segment: events older than
        ``now - horizon`` fall before the cut
        (getTruncationStreamCutByTimeLimit)."""
        if now is None:
            now = datetime.now(timezone.utc)
        boundary = now - timedelta(milliseconds=horizon_ms)
        df = self.store._raw_read(scope, stream)
        tails = self.store.meta.tail_offsets(scope, stream)
        # events written without an event_time_col have NULL event_time;
        # falling back to ingest_time (always populated by _commit_rows)
        # keeps them retained — otherwise one TIME-retention run would
        # cut every such segment to tail and silently drop all data.
        # Reference time retention works off StreamCutRecord history, not
        # per-event times, and can never skip events that way.
        rows = (
            df.filter(F.coalesce(F.col("event_time"), F.col("ingest_time")) >= F.lit(boundary))
            .groupBy("segment_id")
            .agg(F.min("offset").alias("o"))
            .collect()
        )
        found = {r["segment_id"]: r["o"] for r in rows}
        # segments with no retained events truncate to tail
        return StreamCut.of({sid: found.get(sid, tail) for sid, tail in tails.items()})

    def cut_by_size(self, scope: str, stream: str, retain_events: int) -> StreamCut:
        """Retain the trailing ``retain_events`` across the stream,
        apportioned per segment by tail share
        (getTruncationStreamCutBySizeLimit; bytes→events unit change
        documented in config.RetentionPolicy.by_size)."""
        tails = self.store.meta.tail_offsets(scope, stream)
        heads = self.store.meta.head_offsets(scope, stream)
        total = sum(tails[s] - heads.get(s, 0) for s in tails)
        if total <= retain_events:
            return StreamCut.of(dict(heads))
        frac = retain_events / total
        import math

        # ceil, not floor: flooring each segment's share can retain up
        # to num_segments FEWER events than promised — with a small
        # retain_events every share rounds to 0 and one retention run
        # truncates the entire stream. Retention must err on keeping
        # more, never less.
        return StreamCut.of(
            {
                s: max(
                    heads.get(s, 0),
                    tails[s] - math.ceil((tails[s] - heads.get(s, 0)) * frac),
                )
                for s in tails
            }
        )

    def consumption_cut(self, scope: str, stream: str) -> StreamCut | None:
        """Min over subscriber StreamCuts (updateSubscriberStreamCut /
        listSubscribers): never truncate past the slowest reader group."""
        subs = self.store.meta.list_subscribers(scope, stream)
        if not subs:
            return None
        cuts = [StreamCut.from_json(s["cut"]) for s in subs.values()]
        segs = set()
        for c in cuts:
            segs |= set(c.positions)
        return StreamCut.of({s: min(c.offset_for(s, 0) for c in cuts) for s in segs})

    def run(self, scope: str, stream: str, now=None, compact: bool = False) -> StreamCut | None:
        """One retention cycle: compute the policy cut, clamp for
        subscribers, truncate. Returns the applied cut (None = no-op)."""
        cfg = self.store.meta.get_config(scope, stream)
        pol = cfg.retention
        if pol.retention_type == RetentionType.NONE:
            return None
        if pol.retention_type == RetentionType.TIME:
            cut = self.cut_by_time(scope, stream, pol.retention_param, now=now)
        elif pol.retention_type == RetentionType.SIZE:
            cut = self.cut_by_size(scope, stream, pol.retention_param)
        else:  # CONSUMPTION
            cut = self.consumption_cut(scope, stream)
            if cut is None:
                return None
            # clamp to [min, max] bounds (ReaderGroupConfig retention):
            # never keep more than max, never truncate into the last min
            if pol.retention_max:
                floor = self.cut_by_size(scope, stream, pol.retention_max)
                cut = StreamCut.of(
                    {s: max(cut.offset_for(s, 0), floor.offset_for(s, 0)) for s in floor.positions}
                )
            if pol.retention_param:
                ceil = self.cut_by_size(scope, stream, pol.retention_param)
                cut = StreamCut.of(
                    {s: min(cut.offset_for(s, 0), ceil.offset_for(s, 0)) for s in ceil.positions}
                )
        # consumption clamp also applies to TIME/SIZE when subscribers exist
        if pol.retention_type != RetentionType.CONSUMPTION:
            sub_cut = self.consumption_cut(scope, stream)
            if sub_cut is not None:
                # a segment with NO subscriber position defaults to 0
                # (hold truncation), matching consumption_cut's own
                # conservative choice — after a scale, a successor the
                # group hasn't drained yet must not be truncated out
                # from under it
                cut = StreamCut.of(
                    {
                        s: min(cut.offset_for(s, 0), sub_cut.offset_for(s, 0))
                        for s in cut.positions
                    }
                )
                # ... but the policy's MAX bound caps how far a stalled
                # subscriber can pin retention (the reference applies
                # the max bound exactly to lagging subscribers:
                # StreamMetadataTasks truncation bounds). TIME's max is
                # milliseconds, SIZE's max is events.
                if pol.retention_max:
                    if pol.retention_type == RetentionType.TIME:
                        floor = self.cut_by_time(scope, stream, pol.retention_max, now=now)
                    else:
                        floor = self.cut_by_size(scope, stream, pol.retention_max)
                    cut = StreamCut.of(
                        {
                            s: max(cut.offset_for(s, 0), floor.offset_for(s, 0))
                            for s in cut.positions
                        }
                    )
        self.store.truncate_stream(scope, stream, cut)
        if compact:
            self.store.compact_stream(scope, stream)
        return cut
