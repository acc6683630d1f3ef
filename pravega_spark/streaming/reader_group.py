"""Reader groups over the streaming source (SURVEY §2.2 R2-R3).

The reference coordinates N readers over segments with a shared state
synchronizer (ReaderGroupState.java, 1416 LoC of acquire/release/
checkpoint protocol). On Spark, ONE streaming query per reader group is
the whole story: tasks fan out per segment slice, the checkpoint
location persists positions, and rebalancing is the scheduler's. This
class packages that with the reference's surface:

  - ``read_stream()`` → streaming DataFrame (readNextEvent plane)
  - ``read_batch()`` → bounded DataFrame between the group's cuts
  - ``initiate_checkpoint(name)`` → named StreamCut of current positions
  - ``update_retention_stream_cut`` → publish subscriber position for
    consumption-based retention (N3)
  - ``get_stream_cuts()`` → current positions (lag introspection, M2)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pravega_spark.config import ReaderGroupConfig
from pravega_spark.store import StreamStore
from pravega_spark.streamcut import StreamCut
from pravega_spark.streaming.datasource import register


class ReaderGroup:
    def __init__(self, store: StreamStore, scope: str, stream: str, name: str,
                 config: ReaderGroupConfig | None = None):
        self.store = store
        self.scope, self.stream, self.name = scope, stream, name
        self.config = config or ReaderGroupConfig()
        from pravega_spark import fsio

        self.checkpoint_dir = fsio.join(store.root, "_reader_groups", scope, stream, name)
        register(store.spark)

    # ---------------- consumption plane ----------------
    def _options(self) -> dict:
        # checkpoint_dir lets a restarted source seed its rate-limit
        # high-water mark from the offsets log, so the first post-restart
        # batch honors max_events_per_trigger instead of catching up in
        # one unbounded batch
        opts = {"root": self.store.root, "scope": self.scope, "stream": self.stream,
                "checkpoint_dir": self.checkpoint_dir}
        if self.config.start_cut is not None:
            opts["start_cut"] = StreamCut.of(self.config.start_cut).to_json()
        if self.config.end_cut is not None:
            opts["end_cut"] = StreamCut.of(self.config.end_cut).to_json()
        return opts

    def read_stream(self, max_events_per_trigger: int | None = None) -> DataFrame:
        reader = self.store.spark.readStream.format("pravega_stream")
        for k, v in self._options().items():
            reader = reader.option(k, v)
        if max_events_per_trigger:
            reader = reader.option("max_events_per_trigger", max_events_per_trigger)
        return reader.load()

    def read_batch(self) -> DataFrame:
        reader = self.store.spark.read.format("pravega_stream")
        for k, v in self._options().items():
            reader = reader.option(k, v)
        return reader.load()

    def start(self, sink_fn, trigger_available_now: bool = True, query_name: str | None = None):
        """Run the group's query with its durable checkpoint (positions
        survive restart = reader-group resume semantics)."""
        q = (
            self.read_stream()
            .writeStream.foreachBatch(sink_fn)
            .option("checkpointLocation", self.checkpoint_dir)
            .queryName(query_name or f"rg-{self.name}")
        )
        if trigger_available_now:
            q = q.trigger(availableNow=True)
        return q.start()

    def _drain_target(self) -> StreamCut:
        """The positions a bounded drain must reach: the tail observed
        NOW, capped at the group's end cut when one is configured — an
        uncapped target would make the wait spin for the full timeout
        and report a meaningless pending count. Uses the source's own
        epoch-aware bounding so post-cut successor segments count as
        fully drained, not pending."""
        target = self.store.tail_stream_cut(self.scope, self.stream)
        if self.config.end_cut is not None:
            from pravega_spark.streaming.datasource import bound_tails_by_cut

            end = StreamCut.of(self.config.end_cut)
            target = StreamCut.of(
                bound_tails_by_cut(
                    self.store.root, self.scope, self.stream,
                    dict(target.positions), end.positions,
                )
            )
        return target

    def pumping(self, sink_fn, timeout_s: float = 300.0, poll_s: float = 0.05):
        """ONE long-lived drain query serving several bounded feeds —
        the multi-drain optimization: back-to-back ``drain()`` calls pay
        a full streaming-query start/stop each (plan analysis +
        checkpoint setup + Python-source init) when the caller only
        wants "write, wait until consumed, write the next". Context
        manager; yields a ``wait_drained()`` callable that blocks until
        the query's committed positions reach the tail observed at THAT
        call (re-raising the query's failure if it dies first). Each
        atomically-committed feed lands in its own micro-batch: the
        manifest flip publishes a write all-at-once and a trigger plans
        everything between the last committed cut and the current tail,
        so N feeds with a wait between them still mean ≥N real data
        triggers — empty triggers plan no batch and never invoke the
        sink. Same checkpoint, same exactly-once semantics as the
        equivalent ``drain()`` sequence."""
        import contextlib
        import time

        @contextlib.contextmanager
        def _ctx():
            q = (
                self.read_stream()
                .writeStream.foreachBatch(sink_fn)
                .option("checkpointLocation", self.checkpoint_dir)
                .queryName(f"rg-{self.name}-pump")
                .trigger(processingTime=f"{poll_s} seconds")
                .start()
            )

            def wait_drained() -> None:
                target = self._drain_target()
                deadline = time.time() + timeout_s
                while time.time() < deadline:
                    if q.exception() is not None:
                        raise q.exception()
                    pos = self.committed_positions()
                    if all(
                        pos.offset_for(sid, 0) >= off
                        for sid, off in target.positions.items()
                    ):
                        return
                    time.sleep(poll_s)
                raise TimeoutError(
                    f"reader group {self.name} did not reach "
                    f"{target.positions} within {timeout_s}s"
                )

            try:
                yield wait_drained
            finally:
                q.stop()
                q.awaitTermination(60)

        return _ctx()

    def drain(self, sink_fn, timeout_s: float = 300.0, poll_s: float = 0.05):
        """Process everything currently in the stream, then stop — exact
        bounded-drain semantics (the reference's readNextEvent-until-
        end-of-data loop; Spark's Trigger.AvailableNow, which the Python
        data source API doesn't support, would fall back to a SINGLE
        micro-batch and silently stop early under a rate limit).

        Runs a processing-time trigger and stops once the checkpointed
        positions reach the tail observed at call time. Returns the
        number of events that were pending at start."""
        import time

        target = self._drain_target()
        pending = self.committed_positions().distance_to(target)
        q = (
            self.read_stream()
            .writeStream.foreachBatch(sink_fn)
            .option("checkpointLocation", self.checkpoint_dir)
            .queryName(f"rg-{self.name}-drain")
            .trigger(processingTime=f"{poll_s} seconds")
            .start()
        )
        deadline = time.time() + timeout_s
        try:
            while time.time() < deadline:
                if q.exception() is not None:
                    raise q.exception()
                pos = self.committed_positions()
                # explicit per-segment check — covers_before compares only
                # SHARED segments and is vacuously true against an empty cut
                if all(pos.offset_for(sid, 0) >= off for sid, off in target.positions.items()):
                    break
                time.sleep(poll_s)
        finally:
            q.stop()
            q.awaitTermination(60)
        return pending

    # ---------------- positions / checkpoints ----------------
    def committed_positions(self) -> StreamCut:
        """Positions of the last COMMITTED micro-batch (the reader
        group's durable StreamCut).

        Spark writes ``offsets/N`` when batch N is *planned* and
        ``commits/N`` only after it completes — reading the offsets log
        alone would report data as consumed while the batch is still
        in flight (and drain() would stop the query mid-batch)."""
        from pravega_spark.streaming.datasource import (
            logged_batch_ids,
            read_offsets_log,
        )

        committed = logged_batch_ids(self.checkpoint_dir, "commits")
        if not committed:
            return StreamCut.of({})
        # the ONE validated offsets-log parser (strict single-source):
        # a multi-source query's batch cannot be attributed to this
        # stream, and a wrong-source cut published to retention could
        # truncate data this group never read
        positions = read_offsets_log(self.checkpoint_dir, committed[-1])
        if positions is None:
            return StreamCut.of({})
        return StreamCut.of({int(k): int(v) for k, v in positions.items()})

    def initiate_checkpoint(self, name: str) -> StreamCut:
        """Named checkpoint = persist current positions as a StreamCut
        (ReaderGroup.initiateCheckpoint; completed checkpoint IS a cut)."""
        cut = self.committed_positions()
        self.store.save_stream_cut(self.scope, self.stream, f"rg-{self.name}-{name}", cut)
        return cut

    def get_stream_cuts(self) -> dict[str, StreamCut]:
        return {self.stream: self.committed_positions()}

    def unread_events(self) -> int:
        """Distance to tail (ReaderGroupMetrics.unreadBytes analogue)."""
        return self.committed_positions().distance_to(self.store.tail_stream_cut(self.scope, self.stream))

    def update_retention_stream_cut(self, cut: StreamCut | None = None) -> None:
        """Publish the group's position for consumption-based retention
        (ReaderGroup.updateRetentionStreamCut → subscriber cuts)."""
        cut = cut or self.committed_positions()
        self.store.meta.update_subscriber_cut(self.scope, self.stream, f"rg-{self.name}", cut.to_json())

    def reset(self) -> None:
        """Drop the checkpoint → group restarts from its configured cut
        (ReaderGroup.resetReaderGroup)."""
        from pravega_spark import fsio

        fsio.rmtree(self.checkpoint_dir)
