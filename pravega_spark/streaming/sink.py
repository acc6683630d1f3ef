"""Streaming sink: exactly-once writes into a stream via foreachBatch.

Reference semantics reproduced (SURVEY §2.1 W1/W2):
  - durable, atomically-visible appends (StreamStore._commit_rows);
  - exactly-once across sink retries: the micro-batch ``batchId`` is the
    writer sequence number — a replayed batch is a no-op
    (AppendProcessor writer-id/event-number dedup, G1);
  - per-key order within the batch via the arrival-sequence window.

Writer identity: the reference gives every writer instance a fresh UUID
(EventStreamWriterImpl) and dedups per (writer, eventNumber). Here the
dedup key is (writer_id, batchId), so the writer_id MUST be unique per
logical query: two queries writing one stream under the same id would
silently swallow each other's batches. Callers therefore either pass an
explicit ``writer_id`` or a ``checkpoint_location`` from which a stable
id is derived (same checkpoint = same query incarnation = same batchId
sequence). Resetting/deleting a checkpoint restarts batchId at 0, so a
reset REQUIRES a new writer_id (or a fresh checkpoint path) — otherwise
every batch replays below the old high-water mark and is dropped.

Usage::

    ckpt = "/tmp/ckpt/my-sink"
    q = (df.writeStream
           .foreachBatch(write_stream_batch(store, "scope", "stream",
                                            routing_key_col="user_id",
                                            event_time_col="ts",
                                            checkpoint_location=ckpt))
           .option("checkpointLocation", ckpt)
           .start())
"""

from __future__ import annotations

import hashlib
from typing import Callable

from pyspark.sql import DataFrame

from pravega_spark.store import StreamStore


def writer_id_for_checkpoint(checkpoint_location: str) -> str:
    """Stable writer identity bound to a query's checkpoint location."""
    digest = hashlib.sha256(checkpoint_location.rstrip("/").encode("utf-8")).hexdigest()[:16]
    return f"sink-{digest}"


def write_stream_batch(
    store: StreamStore,
    scope: str,
    stream: str,
    routing_key_col: str = "routing_key",
    event_time_col: str | None = None,
    writer_id: str | None = None,
    checkpoint_location: str | None = None,
    note_time: bool = False,
) -> Callable[[DataFrame, int], None]:
    if writer_id is None:
        if checkpoint_location is None:
            raise ValueError(
                "write_stream_batch needs writer_id or checkpoint_location: "
                "the (writer_id, batchId) pair is the exactly-once dedup key, "
                "and a shared implicit default would make concurrent queries "
                "drop each other's batches"
            )
        writer_id = writer_id_for_checkpoint(checkpoint_location)

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        store.write_events(
            scope,
            stream,
            batch_df,
            routing_key_col=routing_key_col,
            event_time_col=event_time_col,
            writer_id=writer_id,
            batch_seq=batch_id,
            note_time=note_time,
        )

    return _write
