"""Streaming sink: exactly-once writes into a stream via foreachBatch.

Reference semantics reproduced (SURVEY §2.1 W1/W2):
  - durable, atomically-visible appends (StreamStore._commit_rows);
  - exactly-once across sink retries: the micro-batch ``batchId`` is the
    writer sequence number — a replayed batch is a no-op
    (AppendProcessor writer-id/event-number dedup, G1);
  - per-key order within the batch via the arrival-sequence window.

Usage::

    q = (df.writeStream
           .foreachBatch(write_stream_batch(store, "scope", "stream",
                                            routing_key_col="user_id",
                                            event_time_col="ts"))
           .option("checkpointLocation", ckpt)
           .start())
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

from pravega_spark.store import StreamStore


def write_stream_batch(
    store: StreamStore,
    scope: str,
    stream: str,
    routing_key_col: str = "routing_key",
    event_time_col: str | None = None,
    writer_id: str = "stream-sink",
    note_time: bool = False,
) -> Callable[[DataFrame, int], None]:
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
