"""Custom stateful streaming operators (applyInPandasWithState).

The scale-out twin of the StateSynchronizer fold (SURVEY §2.8 V3): the
reference folds updates into replicated state on each client; at data-
plane scale the same event-sourced fold runs *inside* the stream
processor with per-key state in the state store. This module ships the
canonical instance — per-routing-key running aggregates — as a reusable
operator over the pravega_stream source.

State shape: (count, total, last_offset) per routing key; each
micro-batch emits the post-batch state row per key touched, giving an
incrementally-maintained materialized view of the fold.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "routing_key string, n_events long, total_value double, last_offset long"
STATE_SCHEMA = "n long, total double, last_offset long"


def _fold(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    (rk,) = key
    if state.exists:
        n, total, last_off = state.get
    else:
        n, total, last_off = 0, 0.0, -1
    for pdf in pdfs:
        n += len(pdf)
        if "value" in pdf.columns:
            total += float(pdf["value"].fillna(0.0).sum())
        if "offset" in pdf.columns and len(pdf):
            last_off = max(last_off, int(pdf["offset"].max()))
    state.update((n, total, last_off))
    yield pd.DataFrame(
        [{"routing_key": rk, "n_events": n, "total_value": total, "last_offset": last_off}]
    )


SESSION_OUTPUT_SCHEMA = (
    "user_id long, n_events long, total_cents long, last_event long, n_active_hours long"
)
SESSION_STATE_SCHEMA = "n long, cents long, last_event long, hours array<long>"


def _session_fold(
    key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Order-independent per-key session fold: exact integer totals plus
    the set of distinct active hour-buckets (state is bounded by the
    stream's TIME RANGE, not its row count — scale-safe at 100 TB).
    Integer-only state/output keeps the fold bit-deterministic across
    micro-batch orderings, so a SQL oracle can verify the drained
    result exactly."""
    (uid,) = key
    if state.exists:
        n, cents, last_ev, hours = state.get
        hour_set = set(hours)
    else:
        n, cents, last_ev, hour_set = 0, 0, -1, set()
    for pdf in pdfs:
        n += len(pdf)
        if len(pdf):
            cents += int(pdf["cents"].sum())
            last_ev = max(last_ev, int(pdf["event_id"].max()))
            hour_set.update(int(h) for h in pdf["hour_bucket"])
    state.update((n, cents, last_ev, sorted(hour_set)))
    yield pd.DataFrame(
        [
            {
                "user_id": uid,
                "n_events": n,
                "total_cents": cents,
                "last_event": last_ev,
                "n_active_hours": len(hour_set),
            }
        ]
    )


def session_fold_per_key(stream_df: DataFrame) -> DataFrame:
    """Attach the session fold to a streaming frame carrying
    ``user_id``, ``event_id``, ``cents``, ``hour_bucket`` columns
    (integer-lifted upstream so the fold is exact)."""
    return stream_df.groupBy("user_id").applyInPandasWithState(
        _session_fold,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_state_per_key(stream_df: DataFrame, value_expr: str | None = None) -> DataFrame:
    """Attach the running-fold operator to a streaming envelope frame.

    ``value_expr`` (SQL) lifts a numeric from the payload; defaults to 0
    when absent so the operator works on any stream.
    """
    from pyspark.sql import functions as F

    src = stream_df
    if value_expr is not None:
        src = src.withColumn("value", F.expr(value_expr).cast("double"))
    elif "value" not in src.columns:
        src = src.withColumn("value", F.lit(0.0))
    return src.groupBy("routing_key").applyInPandasWithState(
        _fold,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
