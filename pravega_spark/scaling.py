"""Auto-scaling maintenance job (SURVEY §2.4 S1-S5).

Reference pipeline: per-segment EWMA rate tracking
(segmentstore/.../stat/SegmentAggregates.java:37-93, 2/5/10/20-minute
rates, 5 s ticks) → threshold evaluation (AutoScaleProcessor.java:286-299:
up if 2-min > 5× target after 2 min, or 5-min > 2×, or 10-min > 1×;
down if 20-min < ½ target for a ≥20-min-old segment) → scale execution
(AutoScaleTask.java:71-133: split into ``scale_factor`` successors /
merge adjacent cold neighbors; epoch transition).

Spark-native: rates come from a windowed aggregation over recent
stream data (ingest_time buckets) instead of server-side tick counters;
EWMAs are computed with the same half-life structure. The planner emits
split/merge decisions; ``run()`` applies them via
``StreamStore.scale_stream`` (metadata-only epoch transition — no data
movement, exactly like the reference).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import functions as F

from pravega_spark.config import ScaleType
from pravega_spark.store import StreamStore

TICK_SECONDS = 5  # SegmentAggregates tick
WINDOWS_MIN = (2, 5, 10, 20)


@dataclass
class ScaleDecision:
    segment_id: int
    action: str  # "split" | "merge"
    rate: float
    merge_with: int | None = None


class AutoScaler:
    def __init__(self, store: StreamStore):
        self.store = store

    def segment_rates(self, scope: str, stream: str, now=None,
                      metric: str = "events") -> dict[int, dict[int, float]]:
        """Per-segment trailing 2/5/10/20-minute rates from ingest_time
        (the rate the reference tracks with EWMAs): events/sec, or
        KB/sec of payload when ``metric="kbytes"`` (the
        BY_RATE_IN_KBYTES_PER_SEC unit).

        The widest-window filter is applied BEFORE the aggregation so
        parquet row-group stats prune everything older than 20 minutes
        — on a long-lived stream the scan touches only the tail files,
        not the whole history (segments with no recent rows simply
        drop out of the result; plan() already defaults them to 0)."""
        df = self.store._raw_read(scope, stream)
        if "ingest_time" not in df.columns:
            return {}
        if now is None:
            row = df.agg(F.max("ingest_time").alias("m")).collect()[0]
            if row["m"] is None:
                return {}
            now = row["m"]
        unit = (
            F.octet_length(F.col("payload")).cast("double") / 1024.0
            if metric == "kbytes"
            else F.lit(1.0)
        )
        horizon = F.lit(now) - F.expr(f"INTERVAL {max(WINDOWS_MIN)} MINUTES")
        aggs = [
            F.sum(
                F.when(
                    F.col("ingest_time") >= F.lit(now) - F.expr(f"INTERVAL {m} MINUTES"),
                    unit,
                ).otherwise(0.0)
            ).alias(f"n{m}")
            for m in WINDOWS_MIN
        ]
        rows = (
            df.filter(F.col("ingest_time") >= horizon)
            .groupBy("segment_id")
            .agg(*aggs)
            .collect()
        )
        return {
            r["segment_id"]: {m: r[f"n{m}"] / (m * 60.0) for m in WINDOWS_MIN} for r in rows
        }


    def plan(self, scope: str, stream: str, rates: dict[int, dict[int, float]] | None = None,
             segment_age_min: float | None = None) -> list[ScaleDecision]:
        """Apply the reference thresholds to current rates.

        ``segment_age_min`` lets tests bypass the age gates (reference
        gates: 2-min rule needs a ≥2-min-old segment, scale-down needs
        ≥20 min; our creation times come from the epoch records).
        """
        cfg = self.store.meta.get_config(scope, stream)
        if cfg.scaling.scale_type == ScaleType.FIXED_NUM_SEGMENTS:
            return []
        target = max(cfg.scaling.target_rate, 1)
        if rates is None:
            # measure in the POLICY's unit: events/s for BY_RATE_IN_
            # EVENTS_PER_SEC, payload KB/s for BY_RATE_IN_KBYTES_PER_SEC
            # — comparing an events/s rate against a KB/s target would
            # scale tiny-event streams up and fat-event streams never
            metric = (
                "kbytes"
                if cfg.scaling.scale_type == ScaleType.BY_RATE_IN_KBYTES_PER_SEC
                else "events"
            )
            rates = self.segment_rates(scope, stream, metric=metric)
        epoch = self.store.meta.active_epoch(scope, stream)
        import time as _time

        now_ms = _time.time() * 1000
        age_min = (
            segment_age_min
            if segment_age_min is not None
            else (now_ms - epoch["creation_time"]) / 60000.0
        )
        decisions: list[ScaleDecision] = []
        cold: list[tuple[float, int]] = []  # (key_start, segment_id) of cold segments
        for seg in epoch["segments"]:
            sid = seg["segment_id"]
            r = rates.get(sid, {m: 0.0 for m in WINDOWS_MIN})
            # AutoScaleProcessor.java:286-288
            if (age_min >= 2 and r[2] > 5 * target) or (age_min >= 5 and r[5] > 2 * target) or (
                age_min >= 10 and r[10] > target
            ):
                decisions.append(ScaleDecision(sid, "split", r[2]))
            # AutoScaleProcessor.java:299
            elif age_min >= 20 and r[20] < target / 2:
                cold.append((seg["key_start"], sid))
        cold.sort()
        active = sorted(epoch["segments"], key=lambda s: s["key_start"])
        cold_ids = {sid for _, sid in cold}
        # a merge shrinks the segment set by one; allowed while the result
        # stays at/above the policy minimum
        if len(active) - 1 >= cfg.scaling.min_num_segments:
            for i in range(len(active) - 1):
                a, b = active[i], active[i + 1]
                if a["segment_id"] in cold_ids and b["segment_id"] in cold_ids:
                    decisions.append(
                        ScaleDecision(a["segment_id"], "merge", 0.0, merge_with=b["segment_id"])
                    )
                    break  # one merge per cycle, like AutoScaleTask's single event
        return decisions

    def run(self, scope: str, stream: str, decisions: list[ScaleDecision] | None = None,
            segment_age_min: float | None = None) -> list[dict]:
        """Execute planned scale operations; returns new epoch records."""
        cfg = self.store.meta.get_config(scope, stream)
        decisions = decisions if decisions is not None else self.plan(
            scope, stream, segment_age_min=segment_age_min
        )
        applied = []
        for d in decisions:
            epoch = self.store.meta.active_epoch(scope, stream)
            seg = next((s for s in epoch["segments"] if s["segment_id"] == d.segment_id), None)
            if seg is None:
                continue  # already superseded this cycle
            if d.action == "split":
                n = max(cfg.scaling.scale_factor, 2)
                lo, hi = seg["key_start"], seg["key_end"]
                step = (hi - lo) / n
                ranges = [(lo + i * step, lo + (i + 1) * step if i < n - 1 else hi) for i in range(n)]
                applied.append(self.store.scale_stream(scope, stream, [d.segment_id], ranges))
            else:
                other = next(
                    (s for s in epoch["segments"] if s["segment_id"] == d.merge_with), None
                )
                if other is None:
                    continue
                lo = min(seg["key_start"], other["key_start"])
                hi = max(seg["key_end"], other["key_end"])
                applied.append(
                    self.store.scale_stream(scope, stream, [d.segment_id, d.merge_with], [(lo, hi)])
                )
        return applied

    # ---------------- event-sourced control plane (G10) ----------------
    # Reference fidelity: AutoScaleProcessor does not scale in-place —
    # it PUBLISHES scale events to the internal request stream
    # (``_system/_requeststream``, AutoScaleProcessor.java:355 /
    # ControllerEventProcessorConfigImpl.java:132) and the controller's
    # event processors consume them. Here the request stream is one of
    # the engine's OWN streams (dogfooding the data plane): decisions
    # append as events, and a checkpointed processor drains and executes
    # them. Per-target ordering holds because each target stream is one
    # routing key; replay after a crash is idempotent because a stale
    # decision's segment is no longer in the active epoch and is skipped
    # (the reference's event processors retry/skip the same way).

    REQUEST_SCOPE = "_system"
    REQUEST_STREAM = "_requeststream"

    def _ensure_request_stream(self) -> None:
        self.store.create_scope(self.REQUEST_SCOPE)
        self.store.create_stream(self.REQUEST_SCOPE, self.REQUEST_STREAM)

    def emit(self, scope: str, stream: str,
             decisions: list[ScaleDecision] | None = None,
             segment_age_min: float | None = None) -> int:
        """Publish scale decisions as events on the request stream
        instead of applying them in-place; returns #events emitted."""
        decisions = decisions if decisions is not None else self.plan(
            scope, stream, segment_age_min=segment_age_min
        )
        if not decisions:
            return 0
        self._ensure_request_stream()
        events = [
            {
                "routing_key": f"{scope}/{stream}",
                "target_scope": scope,
                "target_stream": stream,
                "target_segment": d.segment_id,
                "action": d.action,
                "rate": float(d.rate),
                "merge_with": d.merge_with if d.merge_with is not None else -1,
            }
            for d in decisions
        ]
        self.store.append_events(self.REQUEST_SCOPE, self.REQUEST_STREAM, events)
        return len(events)

    def process_requests(self, processor_id: str = "scale-processor") -> list[dict]:
        """Drain pending scale events and execute them; the consumer
        position checkpoints as a named StreamCut on the request stream
        (the controller event processor's reader-group checkpoint)."""
        st = self.store
        if not st.stream_exists(self.REQUEST_SCOPE, self.REQUEST_STREAM):
            return []
        start = st.load_stream_cut(self.REQUEST_SCOPE, self.REQUEST_STREAM, processor_id)
        end = st.tail_stream_cut(self.REQUEST_SCOPE, self.REQUEST_STREAM)
        rows = (
            st.read(self.REQUEST_SCOPE, self.REQUEST_STREAM, from_cut=start, to_cut=end)
            .orderBy("segment_id", "offset")  # per-key order within a segment
            .collect()
        )
        applied: list[dict] = []
        for r in rows:
            d = ScaleDecision(
                r["target_segment"],
                r["action"],
                r["rate"],
                merge_with=r["merge_with"] if r["merge_with"] >= 0 else None,
            )
            # run() skips decisions whose segment left the active epoch —
            # exactly the idempotent-replay behavior a crash between
            # apply and checkpoint needs
            applied += self.run(r["target_scope"], r["target_stream"], decisions=[d])
        st.save_stream_cut(self.REQUEST_SCOPE, self.REQUEST_STREAM, processor_id, end)
        return applied
