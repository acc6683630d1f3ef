"""Stream / table configuration records.

Mirrors the reference's client config surface:
  - ``StreamConfiguration`` (client/.../stream/StreamConfiguration.java:35-100)
  - ``ScalingPolicy``       (client/.../stream/ScalingPolicy.java:39-145)
  - ``RetentionPolicy``     (client/.../stream/RetentionPolicy.java:34-94)
  - ``KeyValueTableConfiguration`` (client/.../tables/KeyValueTableConfiguration.java:30-67)
  - ``ReaderGroupConfig``   (client/.../stream/ReaderGroupConfig.java)

These are plain dataclasses persisted as JSON rows in the metadata store;
the maintenance jobs (scaling.py, retention.py) read them to decide
split/merge and truncation actions.
"""

from __future__ import annotations

from dataclasses import asdict, dataclass, field
from enum import Enum
from typing import Any


class ScaleType(str, Enum):
    FIXED_NUM_SEGMENTS = "FIXED"
    BY_RATE_IN_EVENTS_PER_SEC = "BY_RATE_EVENTS"
    BY_RATE_IN_KBYTES_PER_SEC = "BY_RATE_KB"


class RetentionType(str, Enum):
    NONE = "NONE"
    TIME = "TIME"
    SIZE = "SIZE"
    CONSUMPTION = "CONSUMPTION"


@dataclass(frozen=True)
class ScalingPolicy:
    """Reference: ScalingPolicy.fixed / byEventRate / byDataRate."""

    scale_type: ScaleType = ScaleType.FIXED_NUM_SEGMENTS
    target_rate: int = 0  # events/s or KB/s depending on type
    scale_factor: int = 0  # number of successors on split
    min_num_segments: int = 1

    @staticmethod
    def fixed(num_segments: int) -> "ScalingPolicy":
        return ScalingPolicy(ScaleType.FIXED_NUM_SEGMENTS, 0, 0, num_segments)

    @staticmethod
    def by_event_rate(target_rate: int, scale_factor: int = 2, min_num_segments: int = 1) -> "ScalingPolicy":
        return ScalingPolicy(ScaleType.BY_RATE_IN_EVENTS_PER_SEC, target_rate, scale_factor, min_num_segments)

    @staticmethod
    def by_data_rate(target_kbps: int, scale_factor: int = 2, min_num_segments: int = 1) -> "ScalingPolicy":
        return ScalingPolicy(ScaleType.BY_RATE_IN_KBYTES_PER_SEC, target_kbps, scale_factor, min_num_segments)


@dataclass(frozen=True)
class RetentionPolicy:
    """Reference: RetentionPolicy.bySizeBytes / byTime (+ min/max bounds)."""

    retention_type: RetentionType = RetentionType.NONE
    retention_param: int = 0  # millis for TIME, bytes(=events here) for SIZE
    retention_max: int = 0  # 0 = unbounded upper clamp

    @staticmethod
    def by_time(millis: int, max_millis: int = 0) -> "RetentionPolicy":
        return RetentionPolicy(RetentionType.TIME, millis, max_millis)

    @staticmethod
    def by_size(events: int, max_events: int = 0) -> "RetentionPolicy":
        # Reference sizes are bytes; our data plane is columnar so the
        # retention unit is events (documented semantic difference).
        return RetentionPolicy(RetentionType.SIZE, events, max_events)

    @staticmethod
    def consumption(min_events: int = 0, max_events: int = 0) -> "RetentionPolicy":
        return RetentionPolicy(RetentionType.CONSUMPTION, min_events, max_events)


@dataclass(frozen=True)
class StreamConfiguration:
    scaling: ScalingPolicy = field(default_factory=lambda: ScalingPolicy.fixed(1))
    retention: RetentionPolicy = field(default_factory=RetentionPolicy)
    tags: tuple[str, ...] = ()
    rollover_size_bytes: int = 128 * 1024 * 1024  # target parquet file size
    timestamp_aggregation_timeout_ms: int = 0

    def to_json(self) -> dict[str, Any]:
        d = asdict(self)
        d["scaling"]["scale_type"] = self.scaling.scale_type.value
        d["retention"]["retention_type"] = self.retention.retention_type.value
        d["tags"] = list(self.tags)
        return d

    @staticmethod
    def from_json(d: dict[str, Any]) -> "StreamConfiguration":
        sc = d.get("scaling", {})
        rt = d.get("retention", {})
        return StreamConfiguration(
            scaling=ScalingPolicy(
                ScaleType(sc.get("scale_type", "FIXED")),
                sc.get("target_rate", 0),
                sc.get("scale_factor", 0),
                sc.get("min_num_segments", 1),
            ),
            retention=RetentionPolicy(
                RetentionType(rt.get("retention_type", "NONE")),
                rt.get("retention_param", 0),
                rt.get("retention_max", 0),
            ),
            tags=tuple(d.get("tags", ())),
            rollover_size_bytes=d.get("rollover_size_bytes", 128 * 1024 * 1024),
            timestamp_aggregation_timeout_ms=d.get("timestamp_aggregation_timeout_ms", 0),
        )


@dataclass(frozen=True)
class KeyValueTableConfiguration:
    """Reference: KeyValueTableConfiguration (partitionCount, key lengths)."""

    partition_count: int = 4
    primary_key_length: int = 8
    secondary_key_length: int = 0


@dataclass(frozen=True)
class ReaderGroupConfig:
    """Reference: ReaderGroupConfig — start/end cuts + retention role."""

    start_cut: dict[int, int] | None = None  # None = head
    end_cut: dict[int, int] | None = None  # None = unbounded
    retention_type: str = "NONE"  # NONE | MANUAL | AUTOMATIC (StreamDataRetention)
