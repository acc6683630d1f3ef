"""StreamCut: a consistent position vector over a stream.

Reference: ``client/.../stream/impl/StreamCutImpl.java:56-63`` — a
``Map<Segment, offset>`` covering the whole key space. Here offsets are
event indexes (dense per segment, assigned at commit time by the writer),
so StreamCut algebra is integer arithmetic over ``{segment_id: offset}``.

``UNBOUNDED`` mirrors ``StreamCut.UNBOUNDED``: head when used as a start,
tail when used as an end.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field


@dataclass(frozen=True)
class StreamCut:
    positions: dict[int, int] = field(default_factory=dict)
    unbounded: bool = False

    UNBOUNDED: "StreamCut" = None  # set below

    def to_json(self) -> str:
        return json.dumps(
            {"unbounded": self.unbounded, "positions": {str(k): v for k, v in self.positions.items()}},
            sort_keys=True,
        )

    @staticmethod
    def from_json(s: str) -> "StreamCut":
        d = json.loads(s)
        return StreamCut({int(k): v for k, v in d.get("positions", {}).items()}, d.get("unbounded", False))

    @staticmethod
    def of(positions: dict[int, int]) -> "StreamCut":
        return StreamCut(dict(positions))

    def offset_for(self, segment_id: int, default: int = 0) -> int:
        return self.positions.get(segment_id, default)

    def covers_before(self, other: "StreamCut") -> bool:
        """True if self <= other on every shared segment (partial order)."""
        if self.unbounded or other.unbounded:
            return True
        return all(off <= other.positions[seg] for seg, off in self.positions.items() if seg in other.positions)

    def distance_to(self, other: "StreamCut") -> int:
        """Total events between two cuts on shared segments.

        Reference: ``StreamManager.getDistanceBetweenTwoStreamCuts``
        (admin/StreamManager.java:261) — bytes there, events here.
        """
        segs = set(self.positions) | set(other.positions)
        return sum(other.positions.get(s, 0) - self.positions.get(s, 0) for s in segs)


StreamCut.UNBOUNDED = StreamCut(unbounded=True)
