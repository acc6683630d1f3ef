"""Revisioned streams + StateSynchronizer (SURVEY §2.8).

Reference:
  - ``RevisionedStreamClient`` — CAS append at a Revision, read ranges,
    CAS'd mark (client/.../state/RevisionedStreamClient.java:55-99)
  - ``StateSynchronizer`` — replicated state = fold of updates over the
    revisioned stream, with compaction
    (client/.../state/StateSynchronizer.java:44-180,
    StateSynchronizerImpl.java)

Spark-native: a revisioned stream is a single-segment JSON log on disk
with optimistic concurrency — conditional append succeeds only when the
expected revision equals the current tail. This matches the reference's
single-segment conditional-append semantics (WireCommands
ConditionalAppend:633). State = driver-side fold (the state object is
small control-plane data — reader-group membership, checkpoints — not
data-plane scale); the *read model* of big event-sourced state lives in
the stream layer (see events_running_value / applyInPandasWithState in
streaming/).

Compaction mirrors StateSynchronizer.compact: write one snapshot update
at revision R, then truncate the log before R.
"""

from __future__ import annotations

import json
from collections.abc import Callable
from typing import Any

from pravega_spark import fsio
from pravega_spark.errors import ConditionalCheckFailedException


class RevisionedStreamClient:
    """Single-segment revisioned log with CAS appends."""

    def __init__(self, root: str, scope: str, name: str):
        self.path = fsio.join(root, "revisioned", scope, f"{name}.jsonl")
        self.mark_path = f"{self.path}.mark"
        fsio.makedirs(fsio.join(root, "revisioned", scope))

    # ---------------- revisions ----------------
    def _base(self) -> int:
        """Revisions truncated away (compaction floor)."""
        text = fsio.read_text(f"{self.path}.base")
        return int(text.strip() or 0) if text is not None else 0

    def _lines(self) -> list[str]:
        text = fsio.read_text(self.path)
        return text.splitlines(keepends=True) if text else []

    def fetch_latest_revision(self) -> int:
        lines = self._lines()
        if not lines:
            return self._base()
        return json.loads(lines[-1])["revision"]

    def fetch_oldest_revision(self) -> int:
        lines = self._lines()
        if not lines:
            return self._base()
        return json.loads(lines[0])["revision"] - 1

    def write_conditionally(self, expected_revision: int, value: Any) -> int:
        """CAS append: commit iff the log tail is exactly
        ``expected_revision``; returns the new revision.

        Single-writer-wins via atomic rename of the whole log file —
        correct for control-plane logs (small); raises
        ConditionalCheckFailedException on lost race like the reference
        returning null from writeConditionally.
        """
        lines = self._lines()
        current = json.loads(lines[-1])["revision"] if lines else self._base()
        if current != expected_revision:
            raise ConditionalCheckFailedException(
                f"expected revision {expected_revision}, log is at {current}"
            )
        entry = json.dumps({"revision": current + 1, "value": value})
        # atomic replace/PUT = the conditional commit point; a concurrent
        # writer that also passed the check will overwrite, so re-verify
        fsio.write_text_atomic(self.path, "".join(lines) + entry + "\n")
        if self.fetch_latest_revision() != current + 1:
            raise ConditionalCheckFailedException("lost append race")
        return current + 1

    def write_unconditionally(self, value: Any) -> int:
        while True:
            try:
                return self.write_conditionally(self.fetch_latest_revision(), value)
            except ConditionalCheckFailedException:
                continue

    def read_from(self, revision: int) -> list[tuple[int, Any]]:
        """Entries with revision > ``revision`` (RevisionedStreamClient.readFrom)."""
        out = []
        for line in self._lines():
            d = json.loads(line)
            if d["revision"] > revision:
                out.append((d["revision"], d["value"]))
        return out

    def read_range(self, from_revision: int, to_revision: int) -> list[tuple[int, Any]]:
        return [(r, v) for r, v in self.read_from(from_revision) if r <= to_revision]

    def truncate_to_revision(self, revision: int) -> None:
        """Drop entries at/below ``revision`` (compaction support)."""
        keep = self.read_from(revision)
        fsio.write_text_atomic(f"{self.path}.base", str(max(self._base(), revision)))
        fsio.write_text_atomic(
            self.path, "".join(json.dumps({"revision": r, "value": v}) + "\n" for r, v in keep)
        )

    # ---------------- mark (V4) ----------------
    def get_mark(self) -> int | None:
        doc = fsio.read_json(self.mark_path, None)
        return doc["revision"] if doc is not None else None

    def compare_and_set_mark(self, expected: int | None, new: int) -> bool:
        if self.get_mark() != expected:
            return False
        fsio.write_json_atomic(self.mark_path, {"revision": new})
        return True


class StateSynchronizer:
    """Optimistically-replicated shared state = fold over a revisioned log.

    ``update_state(fn)`` mirrors StateSynchronizer.updateState: fn sees
    the current state and returns updates; on CAS conflict we fetch and
    retry (the reference's optimistic loop).
    """

    def __init__(self, client: RevisionedStreamClient, initial_state: Any,
                 apply: Callable[[Any, Any], Any]):
        self.client = client
        self.initial_state = initial_state
        self.apply = apply
        self._state = initial_state
        self._revision = 0

    def fetch_updates(self) -> None:
        for rev, value in self.client.read_from(self._revision):
            if isinstance(value, dict) and value.get("__snapshot__"):
                self._state = value["state"]
            else:
                self._state = self.apply(self._state, value)
            self._revision = rev

    def get_state(self) -> Any:
        self.fetch_updates()
        return self._state

    def update_state(self, fn: Callable[[Any], list[Any]], max_retries: int = 64) -> Any:
        for _ in range(max_retries):
            self.fetch_updates()
            updates = fn(self._state)
            if not updates:
                return self._state
            try:
                rev = self._revision
                for u in updates:
                    rev = self.client.write_conditionally(rev, u)
            except ConditionalCheckFailedException:
                continue
            self.fetch_updates()
            return self._state
        raise ConditionalCheckFailedException("update_state retries exhausted")

    def compact(self) -> None:
        """Write a snapshot row, truncate history before it
        (StateSynchronizer.compact)."""
        self.fetch_updates()
        rev = self.client.write_conditionally(
            self._revision, {"__snapshot__": True, "state": self._state}
        )
        self.client.truncate_to_revision(rev - 1)
        self._revision = rev
