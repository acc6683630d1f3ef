"""Revisioned streams + StateSynchronizer (SURVEY §2.8).

Reference:
  - ``RevisionedStreamClient`` — CAS append at a Revision, read ranges,
    CAS'd mark (client/.../state/RevisionedStreamClient.java:55-99)
  - ``StateSynchronizer`` — replicated state = fold of updates over the
    revisioned stream, with compaction
    (client/.../state/StateSynchronizer.java:44-180,
    StateSynchronizerImpl.java)

Spark-native: a revisioned stream is a directory of one-file-per-
revision JSON documents. The conditional append (the reference's
``ConditionalAppend`` wire op, WireCommands.java:633) maps to an
ATOMIC exclusive create of ``rev-<n>.json`` — exactly one concurrent
writer can create a given revision, so the CAS contract holds under
races (local: O_CREAT|O_EXCL; object stores need a conditional-put
client, see fsio.create_exclusive). State = driver-side fold (the
state object is small control-plane data — reader-group membership,
checkpoints — not data-plane scale); the *read model* of big
event-sourced state lives in the stream layer (events_running_value /
applyInPandasWithState in streaming/).

Compaction mirrors StateSynchronizer.compact: write one snapshot update
at revision R, then truncate the log before R.
"""

from __future__ import annotations

import json
from collections.abc import Callable
from typing import Any

from pravega_spark import fsio
from pravega_spark.errors import ConditionalCheckFailedException


def _rev_file(n: int) -> str:
    return f"rev-{n:012d}.json"


class RevisionedStreamClient:
    """Single-segment revisioned log with atomic CAS appends."""

    def __init__(self, root: str, scope: str, name: str):
        self.dir = fsio.join(root, "revisioned", scope, name)
        self.mark_path = fsio.join(self.dir, "_mark.json")
        fsio.makedirs(self.dir)

    # ---------------- revisions ----------------
    def _base(self) -> int:
        """Revisions truncated away (compaction floor)."""
        text = fsio.read_text(fsio.join(self.dir, "_base"))
        return int(text.strip() or 0) if text is not None else 0

    def _revisions(self) -> list[int]:
        out = []
        for f in fsio.list_files_recursive(self.dir):
            if f.startswith("rev-") and f.endswith(".json"):
                out.append(int(f[4:-5]))
        return sorted(out)

    def fetch_latest_revision(self) -> int:
        revs = self._revisions()
        return revs[-1] if revs else self._base()

    def fetch_oldest_revision(self) -> int:
        revs = self._revisions()
        return revs[0] - 1 if revs else self._base()

    def write_conditionally(self, expected_revision: int, value: Any) -> int:
        """CAS append: commit iff the log tail is exactly
        ``expected_revision``; returns the new revision.

        The exclusive create of ``rev-<expected+1>`` IS the commit
        point — of N racing writers exactly one creates the file; the
        rest raise, like the reference returning null from
        writeConditionally.
        """
        current = self.fetch_latest_revision()
        if current != expected_revision:
            raise ConditionalCheckFailedException(
                f"expected revision {expected_revision}, log is at {current}"
            )
        payload = json.dumps({"revision": current + 1, "value": value}).encode("utf-8")
        if not fsio.create_exclusive(fsio.join(self.dir, _rev_file(current + 1)), payload):
            raise ConditionalCheckFailedException(f"lost append race at revision {current + 1}")
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
        for n in self._revisions():
            if n > revision:
                doc = fsio.read_json(fsio.join(self.dir, _rev_file(n)), None)
                if doc is not None:
                    out.append((n, doc["value"]))
        return out

    def read_range(self, from_revision: int, to_revision: int) -> list[tuple[int, Any]]:
        return [(r, v) for r, v in self.read_from(from_revision) if r <= to_revision]

    def truncate_to_revision(self, revision: int) -> None:
        """Drop entries at/below ``revision`` (compaction support)."""
        fsio.write_text_atomic(fsio.join(self.dir, "_base"), str(max(self._base(), revision)))
        for n in self._revisions():
            if n <= revision:
                fsio.remove(fsio.join(self.dir, _rev_file(n)))

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
            elif isinstance(value, dict) and "__batch__" in value:
                # one revision = one atomic multi-update batch
                for u in value["__batch__"]:
                    self._state = self.apply(self._state, u)
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
                # the WHOLE update list is one conditional append — a
                # multi-update batch is all-or-nothing, exactly like the
                # reference's single ConditionalAppend of the update
                # list. Writing them as N separate revisions would let a
                # mid-list CAS failure strand a committed prefix, and
                # the retry would re-apply it (double-counting).
                if len(updates) == 1:
                    self.client.write_conditionally(self._revision, updates[0])
                else:
                    self.client.write_conditionally(
                        self._revision, {"__batch__": list(updates)}
                    )
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
