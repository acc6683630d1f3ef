"""Custom PySpark DataSource exposing streams to read/readStream.

The Spark-4 Python data source API (pyspark.sql.datasource) is the
idiomatic replacement for the reference's reader-group machinery
(SURVEY §2.2 R1-R3):

  - streaming offsets = StreamCut vectors ``{segment_id: offset}`` —
    Structured Streaming checkpoints them exactly like the reference's
    reader-group checkpoints persist positions;
  - ``partitions(start, end)`` yields one InputPartition per segment
    slice → Spark tasks ARE the reader group (exactly-one-task-per-
    segment; rebalancing is the scheduler's job, replacing
    ReaderGroupStateManager's distance-to-tail protocol);
  - per-key order holds because a partition reads one segment in
    offset order and a routing key lives in exactly one live segment.

Reads go through pyarrow on the executors with offset-range filters —
parquet row-group stats prune, so a tail read touches only recent
files.

Options: ``root``, ``scope``, ``stream``, optional ``start_cut`` /
``end_cut`` (JSON StreamCuts — end_cut makes a *bounded* stream, the
BoundedStreamReaderTest semantics), ``max_events_per_trigger`` (source
rate limiting, the reference's read throttling).
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# fixed envelope the source exposes; payload carries the event bytes
# (typed columns are lifted after read via serializers / from_json)
ENVELOPE = StructType(
    [
        StructField("routing_key", StringType()),
        StructField("segment_id", LongType()),
        StructField("offset", LongType()),
        StructField("event_time", TimestampType()),
        StructField("ingest_time", TimestampType()),
        StructField("payload", BinaryType()),
    ]
)


class SegmentSlice(InputPartition):
    def __init__(self, path: str, segment_id: int, start: int, end: int,
                 files: list[str] | None = None):
        self.path = path
        self.segment_id = segment_id
        self.start = start
        self.end = end
        # manifest: committed files for this segment (relative to path).
        # None = pre-manifest stream (read the whole segment dir).
        self.files = files


# fat record batches per yield: each batch crossing the Python-worker →
# JVM boundary pays per-batch Arrow IPC + conversion overhead, so a
# slice of N small file-chunks must NOT surface as N small batches
_BATCH_ROWS = 131_072


def _read_slice_table(sl: SegmentSlice):
    """One segment slice as a single normalized Arrow table (or None).

    Shared by the executor-side streaming read AND the driver-side pump
    fast path (streaming/sink.py): the slice is materialized as one
    table, columns normalized table-wide (one cast per column, not per
    chunk), chunks combined. Row order = manifest file order = offset
    order, which carries the per-key order contract.
    """
    import pyarrow as pa
    import pyarrow.dataset as ds

    from pravega_spark import fsio

    # URI roots (object stores, fsio-registered filesystems) resolve to
    # a pyarrow filesystem + normalized path; local stays on the os
    # fast path. ds.dataset(filesystem=None) means "infer local".
    fs, base = fsio._split(sl.path)
    join = (lambda *p: "/".join(x.rstrip("/") for x in p)) if fs is not None else os.path.join
    seg_dir = join(base, f"segment_id={sl.segment_id}")
    if sl.files is not None:
        paths = [join(base, f) for f in sl.files]
        if not paths:
            return None
        dataset = ds.dataset(paths, format="parquet", filesystem=fs)
    else:
        # pre-manifest stream: read the whole segment directory
        if fs is not None:
            from pyarrow import fs as pafs

            present = fs.get_file_info(seg_dir).type == pafs.FileType.Directory
        else:
            present = os.path.isdir(seg_dir)
        if not present:
            return None
        dataset = ds.dataset(seg_dir, format="parquet", filesystem=fs)
    flt = (ds.field("offset") >= sl.start) & (ds.field("offset") < sl.end)
    names = [f.name for f in ENVELOPE.fields]
    have = set(dataset.schema.names)
    cols = [n for n in names if n in have and n != "segment_id"]
    table = dataset.to_table(filter=flt, columns=cols)
    n = table.num_rows
    if n == 0:
        return None
    want = {
        "routing_key": pa.string(),
        "offset": pa.int64(),
        "event_time": pa.timestamp("us"),
        "ingest_time": pa.timestamp("us"),
        "payload": pa.binary(),
    }
    arrays, fields = [], []
    for f in ENVELOPE.fields:
        if f.name == "segment_id":
            # constant column, built without a Python-list round trip
            arrays.append(pa.nulls(n, pa.int64()).fill_null(sl.segment_id))
            fields.append(pa.field("segment_id", pa.int64()))
        elif f.name in table.schema.names:
            col = table.column(f.name)
            typ = want.get(f.name)
            if f.name == "payload" and not pa.types.is_binary(col.type):
                col = col.cast(pa.binary())
            elif typ is not None and col.type != typ and f.name != "routing_key":
                col = col.cast(typ)
            arrays.append(col)
            fields.append(pa.field(f.name, col.type))
        else:
            arrays.append(pa.nulls(n, type=want[f.name]))
            fields.append(pa.field(f.name, want[f.name]))
    return pa.Table.from_arrays(arrays, schema=pa.schema(fields)).combine_chunks()


def _read_slice(sl: SegmentSlice):
    """Executor-side: the slice table re-emitted as ≤``_BATCH_ROWS``-row
    record batches (fat batches — a slice of N small commit files must
    not cross the Python-worker → JVM boundary as N small batches)."""
    out = _read_slice_table(sl)
    if out is None:
        return
    yield from out.to_batches(max_chunksize=_BATCH_ROWS)


def _load_segments(root: str, scope: str, stream: str) -> dict[str, dict]:
    # fsio (local or pyarrow.fs) — this runs inside data source workers
    # where no JVM is available, so object-store roots must not need py4j
    from pravega_spark import fsio

    doc = fsio.read_json(fsio.join(root, "_metadata", scope, stream, "segments.json"), {})
    return doc["segments"] if "segments" in doc else doc


def _load_tails(root: str, scope: str, stream: str) -> dict[int, int]:
    return {int(k): v["tail_offset"] for k, v in _load_segments(root, scope, stream).items()}


def _load_heads(root: str, scope: str, stream: str) -> dict[int, int]:
    return {int(k): v["head_offset"] for k, v in _load_segments(root, scope, stream).items()}


def _load_files(root: str, scope: str, stream: str,
                only_sids: set[int] | None = None) -> dict[int, list[str] | None]:
    """Per-segment committed-file manifest; None = pre-manifest stream.

    Shard resolution delegates to ``MetadataStore.segment_files`` (pure
    fsio/stdlib — constructible inside data source workers), wrapped in
    the lockless doc→shard retry: a concurrent commit GCs the old shard
    right after its doc flip, so a missing shard means OUR doc snapshot
    is stale — re-read and retry; silently treating a non-empty segment
    as empty would skip committed events in a planned micro-batch.

    ``only_sids`` restricts resolution to the segments a plan actually
    touches: per-trigger planning then issues O(active segments)
    metadata reads, not O(all segments) — on an object-store root with
    hundreds of idle segments that is the difference between a few GETs
    per trigger and hundreds."""
    import time as _time

    from pravega_spark.errors import ConcurrentModificationException
    from pravega_spark.metadata import MetadataStore

    ms = MetadataStore(root)
    last: Exception | None = None
    for attempt in range(5):
        out: dict[int, list[str] | None] = {}
        try:
            for k, v in _load_segments(root, scope, stream).items():
                if only_sids is not None and int(k) not in only_sids:
                    continue
                if "files" in v or "chain" in v or v.get("manifest") is not None:
                    out[int(k)] = ms.segment_files(scope, stream, k, v)
                else:
                    out[int(k)] = None  # pre-manifest: read the whole dir
            return out
        except ConcurrentModificationException as e:
            last = e
            _time.sleep(0.05 * (attempt + 1))
    raise last


def read_offsets_log(checkpoint_dir: str, batch_id: int) -> dict[str, int] | None:
    """The single-source offset vector Spark logged for ``batch_id`` —
    THE one validated parser of the offsets-log format (version line,
    batch-metadata line, then ONE line per source). Exactly one source
    line is required: in a multi-source query a batch cannot be
    attributed to one stream slice, and blindly taking the last line
    would return some OTHER source's offsets. Reads via fsio so
    checkpoints on URI roots work too."""
    from pravega_spark import fsio

    text = fsio.read_text(fsio.join(checkpoint_dir, "offsets", str(batch_id)))
    if text is None:
        return None
    try:
        lines = [ln for ln in text.splitlines() if ln.strip()]
        if len(lines) != 3:
            return None
        off = json.loads(lines[2])
        if not isinstance(off, dict):
            return None
        return {str(k): int(v) for k, v in off.items()}
    except (ValueError, json.JSONDecodeError):
        return None


def logged_batch_ids(checkpoint_dir: str, subdir: str) -> list[int]:
    """Sorted batch ids present in a checkpoint log dir (offsets/
    commits), via fsio so URI-rooted checkpoints list correctly."""
    from pravega_spark import fsio

    return sorted(
        int(name)
        for name in fsio.list_files_recursive(fsio.join(checkpoint_dir, subdir))
        if name.isdigit()
    )


def bound_tails_by_cut(root: str, scope: str, stream: str,
                       tails: dict[int, int], end_positions: dict) -> dict[int, int]:
    """Cap per-segment tails at a bounded-read end cut. A segment the
    cut does not mention is either a PREDECESSOR (sealed before the cut
    — entirely before it, read fully) or a SUCCESSOR created by a scale
    after the cut (entirely after it, read NOTHING). Epoch records
    decide which: segments first appearing in an epoch newer than every
    cut segment's epoch are successors. Defaulting them to their tail
    would leak post-cut events into a bounded read
    (BoundedStreamReaderTest semantics). Shared by the source's
    latestOffset and ReaderGroup.drain's target computation."""
    ends = {str(k): int(v) for k, v in end_positions.items()}
    missing = [k for k in tails if str(k) not in ends]
    if missing:
        from pravega_spark import fsio

        epochs = fsio.read_json(
            fsio.join(root, "_metadata", scope, stream, "epochs.json"), []
        )
        first_epoch: dict[int, int] = {}
        for rec in epochs:
            for seg in rec.get("segments", []):
                first_epoch.setdefault(int(seg["segment_id"]), int(rec["epoch"]))
        cut_epoch = max((first_epoch.get(int(k), 0) for k in ends), default=0)
        for k in missing:
            if first_epoch.get(int(k), 1 << 62) > cut_epoch:
                ends[str(k)] = 0  # successor: entirely after the cut
            # predecessor: leave unmentioned -> full tail below
    return {k: min(v, ends.get(str(k), v)) for k, v in tails.items()}


class PravegaStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self.root = options["root"]
        self.scope = options["scope"]
        self.stream = options["stream"]
        self.path = os.path.join(self.root, "streams", self.scope, self.stream)
        self.max_per_trigger = int(options.get("max_events_per_trigger", 0) or 0)
        self.checkpoint_dir = options.get("checkpoint_dir")
        self.start_cut = json.loads(options["start_cut"]) if options.get("start_cut") else None
        self.end_cut = json.loads(options["end_cut"]) if options.get("end_cut") else None
        # high-water mark of offsets this instance has handed to Spark;
        # basis for rate limiting. MONOTONIC: only advanced via max-merge
        # (_advance) — initialOffset can be called after latestOffset on
        # the same instance, and overwriting with the (lower) head vector
        # would make the next latestOffset regress below the committed
        # position, which Spark then checkpoints → re-read duplicates.
        # None until first observation: that first latestOffset is then
        # uncapped (a safe catch-up batch). Capping must happen in
        # latestOffset, never in partitions(), or Spark checkpoints the
        # uncapped tail and the capped-out rows are silently lost.
        self._pos: dict[str, int] | None = None

    def _advance(self, off: dict) -> None:
        if self._pos is None:
            self._pos = {}
        for k, v in off.items():
            k = str(k)
            v = int(v)
            if v > self._pos.get(k, -1):
                self._pos[k] = v

    # offsets are plain dicts {str(segment_id): offset} — Spark JSON-
    # serializes them into the checkpoint (R3: checkpoint = StreamCut)
    def initialOffset(self) -> dict:
        if self.start_cut is not None:
            off = {str(k): int(v) for k, v in self.start_cut.get("positions", {}).items()}
        else:
            off = {str(k): int(v) for k, v in _load_heads(self.root, self.scope, self.stream).items()}
        self._advance(off)
        return off

    def _seed_from_checkpoint(self) -> None:
        """On restart Spark never tells a fresh reader where the query
        left off (initialOffset is skipped, partitions() comes after
        latestOffset), so without this the first latestOffset plans an
        unbounded catch-up batch. Seed the high-water mark from the
        newest entry in the query's own offsets log (last line = this
        source's JSON offset dict, same format committed_positions
        parses)."""
        try:
            batches = logged_batch_ids(self.checkpoint_dir, "offsets")
            if not batches:
                return
            off = read_offsets_log(self.checkpoint_dir, batches[-1])
            if off is not None:  # None: multi-source/partial — stay uncapped
                self._advance(off)
        except OSError:
            return  # no/partial checkpoint: first batch stays uncapped

    def latestOffset(self) -> dict:
        if self._pos is None and self.max_per_trigger and self.checkpoint_dir:
            self._seed_from_checkpoint()
        tails = _load_tails(self.root, self.scope, self.stream)
        if self.end_cut is not None:
            tails = self._bound_by_end_cut(tails)
        latest = {str(k): int(v) for k, v in tails.items()}
        if self.max_per_trigger and self._pos is not None:
            base = self._pos
            latest = {
                sid: min(hi, int(base.get(sid, 0)) + self.max_per_trigger)
                if hi > int(base.get(sid, 0))
                else hi
                for sid, hi in latest.items()
            }
        self._advance(latest)
        return latest

    def _bound_by_end_cut(self, tails: dict[int, int]) -> dict[int, int]:
        return bound_tails_by_cut(
            self.root, self.scope, self.stream, tails,
            self.end_cut.get("positions", {}),
        )

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        self._advance(end)  # authoritative plan boundary
        needed = {
            int(sid) for sid, hi in end.items() if int(hi) > int(start.get(sid, 0))
        }
        # O(active segments) metadata reads per trigger: idle segments'
        # manifest shards are never touched
        files = _load_files(self.root, self.scope, self.stream, only_sids=needed) if needed else {}
        out = []
        for sid, hi in end.items():
            lo = int(start.get(sid, 0))
            hi = int(hi)
            if hi > lo:
                out.append(SegmentSlice(self.path, int(sid), lo, hi, files.get(int(sid))))
        return out or [SegmentSlice(self.path, -1, 0, 0)]

    def read(self, partition: SegmentSlice) -> Iterator:
        if partition.segment_id < 0:
            return iter(())
        return _read_slice(partition)

    def commit(self, end: dict) -> None:
        self._advance(end)  # positions live in the streaming checkpoint

    def stop(self) -> None:
        pass


class PravegaBatchReader(DataSourceReader):
    """Batch tier of the same source (R5): full or cut-bounded scan."""

    def __init__(self, options: dict):
        self.stream_reader = PravegaStreamReader(options)
        self.stream_reader.max_per_trigger = 0  # rate limit is stream-only

    def partitions(self) -> Sequence[InputPartition]:
        start = self.stream_reader.initialOffset()
        end = self.stream_reader.latestOffset()
        return self.stream_reader.partitions(start, end)

    def read(self, partition: SegmentSlice) -> Iterator:
        return self.stream_reader.read(partition)


class PravegaStreamDataSource(DataSource):
    """spark.read/readStream format ``pravega_stream``."""

    @classmethod
    def name(cls) -> str:
        return "pravega_stream"

    def schema(self) -> StructType:
        return ENVELOPE

    def reader(self, schema: StructType) -> DataSourceReader:
        return PravegaBatchReader(self.options)

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return PravegaStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(PravegaStreamDataSource)
