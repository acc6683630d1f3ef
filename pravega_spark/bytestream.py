"""Byte streams: raw single-segment byte I/O (SURVEY §2.1 W8 / §2.2 R6).

Reference: ``ByteStreamWriter`` (append/flush/closeAndSeal/
truncateDataBefore, client/.../byteStream/ByteStreamWriter.java:58-130)
and ``ByteStreamReader`` (seek/read/skip/available/fetchTailOffset,
ByteStreamReader.java:40-149).

Spark-native: bytes land as chunk files with a JSON manifest mapping
``offset_start → chunk``; offsets are byte-exact. Chunks make the
stream readable as a DataFrame via ``spark.read.format("binaryFile")``
and give truncation a file-drop fast path (whole chunks below the new
head are deleted; the head chunk keeps a logical head offset).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession

from pravega_spark import fsio

from pravega_spark.errors import StreamSealedException, TruncatedDataException


class ByteStream:
    def __init__(self, root: str, scope: str, name: str):
        self.dir = fsio.join(root, "bytestreams", scope, name)
        fsio.makedirs(self.dir)
        self.manifest_path = fsio.join(self.dir, "manifest.json")

    def _manifest(self) -> dict:
        return fsio.read_json(
            self.manifest_path, {"chunks": [], "head": 0, "tail": 0, "sealed": False}
        )

    def _save(self, m: dict) -> None:
        fsio.write_json_atomic(self.manifest_path, m)

    def _locked(self):
        """Manifest mutations are read-modify-write: two writers (or a
        write racing truncate) would otherwise clobber each other's
        manifest and lose ACKNOWLEDGED chunks — the same reason every
        stream/KVT commit runs under fsio.locked."""
        return fsio.locked(fsio.join(self.dir, "manifest.lock"))


class ByteStreamWriter(ByteStream):
    def write(self, data: bytes) -> int:
        """Append; returns the offset of the first byte written."""
        with self._locked():
            m = self._manifest()
            if m["sealed"]:
                raise StreamSealedException("byte stream sealed")
            start = m["tail"]
            chunk = f"chunk-{start:020d}-{uuid.uuid4().hex[:8]}.bin"
            fsio.write_bytes(fsio.join(self.dir, chunk), data)
            m["chunks"].append({"start": start, "len": len(data), "file": chunk})
            m["tail"] = start + len(data)
            self._save(m)
            return start

    def flush(self) -> None:  # durability is per-write (atomic manifest)
        pass

    def close_and_seal(self) -> None:
        with self._locked():
            m = self._manifest()
            m["sealed"] = True
            self._save(m)

    def truncate_data_before(self, offset: int) -> None:
        """Drop whole chunks below ``offset``; head becomes ``offset``."""
        with self._locked():
            m = self._manifest()
            keep = []
            for c in m["chunks"]:
                if c["start"] + c["len"] <= offset:
                    fsio.remove(fsio.join(self.dir, c["file"]))
                else:
                    keep.append(c)
            m["chunks"] = keep
            m["head"] = max(m["head"], offset)
            self._save(m)


class ByteStreamReader(ByteStream):
    def fetch_tail_offset(self) -> int:
        return self._manifest()["tail"]

    def fetch_head_offset(self) -> int:
        return self._manifest()["head"]

    def available(self, offset: int) -> int:
        return self.fetch_tail_offset() - offset

    def read(self, offset: int, length: int) -> bytes:
        """Read ``length`` bytes from ``offset`` (seek+read)."""
        m = self._manifest()
        if offset < m["head"]:
            raise TruncatedDataException(f"offset {offset} < head {m['head']}")
        end = min(offset + length, m["tail"])
        out = bytearray()
        for c in m["chunks"]:
            lo, hi = c["start"], c["start"] + c["len"]
            if hi <= offset or lo >= end:
                continue
            out += fsio.read_bytes_range(
                fsio.join(self.dir, c["file"]), max(0, offset - lo), min(hi, end) - max(lo, offset)
            )
        return bytes(out)

    def as_dataframe(self, spark: SparkSession) -> DataFrame:
        """Chunks as a DataFrame (spark binaryFile source) for bulk
        processing of the raw byte tier."""
        return spark.read.format("binaryFile").load(fsio.join(self.dir, "chunk-*.bin"))
