"""Multimodal-column queries: the opaque-binary media plane, oracle-checked.

The engine's multimodal story (functions/multimodal.py) treats media as
``binary`` + typed metadata and runs decode/featurize/frame-sample as
Arrow-batched ``mapInPandas`` kernels. These queries drive the REAL
kernels — the documents table's text encoded to bytes stands in for
image/audio payloads (the codecs aren't in this container; the fake
decoder is deterministic) — and the DuckDB oracles recompute the same
checksums/byte-math in SQL, so the Python plumbing (schema, batching,
fan-out) is verified end-to-end, not just smoke-tested.

Scale notes: both kernels are per-partition map operations — no
shuffle, no driver collect; fan-out (1 asset → N frames) happens
executor-side inside the Arrow batch. At 100 TB the only knobs are
partition size (`maxPartitionBytes`) and per-batch row caps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pravega_spark.functions.multimodal import attach_media, extract_features, sample_frames
from pravega_spark.sources import load_table

_FRAME_STRIDE = 64
_N_MEDIA = 40  # doc_id < 40 keeps frame fan-out bounded in the gate


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < _N_MEDIA)
    return attach_media(
        docs.withColumn("payload", F.encode("text", "UTF-8")),
        id_col="doc_id",
        payload_col="payload",
        modality="image",
        mime="application/octet-stream",
    )


def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode+featurize via the mapInPandas kernel; project the
    SQL-checkable outputs (byte count + content checksum)."""
    feats = extract_features(_media(spark, sf_dir))
    return feats.select("media_id", "modality", "n_bytes", "checksum").orderBy("media_id")


DECODE_SQL = f"""
SELECT doc_id AS media_id, 'image' AS modality,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS checksum
FROM documents WHERE doc_id < {_N_MEDIA}
ORDER BY media_id
"""


def multimodal_frame_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling via the mapInPandas kernel: one row per 64-byte
    "frame", checksum per frame (the video keyframe-sampling shape)."""
    return sample_frames(_media(spark, sf_dir), every_n_bytes=_FRAME_STRIDE).orderBy(
        "media_id", "frame_idx"
    )


# documents are pure ASCII (verified: octet_length(encode(text)) ==
# length(text) for every row), so char-based substring == byte slicing
FRAMES_SQL = f"""
WITH m AS (SELECT doc_id, text FROM documents WHERE doc_id < {_N_MEDIA}),
idx AS (
  SELECT doc_id, text,
         unnest(range(0, greatest(CAST(ceil(length(text) / {_FRAME_STRIDE}.0) AS INT), 1))) AS frame_idx
  FROM m
)
SELECT doc_id AS media_id, CAST(frame_idx AS INT) AS frame_idx,
       md5(substring(text, frame_idx * {_FRAME_STRIDE} + 1, {_FRAME_STRIDE})) AS frame_checksum
FROM idx
ORDER BY media_id, frame_idx
"""


QUERIES = {
    "multimodal_decode_features": multimodal_decode_features,
    "multimodal_frame_samples": multimodal_frame_samples,
}

ORACLES = {
    "multimodal_decode_features": DECODE_SQL,
    "multimodal_frame_samples": FRAMES_SQL,
}
