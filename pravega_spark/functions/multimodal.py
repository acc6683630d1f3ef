"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Pipeline shape for 100 TB multimodal training data:
  - media rides as a ``binary`` column (or an out-of-line blob pointer
    for large assets — see bytestream.py) next to typed metadata
    (modality, mime, width/height/duration);
  - decode / feature-extract / resize / frame-sample run as
    Arrow-batched ``mapInPandas`` operators so each Python worker
    amortizes per-batch overhead and partitions stream independently;
  - heavy codecs (PIL/ffmpeg/torchaudio) are NOT in this container:
    the decode kernel defaults to a deterministic fake behind
    ``set_decoder``, while schema, batching, partitioning and UDF
    signatures — the Spark-side plumbing — are real and tested. Two
    REAL pure-stdlib codecs (PNG via zlib with full scanline
    unfiltering, WAV via the wave module) live in
    ``pravega_spark.functions.codecs`` and are proven end-to-end
    through this kernel by tests/test_codecs.py.

The fake decoder derives pixel/sample statistics from the bytes
deterministically, so downstream operators (stats, resize bookkeeping,
frame sampling) have stable testable outputs.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, modality string, mime string, data binary, "
    "width int, height int, duration_ms int"
)

_FEATURE_SCHEMA = (
    "media_id long, modality string, n_bytes long, checksum string, "
    "mean_byte double, feature array<float>"
)

_FRAME_SCHEMA = "media_id long, frame_idx int, frame_checksum string"


def _fake_decode(data: bytes) -> dict:
    """Deterministic stand-in for a real codec (no image libs here)."""
    import hashlib

    h = hashlib.md5(data or b"").hexdigest()
    return {
        "checksum": h,
        "mean_byte": (sum(data) / len(data)) if data else 0.0,
        "feature": [int(h[i : i + 2], 16) / 255.0 for i in range(0, 16, 2)],
    }


_decoder: Callable[[bytes], dict] = _fake_decode


def set_decoder(fn: Callable[[bytes], dict]) -> None:
    """Swap in a real decoder (PIL/ffmpeg wrapper) in richer images."""
    global _decoder
    _decoder = fn


def attach_media(df: DataFrame, id_col: str, payload_col: str, modality: str, mime: str) -> DataFrame:
    """Wrap any binary column into the canonical media schema."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(modality).alias("modality"),
        F.lit(mime).alias("mime"),
        F.col(payload_col).cast("binary").alias("data"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )


def extract_features(df: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Decode + featurize each asset (mapInPandas, Arrow-batched).

    Real codec plugs in via set_decoder; the distributed shape (schema,
    per-partition batching, no shuffle) is independent of the codec.
    """
    # capture the CURRENT decoder by value: the kernel is pickled to
    # executor Python workers, where this module is imported fresh — a
    # late global lookup there would silently resolve to the default
    # fake and ignore every set_decoder() made on the driver
    decoder = _decoder

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            recs = []
            # zip over the needed columns, not iterrows: iterrows boxes
            # every column into a per-row Series — an order of magnitude
            # of pure overhead on multi-million-asset scans
            for mid, mod, data in zip(pdf["media_id"], pdf["modality"], pdf["data"]):
                data = bytes(data) if data is not None else b""
                d = decoder(data)
                recs.append(
                    {
                        "media_id": mid,
                        "modality": mod,
                        "n_bytes": len(data),
                        "checksum": d["checksum"],
                        "mean_byte": d["mean_byte"],
                        "feature": d["feature"],
                    }
                )
            yield pd.DataFrame(recs)

    return df.mapInPandas(kernel, schema=_FEATURE_SCHEMA)


def sample_frames(df: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """Frame-sampling shape for video: emit one row per sampled frame.

    With a real codec this seeks keyframes; the fake samples the byte
    stream at fixed strides — the fan-out (1 asset → N frames) and
    partition behavior are what matter for the pipeline.
    """

    def kernel(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in batches:
            recs = []
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                data = bytes(data) if data is not None else b""
                for i, off in enumerate(range(0, max(len(data), 1), every_n_bytes)):
                    chunk = data[off : off + every_n_bytes]
                    recs.append(
                        {
                            "media_id": mid,
                            "frame_idx": i,
                            "frame_checksum": hashlib.md5(chunk).hexdigest(),
                        }
                    )
            yield pd.DataFrame(recs)

    return df.mapInPandas(kernel, schema=_FRAME_SCHEMA)


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize bookkeeping: real pixel work needs a codec (gated), but
    metadata propagation (the catalyst-visible part) is real."""
    return df.withColumn("width", F.lit(width)).withColumn("height", F.lit(height))
