"""pravega_spark — a PySpark-native streaming-storage + analytics engine.

Re-expresses the capabilities of pravega/pravega (streams with routing-key
ordering, StreamCuts, reader groups, transactions, key-value tables,
state synchronizers, auto-scaling, retention, watermarks) on top of
Apache Spark DataFrames, Parquet, and Structured Streaming — plus an
LLM-data-pipeline operator layer (dedup, similarity search, text
analysis, multimodal columns) the reference does not have.

Design (see SURVEY.md):
  - data plane   = Parquet tables laid out ``stream/segment_id=N/*.parquet``
                   so Catalyst partition-prunes StreamCut-bounded reads;
  - control plane = tiny JSON metadata documents under ``_metadata/``
                   (streams, epochs, segment tails, streamcuts, txns);
  - consumption  = batch DataFrame reads between StreamCuts and a
                   Structured-Streaming-shaped tailing reader;
  - everything declarative-first: built-in ``pyspark.sql.functions``;
    Pandas UDFs only where semantics demand imperative code.
"""

from pravega_spark.config import (
    KeyValueTableConfiguration,
    ReaderGroupConfig,
    RetentionPolicy,
    ScalingPolicy,
    StreamConfiguration,
)
from pravega_spark.errors import (
    BadKeyVersionException,
    ConditionalCheckFailedException,
    StreamNotFoundException,
    StreamSealedException,
    TruncatedDataException,
    TxnFailedException,
)
from pravega_spark.session import get_spark
from pravega_spark.store import StreamStore
from pravega_spark.streamcut import StreamCut

__all__ = [
    "BadKeyVersionException",
    "ConditionalCheckFailedException",
    "KeyValueTableConfiguration",
    "ReaderGroupConfig",
    "RetentionPolicy",
    "ScalingPolicy",
    "StreamConfiguration",
    "StreamCut",
    "StreamNotFoundException",
    "StreamSealedException",
    "StreamStore",
    "TruncatedDataException",
    "TxnFailedException",
    "get_spark",
]
