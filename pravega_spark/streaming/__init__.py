from pravega_spark.streaming.datasource import PravegaStreamDataSource, register
from pravega_spark.streaming.reader_group import ReaderGroup
from pravega_spark.streaming.sink import write_stream_batch

__all__ = ["PravegaStreamDataSource", "ReaderGroup", "register", "write_stream_batch"]
