from pravega_spark.sources.bucketed import bucketed_table
from pravega_spark.sources.bucketing import bucketize, is_shuffle_free_join
from pravega_spark.sources.tables import load_table, register_views

__all__ = ["bucketed_table", "bucketize", "is_shuffle_free_join", "load_table", "register_views"]
