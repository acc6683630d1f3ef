from pravega_spark.functions import multimodal, serializers, vectors

__all__ = ["multimodal", "serializers", "vectors"]
