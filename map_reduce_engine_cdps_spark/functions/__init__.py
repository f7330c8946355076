from map_reduce_engine_cdps_spark.functions import expressions, text, vectors

__all__ = ["expressions", "text", "vectors"]
