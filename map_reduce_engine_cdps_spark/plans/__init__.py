from map_reduce_engine_cdps_spark.plans.registry import ORACLE_SQL, QUERIES, get_query

__all__ = ["ORACLE_SQL", "QUERIES", "get_query"]
