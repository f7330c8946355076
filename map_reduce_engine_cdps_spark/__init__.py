"""PySpark-native analytics engine with the capability surface of
PeterSheeper/map-reduce-engine-cdps (see SURVEY.md).

Brand-new Spark-first design: the reference's master/worker/shuffle
plumbing (reference engine/master.py, engine/worker.py) is subsumed by
Spark itself; this package re-creates the *query capabilities* — the
operators its engine and task library compute — as a library of
composable DataFrame transforms, plus a thin RDD compatibility shim for
the reference's 4-hook (init/map/shuffle/reduce) programming model.
"""

from map_reduce_engine_cdps_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
