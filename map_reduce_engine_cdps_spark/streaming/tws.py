"""Per-user sessionization on Spark 4's ``transformWithStateInPandas``
(the successor stateful API to ``applyInPandasWithState``): typed state
variables (ValueState) on the RocksDB state store provider.

Same operator semantics as streaming/stateful.py — session count
increments when the per-user event gap exceeds 30 minutes — and
oracle-checked against the SAME batch lag-window SQL, so the two
stateful APIs and the batch formulation must all agree.

Scale: ValueState rows live in per-partition RocksDB instances keyed by
the grouping key — state far larger than executor memory spills to
local SSD instead of OOMing, which is why this (not the in-memory
HDFS-backed store) is the 100 TB configuration. Each microbatch touches
only the keys present in it; changelog checkpointing ships deltas, not
full snapshots.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from map_reduce_engine_cdps_spark.streaming.stateful import (
    SESSION_GAP_US,
    STREAMING_USER_SESSIONS_SQL,
)

def tws_available() -> bool:
    """transformWithStateInPandas launches a protobuf-speaking state
    server alongside the Python worker; without google.protobuf the
    driver worker crashes at query start. Gate, don't fail."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_sessions", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


class SessionCountProcessor(StatefulProcessor):
    """ValueState (n_sessions, last_us, n_events) per user_id."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState(
            "session", "n_sessions long, last_us long, n_events long"
        )

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues  # noqa: ANN001
    ) -> Iterator[pd.DataFrame]:
        n_sessions, last_us, n_events = (
            self._state.get() if self._state.exists() else (0, None, 0)
        )
        # Event-time order across ALL Arrow chunks of this group (per-user
        # volume is bounded, so the concat is safe — same reasoning as
        # stateful.py:_sessionize).
        chunks = [pdf["ts"].astype("int64") for pdf in rows]
        if chunks:
            for t in pd.concat(chunks).sort_values() // 1000:
                if last_us is None or t - last_us > SESSION_GAP_US:
                    n_sessions += 1
                last_us = int(t)
                n_events += 1
        self._state.update((n_sessions, last_us, n_events))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_sessions": [n_sessions],
                "n_events": [n_events],
            }
        )

    def close(self) -> None:
        pass


def tws_user_sessions(stream: DataFrame) -> DataFrame:
    return (
        stream.select("user_id", "ts")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=SessionCountProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


def run_tws_sessions(
    spark: SparkSession, sf_dir: str, table: str = "tws_sessions_out"
) -> DataFrame:
    from map_reduce_engine_cdps_spark.streaming.windows import (
        stream_events_from_parquet,
    )

    if not tws_available():
        raise NotImplementedError(
            "transformWithStateInPandas requires google.protobuf in the "
            "Python environment (absent in this container); use "
            "streaming/stateful.py's applyInPandasWithState sessionizer"
        )
    conf_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(conf_key, None)
    spark.conf.set(conf_key, ROCKSDB_PROVIDER)
    try:
        out = tws_user_sessions(stream_events_from_parquet(spark, sf_dir))
        q = (
            out.writeStream.format("memory")
            .queryName(table)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    finally:
        if prev is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prev)
    return spark.table(table)


def streaming_sessions_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry — latest (max) state emission per user equals the
    batch sessionization; shares STREAMING_USER_SESSIONS_SQL."""
    import pyspark.sql.functions as F

    sink = run_tws_sessions(spark, sf_dir)
    return sink.groupBy("user_id").agg(
        F.max("n_sessions").alias("n_sessions"),
        F.max("n_events").alias("n_events"),
    )


STREAMING_SESSIONS_TWS_SQL = STREAMING_USER_SESSIONS_SQL
