"""Structured Streaming wing (SURVEY.md §2.8/§7 step 8 — the reference
is strictly batch; this is the declared extension).

One transform, two execution modes: ``windowed_counts`` is written
against an unbounded-compatible plan (event-time tumbling window +
watermark), so the identical function serves the batch oracle-checked
query (plans/relational.py:tumbling_window_counts) and a real
``readStream`` pipeline. Tests run the stream from the same parquet via
file-source + memory-sink and assert equality with the batch result.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_engine_cdps_spark.sources.readers import load_table


def windowed_counts(events: DataFrame, window: str = "5 minutes",
                    watermark: str = "10 minutes") -> DataFrame:
    """Tumbling event-time window counts with late-data watermark."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", window).alias("win"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def stream_events_from_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events table (schema pinned from the
    batch read; ts arrives as nanos → converted like the batch path)."""
    batch = load_table(spark, sf_dir, "events")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # The file stream source requires a *directory*; expose the single
    # parquet file through a scratch dir of symlinks (testdata stays
    # untouched).
    stage = tempfile.mkdtemp(prefix="events_stream_")
    link = os.path.join(stage, "events.parquet")
    if not os.path.exists(link):
        os.symlink(os.path.abspath(f"{sf_dir}/events.parquet"), link)
    stream = spark.readStream.schema(raw_schema).parquet(stage)
    ts_type = dict(stream.dtypes).get("ts")
    if ts_type == "bigint":
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    elif ts_type == "timestamp_ntz":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    assert stream.schema == batch.schema
    return stream


def streaming_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming stateful exact-dedup: ``dropDuplicates`` over the
    (user_id, event_type) key — the streaming twin of batch DISTINCT,
    backed by the state store. Emits exactly the distinct key set, so it
    oracle-checks against plain ``SELECT DISTINCT``. At scale the state
    store is partitioned by the dedup key (one shuffle), and a real
    deployment bounds state with ``dropDuplicatesWithinWatermark``; the
    finite availableNow run here needs no eviction.
    """
    stream = stream_events_from_parquet(spark, sf_dir)
    out = stream.select("user_id", "event_type").dropDuplicates(
        ["user_id", "event_type"]
    )
    q = (
        out.writeStream.format("memory")
        .queryName("streaming_dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table("streaming_dedup_out")


STREAMING_DEDUP_EVENTS_SQL = """
SELECT DISTINCT user_id, event_type FROM events
"""


def streaming_segment_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join: the event stream joins the static
    customer dimension (broadcast — re-resolved per micro-batch, never
    shuffled against the stream), then windowed counts per market
    segment. The canonical streaming-ETL enrichment shape; at scale the
    static side refreshes via Delta/parquet re-read while the stream
    only ever shuffles on the aggregate keys.
    Oracle: the identical join + bucketed agg in batch SQL.
    """
    stream = stream_events_from_parquet(spark, sf_dir).withWatermark(
        "ts", "10 minutes"
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("user_id"), "c_mktsegment")
    )
    out = (
        stream.join(F.broadcast(cust), "user_id")
        .groupBy(F.window("ts", "15 minutes").alias("win"), F.col("c_mktsegment"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "c_mktsegment",
            "n",
            "sum_value",
        )
    )
    q = (
        out.writeStream.format("memory")
        .queryName("streaming_segment_counts_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table("streaming_segment_counts_out")


STREAMING_SEGMENT_COUNTS_SQL = """
SELECT strftime(to_timestamp(floor(epoch(ts) / 900) * 900)::TIMESTAMP,
                '%Y-%m-%d %H:%M:%S') AS window_start,
       c_mktsegment, count(*) AS n, round(sum(value), 2) AS sum_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY 1, 2
"""


def run_stream_to_memory(spark: SparkSession, sf_dir: str, table: str = "stream_out",
                         window: str = "5 minutes") -> DataFrame:
    """Drive the streaming pipeline to completion (availableNow) into a
    memory sink; returns the sink contents as a DataFrame."""
    stream = stream_events_from_parquet(spark, sf_dir)
    out = windowed_counts(stream, window=window)
    q = (
        out.writeStream.format("memory")
        .queryName(table)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(table)


def streaming_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: the real Structured Streaming path (file source →
    watermark → tumbling window → memory sink, availableNow trigger).
    Oracle-checked against the SAME DuckDB SQL as the batch twin
    (plans/relational.py:TUMBLING_WINDOW_COUNTS_SQL) — the streaming and
    batch plans must agree exactly."""
    return run_stream_to_memory(spark, sf_dir, table="streaming_window_counts_out")


def streaming_click_purchase_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join with watermarks: clicks joined to the
    purchases of the same user within ±1 h of event time — the streaming
    twin of the batch bucketed range join
    (plans/relational.py:click_purchase_within_1h), oracle-checked
    against the SAME DuckDB SQL, so the two execution models must agree
    pair-for-pair.

    Scale shape: both sides are keyed on user_id (one shuffle each into
    the join state store); the symmetric time-range predicate plus the
    watermark bound state retention to ~2 h of events per side. Without
    the time condition a stream-stream join would accumulate unbounded
    state — the range predicate is what makes it a streaming-legal join.
    """
    clicks = (
        stream_events_from_parquet(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("user_id"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    purchases = (
        stream_events_from_parquet(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        F.expr(
            """
            user_id = p_user_id AND
            p_ts BETWEEN c_ts - INTERVAL 1 HOUR AND c_ts + INTERVAL 1 HOUR
            """
        ),
        "inner",
    ).select(
        "user_id",
        "click_id",
        "purchase_id",
        F.round(
            (F.unix_micros("p_ts") - F.unix_micros("c_ts")) / 1e6, 2
        ).alias("gap_s"),
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("streaming_cp_join_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table("streaming_cp_join_out")


def streaming_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming windowed COUNT DISTINCT: watermark → sliding windows →
    exact distinct users per (window, type). Streaming aggregations
    reject COUNT(DISTINCT ...) directly; the canonical exact
    formulation keeps the per-window user set as aggregation state
    (collect_set) and emits its size — which is also the honest cost
    model: state is O(windows × types × users-in-window), exactly why
    the batch twin documents the HLL-sketch swap at 100 TB. Oracle:
    the SAME DuckDB SQL as the batch twin
    (plans/relational.py:SLIDING_DISTINCT_USERS_SQL), so both
    execution models must agree window-for-window."""
    stream = stream_events_from_parquet(spark, sf_dir).withWatermark(
        "ts", "10 minutes"
    )
    out = (
        stream.groupBy(
            F.window("ts", "10 minutes", "5 minutes").alias("win"),
            F.col("event_type"),
        )
        .agg(F.size(F.collect_set("user_id")).alias("n_users"))
        .select(
            F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_users",
        )
    )
    q = (
        out.writeStream.format("memory")
        .queryName("streaming_sliding_distinct_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table("streaming_sliding_distinct_out")


def streaming_trending_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending top-k: per tumbling hour, the 3 most frequent event
    types. The aggregation runs as a REAL stream (watermark + windowed
    count, complete mode into a memory sink); the rank is applied on
    the sink read — ranking over a streaming aggregate isn't allowed in
    one query, and sink-side ranking is the standard production shape
    (the dashboard query over the continuously-maintained agg table).
    Oracle-checked against the equivalent batch SQL.

    Scale: streaming state is O(open windows × event types); the rank
    runs over the compact agg output, never the event stream.
    """
    stream = stream_events_from_parquet(spark, sf_dir)
    agg = windowed_counts(stream, window="1 hour", watermark="10 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("trending_topk_agg")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    from pyspark.sql import Window as W

    sink = spark.table("trending_topk_agg")
    w = W.partitionBy("window_start").orderBy(F.desc("n"), F.asc("event_type"))
    return (
        sink.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("window_start", "event_type", "n", "rank")
    )


STREAMING_TRENDING_TOPK_SQL = """
WITH agg AS (
  SELECT strftime(to_timestamp(floor(epoch(ts) / 3600) * 3600)::TIMESTAMP,
                  '%Y-%m-%d %H:%M:%S') AS window_start,
         event_type, count(*) AS n
  FROM events GROUP BY 1, 2
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY window_start
                               ORDER BY n DESC, event_type ASC) AS rank
  FROM agg
)
SELECT window_start, event_type, n, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 3
"""
