"""Streaming sinks: exactly-once delivery to file storage.

The reference has no streaming at all (SURVEY.md §2.8); this module
completes the Structured Streaming wing with the standard idempotent
``foreachBatch`` pattern for sinks Spark can't transact against.

Exactly-once recipe: Spark guarantees at-least-once invocation of the
batch function with a monotonically increasing ``epoch_id`` recovered
from the checkpoint. Writing each microbatch to an ``epoch=<id>``
directory with overwrite mode makes redelivery idempotent — a retried
epoch overwrites its own directory, never appends a duplicate. Readers
(or a periodic `compact_small_files` pass) resolve the latest row per
key across epochs: classic log + merge-on-read, the shape behind every
lakehouse table format.

At 100 TB: each epoch directory is written by a normal distributed job
(no driver funneling), the store grows append-only (object-store
friendly — no in-place mutation), and `read_latest`'s window collapses
per key after a single shuffle on the key columns.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def epoch_log_upsert_sink(
    store_path: str,
) -> Callable[[DataFrame, int], None]:
    """Build a ``foreachBatch`` function writing each microbatch to
    ``<store_path>/epoch=<epoch_id>`` idempotently (overwrite-on-retry).
    """

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            f"{store_path}/epoch={epoch_id}"
        )

    return write_batch


def read_latest(
    spark: SparkSession,
    store_path: str,
    key_cols: Sequence[str],
    order_col: str,
) -> DataFrame:
    """Merge-on-read over the epoch log: latest row per key, ordered by
    ``order_col`` then epoch (later redeliveries of the same event time
    win by epoch). One shuffle on the key columns."""
    log = spark.read.option("basePath", store_path).parquet(
        f"{store_path}/epoch=*"
    )
    w = Window.partitionBy(*key_cols).orderBy(
        F.desc(order_col), F.desc("epoch")
    )
    return (
        log.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "epoch")
    )
