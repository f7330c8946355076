"""Sinks (SURVEY.md §2.2 T6-T9).

The reference's sinks are collect-to-master JSON (T6), ad-hoc local
model files (T7), and a manual per-node dataset splitter (T8/T9).
Spark-native: columnar writes with explicit layout control — the
partition/bucket layout IS the optimization surface at 100 TB (layout
decides which later queries prune and which joins pre-co-locate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """T8 — partitioned dataset writer (reference distribute_to_nodes,
    scripts/plants_dataset.ipynb cell 18, replaced by hive-style
    partition dirs: readers prune on the partition column for free)."""
    df.write.format(fmt).mode(mode).partitionBy(*partition_by).save(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: list[str],
    n_buckets: int,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed table write: pre-shuffles once so later joins/aggs on
    the bucket key are co-located (no exchange). The Spark answer to
    the reference's manual data placement (docker-compose.yml:20-23)."""
    w = df.write.bucketBy(n_buckets, *bucket_by)
    if sort_by:
        w = w.sortBy(*sort_by)
    w.mode(mode).format("parquet").saveAsTable(table)


def filter_rewrite_csv(
    df: DataFrame,
    keep_keys: DataFrame,
    key: str,
    out_path: str,
    mode: str = "overwrite",
) -> None:
    """T9 — filtered re-writer (reference save_species,
    scripts/plants_dataset.ipynb cell 3): keep rows whose key appears
    in ``keep_keys`` via a left-semi join (broadcast when small), write
    CSV with header. No driver-side chunk loop — the semi join + write
    is fully distributed."""
    df.join(keep_keys, on=key, how="left_semi").write.mode(mode).option(
        "header", "true"
    ).csv(out_path)


def compact_small_files(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    fmt: str = "parquet",
) -> int:
    """Small-files compaction: rewrite a fragmented dataset into
    ~``target_file_bytes`` files. The chronic failure mode of streaming
    / incremental ingestion at scale — a 100 TB table accreted in
    per-microbatch files pays per-file open/footer costs on every scan
    and floods the driver's file index. Sizing uses the dataset's real
    on-disk bytes (not a row-count guess), and the rewrite is a single
    narrow-free repartition + write. Returns the output file count.

    Deliberately round-robin (`repartition(n)` without columns): balanced
    output sizes regardless of value skew. Use `write_partitioned` /
    `write_bucketed` instead when a keyed layout is wanted.
    """
    df = spark.read.format(fmt).load(path)
    # sum of leaf-file sizes via the relation's file index — no data scan
    total_bytes = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    n = -(-total_bytes // target_file_bytes) if total_bytes else 1
    df.repartition(n).write.format(fmt).mode("overwrite").save(out_path)
    out = spark.read.format(fmt).load(out_path)
    return out.select(F.input_file_name()).distinct().count()


def gather(df: DataFrame, limit: int | None = None) -> list:
    """T6 — the reference's collect-to-master result gather
    (engine/master.py:107-124). Bounded by ``limit`` because an
    unbounded collect is a driver OOM at scale; prefer a write sink.
    """
    return df.limit(limit).collect() if limit is not None else df.collect()


# ---------------------------------------------------------------------------
# Z-order layout evaluation (see plans/relational.py:zorder_layout_stats
# for the registry query): bit-interleaving expression shared between
# the Spark plan and the DuckDB oracle — pure integer arithmetic
# ((x >> i) & 1 via div/mod), 8 bits per dimension.
# ---------------------------------------------------------------------------


def z_interleave_sql(x: str, y: str, bits: int = 8, intdiv: str = "//") -> str:
    """SQL for the Morton/Z-value of two `bits`-bit nonneg integers:
    x's bit i lands at position 2i, y's at 2i+1. Engine-portable up to
    the integer-division spelling: DuckDB `//`, Spark `div` (both exact
    on the nonnegative operands used here)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x}) {intdiv} {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"((({y}) {intdiv} {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"
