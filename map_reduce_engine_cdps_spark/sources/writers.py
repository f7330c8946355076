"""Sinks (SURVEY.md §2.2 T6-T9).

The reference's sinks are collect-to-master JSON (T6), ad-hoc local
model files (T7), and a manual per-node dataset splitter (T8/T9).
Spark-native: columnar writes with explicit layout control — the
partition/bucket layout IS the optimization surface at 100 TB (layout
decides which later queries prune and which joins pre-co-locate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


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


def gather(df: DataFrame, limit: int | None = None) -> list:
    """T6 — the reference's collect-to-master result gather
    (engine/master.py:107-124). Bounded by ``limit`` because an
    unbounded collect is a driver OOM at scale; prefer a write sink.
    """
    return df.limit(limit).collect() if limit is not None else df.collect()
