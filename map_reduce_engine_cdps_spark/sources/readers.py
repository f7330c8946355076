"""Sources (SURVEY.md §2.2, T1-T4).

The reference scans per-worker local directories inside user map code
(reference tasks/example_wordcount.py:9-13, tasks/accident_analysis.py:15-23,
tasks/plants_classifier.py:48-54,141-163). Spark-native: one global path,
declarative readers; Catalyst plans the splits, prunes columns, and pushes
filters down to the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet table from a test-data scale-factor directory.

    ``events.ts`` has been written two ways by the data generator:
    parquet TIMESTAMP(NANOS) (Spark's vectorized reader rejects it —
    read as raw nanos via the legacy conf and truncate to micros) and
    plain TIMESTAMP_NTZ. Either way the downstream contract is a
    session-tz TimestampType column whose UTC instant equals the stored
    wall-clock, so watermarks/windows/unix_micros all behave identically
    to the DuckDB oracle (which is tz-naive).

    NOTE: this mutates two session confs on the caller's SparkSession
    (nanosAsLong for the legacy-nanos parquet layout, and
    spark.sql.session.timeZone=UTC). The UTC pin is unconditional —
    wall-clock-derived expressions (hour(ts), date_format, window
    starts) must match the tz-naive oracle regardless of which layout
    generated events.parquet and of the JVM default tz.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # integer div: `/` is double division and drifts ±1µs at ns
            # magnitudes (53-bit mantissa); DuckDB truncates ns→µs, so must we
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # wall-clock-is-UTC: under the UTC session tz the NTZ→LTZ
            # cast keeps the instant
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_parallel(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """load_table + re-parallelize when the scan yields fewer partitions
    than cores.

    For queries whose map stage does CPU-heavy per-row work
    (tokenization, interpreted higher-order lambdas, Arrow/UDTF
    crossings), a single small parquet file pins that stage to one
    thread; one cheap row-exchange up front buys full-width execution.
    Scan-light relational queries should NOT use this — the exchange
    would cost more than it saves, and on a real cluster the scan
    already yields one partition per ~128 MB split.
    """
    df = load_table(spark, sf_dir, name)
    par = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        df = df.repartition(par)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql() queries."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def read_text_dir(spark: SparkSession, path: str, glob: str = "*.txt") -> DataFrame:
    """T1 — text directory scan (reference tasks/example_wordcount.py:9-13).

    One row per line, column ``value``. The glob reproduces the
    reference's extension filter; Spark handles split planning, so
    there is no per-worker DATA_DIR.
    """
    return spark.read.text(f"{path}/{glob}")


def read_csv_dir(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    sep: str = ",",
    header: bool = True,
) -> DataFrame:
    """T2/T3 — CSV scan (reference tasks/accident_analysis.py:15-23 and
    tasks/plants_classifier.py:48-54).

    With ``schema=None`` the scan is dynamic (all strings + header),
    matching csv.DictReader semantics; pass an explicit schema for the
    typed variant (the reference's pandas dtype dict,
    tasks/plants_classifier.py:24-45). Column pruning and chunked
    reads are free (Catalyst prunes; Spark partitions the scan).
    """
    reader = spark.read.options(header=str(header).lower(), sep=sep)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.csv(path)


def read_image_dir(spark: SparkSession, path: str) -> DataFrame:
    """T4 — class-per-folder binary scan (reference
    tasks/plants_classifier.py:141-163).

    Returns (path, modificationTime, length, content, label) where
    label is the parent directory name — the reference's class label.
    """
    df = spark.read.format("binaryFile").option("pathGlobFilter", "*.{jpg,jpeg,png}").load(path)
    return df.withColumn(
        "label", F.regexp_extract(F.col("path"), r"([^/]+)/[^/]+$", 1)
    )
