"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API):
a deterministic synthetic-events generator with real partition planning.

The reference's input model is "each worker scans its own mounted
directory with arbitrary Python" (reference engine/worker.py:83-87,
docker-compose.yml:20-23) — i.e. a user-programmable source with manual
data placement. The Python DataSource API is the engine-native
restatement: the source declares its schema and its own split plan
(``partitions()``), Spark schedules one task per split, and the
per-split ``read()`` is ordinary Python. Generation is a pure function
of the global row index, so output is identical for any partition count
— the property that makes a source safe to re-split at 100 TB.

Scale notes: partitions() returns O(num_partitions) tiny range objects
(never rows) so the driver plan stays small at any scale; read() yields
tuples lazily so a split never materializes in Python memory.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start = start
        self.end = end


def _row(i: int) -> tuple[int, int, float, str]:
    """Deterministic synthetic event for global index i (mirrored by the
    DuckDB oracle in plans/semistructured.py — keep the two in sync)."""
    user_id = (i * 37) % 97
    value = ((i * i) % 1000) / 10.0
    etype = ("click", "view", "purchase")[i % 3]
    return (i, user_id, value, etype)


class SyntheticEventsDataSource(DataSource):
    """spark.read.format("synthetic_events").option("numRows", N)."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return "event_id bigint, user_id bigint, value double, event_type string"

    def reader(self, schema) -> DataSourceReader:  # noqa: ANN001
        return SyntheticEventsReader(self.options)

    def simpleStreamReader(self, schema):  # noqa: ANN001, ANN201
        return SyntheticEventsStreamReader(self.options)


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options) -> None:  # noqa: ANN001
        self.num_rows = int(options.get("numRows", 10_000))
        self.num_partitions = int(options.get("numPartitions", 8))

    def partitions(self):  # noqa: ANN201
        per = max(1, -(-self.num_rows // self.num_partitions))
        return [
            _RangePartition(lo, min(lo + per, self.num_rows))
            for lo in range(0, self.num_rows, per)
        ]

    def read(self, partition: _RangePartition):  # noqa: ANN201
        for i in range(partition.start, partition.end):
            yield _row(i)


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Streaming face of the same source: offsets are plain row indexes,
    each microbatch emits up to rowsPerBatch rows. Offset bookkeeping is
    the engine's (checkpointed); the reader is stateless between calls —
    exactly the contract that makes a custom stream resumable: replaying
    (start, end) MUST reproduce identical rows, which holds because
    generation is a pure function of the row index."""

    def __init__(self, options) -> None:  # noqa: ANN001
        self.num_rows = int(options.get("numRows", 10_000))
        self.rows_per_batch = int(options.get("rowsPerBatch", 1_000))

    def initialOffset(self) -> dict:
        return {"idx": 0}

    def read(self, start: dict):  # noqa: ANN201
        # Materialized (not a generator): the simple-reader protocol
        # prefetches on the driver and ships the batch pickled, so rows
        # must be picklable; rowsPerBatch bounds driver memory.
        lo = start["idx"]
        hi = min(lo + self.rows_per_batch, self.num_rows)
        return [_row(i) for i in range(lo, hi)], {"idx": hi}

    def readBetweenOffsets(self, start: dict, end: dict):  # noqa: ANN201
        # Replay path after failure: must equal the original read.
        return [_row(i) for i in range(start["idx"], end["idx"])]

    def commit(self, end: dict) -> None:
        pass


def register(spark) -> None:  # noqa: ANN001
    """Idempotent registration of the custom source."""
    spark.dataSource.register(SyntheticEventsDataSource)
