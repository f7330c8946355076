"""Per-query metrics (reference E13 parity: engine/worker.py:167-185
reports map/shuffle/reduce wall times + counts; engine/master.py:92-104
exposes them at /status).

Spark already exposes stage/task metrics through the status tracker;
this wrapper distills the reference's per-task metric dict — wall time,
output count, shuffle volumes — for a single query run.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class QueryMetrics:
    """Reference TaskResult.metrics analogue (engine/models.py:38)."""

    name: str
    wall_time_s: float
    output_rows: int
    num_stages: int
    shuffle_partitions: int
    extra: dict = field(default_factory=dict)

    def as_dict(self) -> dict:
        return {
            "name": self.name,
            "wall_time_s": round(self.wall_time_s, 3),
            "output_rows": self.output_rows,
            "num_stages": self.num_stages,
            "shuffle_partitions": self.shuffle_partitions,
            **self.extra,
        }


def run_with_metrics(df: DataFrame, name: str = "query") -> QueryMetrics:
    """Execute ``df`` and report reference-style metrics.

    Stage count is read from the status tracker delta around the job —
    the Spark equivalent of the reference's per-phase timers (its MAP /
    SHUFFLE / REDUCE phases are Spark stages separated by exchanges).
    """
    spark = df.sparkSession
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    before = set(tracker.getJobIdsForGroup(None) or [])
    t0 = time.perf_counter()
    n = df.count()
    wall = time.perf_counter() - t0
    after = set(tracker.getJobIdsForGroup(None) or [])
    stages = 0
    for jid in after - before:
        info = tracker.getJobInfo(jid)
        if info is not None:
            stages += len(info.stageIds)
    return QueryMetrics(
        name=name,
        wall_time_s=wall,
        output_rows=n,
        num_stages=stages,
        shuffle_partitions=int(spark.conf.get("spark.sql.shuffle.partitions")),
    )


def run_with_observed_metrics(
    df: DataFrame,
    metric_exprs: dict[str, "object"],
    name: str = "query",
) -> tuple[list, dict]:
    """Execute ``df`` collecting in-flight metrics via ``Observation`` —
    aggregates computed on the rows as they stream past, with NO second
    job (``run_with_metrics`` re-counts; at 100 TB that doubles the
    scan). The Spark-native version of the reference's per-phase
    counters (map_output_count / unique_keys,
    reference engine/worker.py:175-182).

    ``metric_exprs``: name → aggregate Column. Returns (rows, metrics).
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    observed = df.observe(obs, *[c.alias(k) for k, c in metric_exprs.items()])
    rows = observed.collect()
    return rows, obs.get


def parse_events_with_bad_record_counter(df: DataFrame):
    """Accumulator-backed malformed-record accounting (the classic
    Spark operational surface this library had not yet exercised):
    parse ``props`` JSON per partition, routing good rows onward and
    counting malformed ones in driver-visible accumulators — the
    pattern for "how many rows did the cleansing pass drop and why"
    without a second scan or a separate filter job.

    Accumulator caveat baked into the contract: counts are exact only
    when read AFTER an action, and task retries can over-count — use
    them for monitoring, never for query semantics (the returned rows
    are the semantic output; the reference's per-phase counters,
    engine/worker.py:175-182, have the same advisory role).

    Returns (parsed_rows_df, counters) where counters() reads the
    accumulators.
    """
    import json

    sc = df.sparkSession.sparkContext
    n_bad = sc.accumulator(0)
    n_good = sc.accumulator(0)

    def parse_partition(rows):
        for r in rows:
            try:
                props = json.loads(r["props"]) if r["props"] else {}
                k = int(props["k"])
            except (ValueError, KeyError, TypeError):
                n_bad.add(1)
                continue
            n_good.add(1)
            yield (r["event_id"], r["user_id"], k)

    parsed = df.select("event_id", "user_id", "props").rdd.mapPartitions(
        parse_partition
    ).toDF("event_id long, user_id long, k int")

    def counters() -> dict:
        return {"good": n_good.value, "bad": n_bad.value}

    return parsed, counters
