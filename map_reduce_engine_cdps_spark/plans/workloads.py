"""The reference's shipped workloads, re-expressed twice:

1. Spark-native DataFrame pipelines (the real engine path), and
2. 4-hook programs run through the MapReduce compatibility shim
   (compat/mapreduce.py) — proving the shim executes genuine
   reference-style task code with identical results.

Reference tasks: wordcount (tasks/example_wordcount.py) and accident
analytics (tasks/accident_analysis.py). Goldens in FIXTURES.md F1/F2.
"""

from __future__ import annotations

import math
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_engine_cdps_spark.compat.mapreduce import run_task
from map_reduce_engine_cdps_spark.functions import expressions as X
from map_reduce_engine_cdps_spark.sources.readers import load_table

# ---------------------------------------------------------------------------
# Wordcount — DataFrame path lives in plans/textops.py (wordcount).
# Below: the same query as a 4-hook shim program. Tokenization matches
# functions/text.py:clean_tokens (lower → split \s+ → strip non-alnum →
# drop empty; reference semantics tasks/example_wordcount.py:14-17).
# ---------------------------------------------------------------------------


def wc_map(lines: list[str], worker_id: int) -> list[tuple[str, int]]:
    out = []
    for line in lines:
        for tok in re.split(r"\s+", line.strip().lower()):
            word = re.sub(r"[^a-z0-9]", "", tok)
            if word:
                out.append((word, 1))
    return out


def wc_reduce(grouped, worker_id: int) -> list[tuple[str, int]]:
    return [(k, sum(vs)) for k, vs in grouped]


def wordcount_shim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wordcount over documents.text via the compat shim; oracle-checked
    against the same DuckDB SQL as the DataFrame wordcount."""
    docs = load_table(spark, sf_dir, "documents")
    lines = docs.select("text").rdd.map(lambda r: r[0])
    result = run_task(spark, lines, wc_map, reduce_func=wc_reduce, num_partitions=8)
    return spark.createDataFrame(result, schema="word string, cnt long")


# ---------------------------------------------------------------------------
# Accident analytics (FIXTURES.md F2) — full reference semantics:
# defaults, safe casts, first-true flag, weather bucketing, [:19]
# timestamp truncation, failed-parse→0 duration, impact scoring,
# per-key multi-agg + danger score + formula string, sort by danger.
# ---------------------------------------------------------------------------

ROAD_FLAGS = [
    "Station",
    "Junction",
    "Crossing",
    "Traffic_Signal",
    "Stop",
    "Railway",
    "Roundabout",
]


def accident_danger_df(acc: DataFrame) -> DataFrame:
    """DataFrame path: accidents table → per-key danger scores.

    Input columns are all strings (CSV DictReader semantics, reference
    tasks/accident_analysis.py:21-37); missing → defaults.
    """
    severity = X.safe_double(F.col("Severity"), 1.0)
    distance = X.safe_double(F.col("`Distance(mi)`"), 0.0)
    start = X.parse_ts_seconds(F.col("Start_Time"))
    end = X.parse_ts_seconds(F.col("End_Time"))
    duration = X.duration_hours(start, end)
    weather = X.bucket_weather(X.with_default(F.col("Weather_Condition"), "Unknown"))
    tod = X.with_default(F.col("Sunrise_Sunset"), "Day")
    road = X.first_true_flag(ROAD_FLAGS)
    impact = X.impact_score(severity, distance, duration)
    keyed = acc.select(
        X.composite_key(road, weather, tod).alias("grp_key"), impact.alias("impact")
    )
    agg = keyed.groupBy("grp_key").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.avg("impact"), 2).alias("avg_impact"),
        F.round(F.min("impact"), 2).alias("min_impact"),
        F.round(F.max("impact"), 2).alias("max_impact"),
    )
    scored = agg.withColumn("log_factor", F.round(F.log(F.col("cnt") + 1), 2)).withColumn(
        "danger_score", F.round(F.col("avg_impact") * F.col("log_factor"), 2)
    )
    return scored.withColumn(
        "formula",
        X.formula_string(F.col("avg_impact"), F.col("log_factor"), F.col("danger_score")),
    ).orderBy(F.desc("danger_score"), F.asc("grp_key"))


# --- the same workload as a 4-hook shim program over row dicts ---


def _acc_safe_float(s, fallback: float) -> float:
    try:
        return float(s)
    except (TypeError, ValueError):
        return fallback


def _acc_duration_hours(start: str | None, end: str | None) -> float:
    from datetime import datetime

    try:
        s = datetime.strptime(str(start)[:19], "%Y-%m-%d %H:%M:%S")
        e = datetime.strptime(str(end)[:19], "%Y-%m-%d %H:%M:%S")
        return (e - s).total_seconds() / 3600.0
    except (TypeError, ValueError):
        return 0.0


def _acc_weather_bucket(w: str) -> str:
    low = w.lower()
    if low == "fair":
        return "Fair"
    if "cloud" in low or "overcast" in low:
        return "Cloudy"
    if "clear" in low or "partly" in low:
        return "PartlyClear"
    if any(t in low for t in ("rain", "snow", "storm", "fog", "wind")):
        return "BadWeather"
    return "Unknown"


def acc_map(rows: list[dict], worker_id: int) -> list[tuple[str, float]]:
    out = []
    for row in rows:
        severity = _acc_safe_float(row.get("Severity"), 1.0)
        distance = _acc_safe_float(row.get("Distance(mi)"), 0.0)
        duration = _acc_duration_hours(row.get("Start_Time"), row.get("End_Time"))
        weather = _acc_weather_bucket(row.get("Weather_Condition") or "Unknown")
        tod = row.get("Sunrise_Sunset") or "Day"
        road = next((f for f in ROAD_FLAGS if row.get(f) == "True"), "None")
        impact = severity * (1.0 + distance) * (1.0 + duration)
        out.append((f"{road}_{weather}_{tod}", impact))
    return out


def acc_reduce(grouped, worker_id: int) -> list[dict]:
    out = []
    for key, values in grouped:
        cnt = len(values)
        avg_impact = round(sum(values) / cnt, 2)
        log_factor = round(math.log(cnt + 1), 2)
        danger = round(avg_impact * log_factor, 2)
        out.append(
            {
                "grp_key": key,
                "cnt": cnt,
                "avg_impact": avg_impact,
                "min_impact": round(min(values), 2),
                "max_impact": round(max(values), 2),
                "log_factor": log_factor,
                "danger_score": danger,
                "formula": f"{avg_impact} * {log_factor} = {danger}",
            }
        )
    return out


def accident_danger_shim(spark: SparkSession, rows: list[dict]) -> list[dict]:
    """Accident workload through the compat shim, from row dicts."""
    return run_task(
        spark, rows, acc_map, reduce_func=acc_reduce, num_partitions=4
    ).collect()


# ---------------------------------------------------------------------------
# danger_shim — the danger_topk keying + aggregation run through the
# 4-hook shim against the REAL events table, oracle-checked (the shim's
# only other gate entry, wordcount_shim, covers text; this one covers
# the reference's accident-style numeric path on sf data). Outputs are
# restricted to count/min/max: exact under any partitioning and
# reduction order, so the oracle hash can't drift on float-summation
# order (avg/sum through arbitrary per-partition Python reduction would
# not be bit-stable vs DuckDB).
# ---------------------------------------------------------------------------

def danger_map(items: list, worker_id: int) -> list[tuple[str, float]]:
    out = []
    for event_type, value, hour in items:
        vtier = "high" if value >= 150 else ("mid" if value >= 50 else "low")
        tod = "AM" if hour < 12 else "PM"
        out.append((f"{event_type}_{vtier}_{tod}", value))
    return out


def danger_reduce(grouped, worker_id: int) -> list[tuple[str, int, float, float]]:
    return [
        (key, len(vals), min(vals), max(vals)) for key, vals in grouped
    ]


def danger_shim(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    items = ev.select("event_type", "value", F.hour("ts").alias("h")).rdd.map(
        lambda r: (r[0], r[1], r[2])
    )
    result = run_task(
        spark, items, danger_map, reduce_func=danger_reduce, num_partitions=8
    )
    return spark.createDataFrame(
        result,
        schema="grp_key string, cnt long, min_impact double, max_impact double",
    )


DANGER_SHIM_SQL = """
WITH keyed AS (
  SELECT concat_ws('_', event_type,
                   CASE WHEN value >= 150 THEN 'high'
                        WHEN value >= 50 THEN 'mid'
                        ELSE 'low' END,
                   CASE WHEN hour(ts) < 12 THEN 'AM' ELSE 'PM' END) AS grp_key,
         value
  FROM events
)
SELECT grp_key, count(*) AS cnt, min(value) AS min_impact,
       max(value) AS max_impact
FROM keyed GROUP BY grp_key
"""
