"""Skew-mitigation operators: salted join and two-phase (salted)
aggregation.

The reference *creates* skew by construction — its accident workload
routes each weather category to one fixed worker (reference
tasks/accident_analysis.py:90-104 sends every `Rain` pair to the same
peer), so one worker does most of the reduce. These operators are the
Spark-native cure for that shape of data: spread a hot key across
`n_salt` reducers, then merge.

When to use which, at 100 TB:
- AQE skew-join handles *sort-merge* joins automatically; salting is
  for the cases AQE can't split — hot keys in aggregations with
  non-decomposable state (collect_list / distinct), or joins where the
  build side must be replicated anyway.
- Plain sum/count/avg aggs do NOT need salting — Spark's partial
  aggregation (map-side combine) already collapses hot keys before the
  shuffle. The two-phase form here exists for aggregates whose state
  grows with group size.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT = 8


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salt: int = DEFAULT_SALT,
    how: str = "inner",
    salt_source: Column | None = None,
) -> DataFrame:
    """Equi-join with the left side's hot keys spread over ``n_salt``
    sub-keys and the right side replicated once per salt value.

    The left row's salt is derived deterministically (hash of the join
    key's companion column, or ``salt_source``), so the same row always
    lands on the same reducer — no RNG, results reproducible. Cost: the
    right side is shuffled ``n_salt``× — only worth it when the right
    side is small-ish but above the broadcast threshold and the left
    key histogram is heavy-tailed.
    """
    if salt_source is None:
        salt_source = F.spark_partition_id() * F.lit(2654435761) + F.monotonically_increasing_id()
    lsalt = left.withColumn("_salt", F.pmod(F.hash(salt_source), F.lit(n_salt)))
    rsalt = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    return lsalt.join(rsalt, [on, "_salt"], how).drop("_salt")


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, Column],
    n_salt: int = DEFAULT_SALT,
    salt_source: Column | None = None,
) -> DataFrame:
    """Two-phase aggregation: groupBy(keys + salt) partial, then
    groupBy(keys) final. ``aggs`` maps output column name → a
    *decomposable* aggregate expression applied in the partial phase;
    the final phase re-applies the matching merge (sum→sum, count→sum,
    min→min, max→max — pass merge-compatible expressions).

    Each partial group is ≤ 1/n_salt of the hot key's rows, so no
    single reducer materializes the whole group.
    """
    if salt_source is None:
        salt_source = F.spark_partition_id() * F.lit(2654435761) + F.monotonically_increasing_id()
    salted = df.withColumn("_salt", F.pmod(F.hash(salt_source), F.lit(n_salt)))
    partial = salted.groupBy(*keys, "_salt").agg(
        *[expr.alias(f"_p_{name}") for name, expr in aggs.items()]
    )
    merged = partial.groupBy(*keys).agg(
        *[_merge_expr(name, expr).alias(name) for name, expr in aggs.items()]
    )
    return merged


def _merge_expr(name: str, partial_expr: Column) -> Column:
    """Merge rule for the final phase, keyed off the partial expression's
    top-level function (sum/count → sum; min → min; max → max)."""
    fn = partial_expr._jc.toString().split("(", 1)[0].lower()  # noqa: SLF001
    col = F.col(f"_p_{name}")
    if fn in ("min",):
        return F.min(col)
    if fn in ("max",):
        return F.max(col)
    # sum, count, and any additively-merging state
    return F.sum(col)
