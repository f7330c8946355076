"""Round-13 interleaved A/B: fused union-aggregate CC round (one join)
vs the r5-r12 two-join round (neighbor-min agg + left-join-back).

OLD loop copied verbatim; NEW = the live connected_components. Both run
over the same session-memoized LSH pair front (built once, shared —
both variants pay only the loop). Output equality checked via sorted
collect first.

Usage: python tools/r13_cc_ab.py [sf_dir] [passes]
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from map_reduce_engine_cdps_spark.plans.dedup import (
    _CC_CHECKPOINT_EVERY,
    _lsh_pairs_cached,
    connected_components,
)
from map_reduce_engine_cdps_spark.session import get_spark
from map_reduce_engine_cdps_spark.sources.readers import load_table

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
PASSES = int(sys.argv[2]) if len(sys.argv) > 2 else 7


def connected_components_old(
    vertices: DataFrame, pairs: DataFrame, max_rounds: int = 25
) -> DataFrame:
    """Verbatim r12 loop: two hinted joins per round."""
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .union(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
        .repartition(F.col("src"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = vertices.select(
        "doc_id", F.col("doc_id").alias("comp")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    prev_sum = labels.agg(F.sum("comp")).first()[0]
    freeable = labels
    for rnd in range(max_rounds):
        nbr_min = (
            edges.join(labels.hint("shuffle_hash"), edges.src == labels.doc_id)
            .groupBy(F.col("dst").alias("doc_id"))
            .agg(F.min("comp").alias("nbr_min"))
        )
        new_labels = labels.join(nbr_min.hint("shuffle_hash"), "doc_id", "left").select(
            "doc_id",
            F.least(F.col("comp"), F.coalesce("nbr_min", "comp")).alias("comp"),
        )
        if (rnd + 1) % _CC_CHECKPOINT_EVERY == 0:
            new_labels = new_labels.localCheckpoint(eager=True)
        else:
            new_labels = new_labels.persist(StorageLevel.MEMORY_AND_DISK)
        new_sum = new_labels.agg(F.sum("comp")).first()[0]
        if freeable is not None:
            freeable.unpersist()
        freeable = new_labels
        labels = new_labels
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    out = labels.localCheckpoint(eager=True)
    if freeable is not None:
        freeable.unpersist()
    edges.unpersist()
    return out


def main() -> None:
    spark = get_spark(app_name="r13_cc_ab")
    sc = spark.sparkContext
    docs = load_table(spark, SF_DIR, "documents").select("doc_id")
    pairs = _lsh_pairs_cached(spark, SF_DIR).select("doc_a", "doc_b")

    a = sorted(map(tuple, connected_components_old(docs, pairs).collect()))
    b = sorted(map(tuple, connected_components(docs, pairs).collect()))
    assert a == b, f"label mismatch: {len(a)} vs {len(b)} rows"
    print(f"labels identical ({len(a)} rows)")

    olds, news = [], []
    for i in range(PASSES):
        sc.setJobDescription(f"cc_ab:old:{i}")
        t0 = time.perf_counter()
        connected_components_old(docs, pairs).count()
        olds.append(time.perf_counter() - t0)
        sc.setJobDescription(f"cc_ab:new:{i}")
        t0 = time.perf_counter()
        connected_components(docs, pairs).count()
        news.append(time.perf_counter() - t0)
    sc.setJobDescription(None)
    wins = sum(1 for o, n in zip(olds, news) if n < o)
    print(
        f"cc @ {SF_DIR}: old median {statistics.median(olds):.3f}s "
        f"new median {statistics.median(news):.3f}s "
        f"(new lower in {wins}/{PASSES})\n"
        f"  old {[round(t, 3) for t in olds]}\n"
        f"  new {[round(t, 3) for t in news]}"
    )


if __name__ == "__main__":
    main()
