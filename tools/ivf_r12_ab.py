"""Round-12 A/B: ivf_ann_topk old shape (K-row centroid crossJoin +
Arrow pair dots + rank window + re-attach id-join) vs the SHIPPED
carry-through-window shape (vec/norm ride the rank exchange — map-side
Partial WindowGroupLimit prunes it to corpus×n — so the winners need
no re-attach join or second corpus scan). An earlier candidate ("1-row
centroid array + single-crossing list_sims_kernel + per-row array_sort
top-n") was measured SLOWER and reverted before this script was
finalized; `new` here benchmarks the shipped S.ivf_ann_topk, not that
variant (ADVICE r12 docstring fix). Interleaved in ONE session because
this host's noise swamps cross-session comparisons (SCALE.md round-12
receipts).

Run: python tools/ivf_r12_ab.py [sf_dir] [passes]
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from map_reduce_engine_cdps_spark.functions import vectors as V
from map_reduce_engine_cdps_spark.plans import similarity as S
from map_reduce_engine_cdps_spark.session import get_spark
from map_reduce_engine_cdps_spark.sources.readers import load_table

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
PASSES = int(sys.argv[2]) if len(sys.argv) > 2 else 5


def _old_broadcast_centroid_lists(emb: DataFrame):
    return F.broadcast(
        S._centroids(emb).select(
            F.col("label").alias("list_id"),
            "centroid",
            V.norm(F.col("centroid")).alias("cent_n"),
        )
    )


def _old_nearest_lists(side, cent, id_col, vec_col, n_col, n, keep_rank=False):
    scored = side.crossJoin(cent).select(
        id_col,
        "list_id",
        F.round(
            S._cos_pre_arrow(
                F.col(vec_col), F.col("centroid"), F.col(n_col), F.col("cent_n")
            ),
            6,
        ).alias("c_sim"),
    )
    w = W.partitionBy(id_col).orderBy(F.desc("c_sim"), F.asc("list_id"))
    extra = [F.col("rn").alias("probe_rank")] if keep_rank else []
    winners = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n)
        .select(id_col, "list_id", *extra)
    )
    return winners.join(side, id_col)


def old_ivf(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    cent = _old_broadcast_centroid_lists(emb)
    norm_pd = V.norm_arrow()
    assign = _old_nearest_lists(
        emb.select(
            F.col("vec_id").alias("cand_id"),
            F.col("embedding").alias("c_emb"),
            norm_pd(F.col("embedding")).alias("c_n"),
        ),
        cent, "cand_id", "c_emb", "c_n", 1,
    )
    probes = _old_nearest_lists(
        emb.filter(F.col("vec_id") < S.N_QUERIES).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            norm_pd(F.col("embedding")).alias("q_n"),
        ),
        cent, "query_id", "q_emb", "q_n", S.NPROBE,
    )
    sims = (
        probes.join(assign, "list_id")
        .filter(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(
                S._cos_pre_arrow(
                    F.col("q_emb"), F.col("c_emb"), F.col("q_n"), F.col("c_n")
                ),
                6,
            ).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("cand_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= S.TOP_K)
        .select("query_id", "cand_id", "cos_sim", "rank")
    )


def main() -> None:
    spark = get_spark(app_name="ivf_r12_ab")
    variants = {"old": lambda: old_ivf(spark, SF),
                "new": lambda: S.ivf_ann_topk(spark, SF)}
    # identical-output check first
    a = sorted(map(tuple, old_ivf(spark, SF).collect()))
    b = sorted(map(tuple, S.ivf_ann_topk(spark, SF).collect()))
    print(f"RESULT identical_output: {a == b} ({len(a)} rows)", flush=True)
    times: dict[str, list[float]] = {k: [] for k in variants}
    for _ in range(PASSES):
        for k, fn in variants.items():
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            times[k].append(time.perf_counter() - t0)
    for k, ts in times.items():
        print(
            f"RESULT {k}: median={statistics.median(ts):.3f}s "
            f"{[round(t, 3) for t in ts]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
