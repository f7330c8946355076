"""Round-13 interleaved A/B: grouped query-vs-members kernel vs the
round-12 pair-join shapes for knn_bruteforce and lsh_ann_topk.

OLD (copied verbatim from the pre-round-13 module) vs NEW (imported
from the live module). Protocol per OPTIMIZATION_r12.md: one Spark
session, output equality verified via sorted collect FIRST, then
alternating old/new timed passes (noop sink), medians over >=7 passes.

Usage: python tools/r13_ann_ab.py [sf_dir] [passes]
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F, Window as W

import map_reduce_engine_cdps_spark.plans.similarity as S
from map_reduce_engine_cdps_spark.functions import vectors as V
from map_reduce_engine_cdps_spark.session import get_spark
from map_reduce_engine_cdps_spark.sources.readers import load_table

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
PASSES = int(sys.argv[2]) if len(sys.argv) > 2 else 7


# --- OLD shapes (verbatim copies of the r12 implementations) ---------------

def _cos_pre_arrow(qe, ce, qn, cn):
    return V.dot_arrow()(qe, ce) / (qn * cn)


def _queries_and_candidates_old(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    norm_pd = V.norm_arrow()
    q = emb.filter(F.col("vec_id") < S.N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        norm_pd(F.col("embedding")).alias("q_n"),
    )
    c = emb.select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("c_emb"),
        norm_pd(F.col("embedding")).alias("c_n"),
    )
    return q, c


def knn_old(spark, sf_dir):
    q, c = _queries_and_candidates_old(spark, sf_dir)
    sims = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(
                _cos_pre_arrow(
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


def lsh_old(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    norm_pd = V.norm_arrow()
    d = emb.withColumn(
        "bucket", V.lsh_bucket_arrow(S.N_PLANES)(F.col("embedding"))
    )
    q = d.filter(F.col("vec_id") < S.N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        norm_pd(F.col("embedding")).alias("q_n"),
        "bucket",
    )
    c = d.select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("c_emb"),
        norm_pd(F.col("embedding")).alias("c_n"),
        "bucket",
    )
    sims = (
        q.join(c, "bucket")
        .filter(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(
                _cos_pre_arrow(
                    F.col("q_emb"), F.col("c_emb"), F.col("q_n"), F.col("c_n")
                ),
                6,
            ).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("cand_id"))
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("query_id", F.col("cand_id").alias("nn_id"), "cos_sim")
    )


def lsh_grouped(spark, sf_dir):
    """Grouped-kernel lsh (MEASURED, NOT SHIPPED): broadcast semi-join
    prefilter + hash-salt groups with an in-kernel bucket mask — the
    knn payload shape. Won/tied at sf1, lost ~0.3 s of fixed
    stage+grouped-map latency at sf0.1 (receipts in
    OPTIMIZATION_r13.md); kept here so the receipt is reproducible."""
    emb = load_table(spark, sf_dir, "embeddings")
    d = emb.select(
        "vec_id",
        "embedding",
        V.lsh_bucket_arrow(S.N_PLANES)(F.col("embedding")).alias("bucket"),
    )
    q = d.filter(F.col("vec_id") < S.N_QUERIES)
    qb = q.select(F.col("bucket").alias("qb"))
    cand = d.join(
        F.broadcast(qb), F.col("bucket").eqNullSafe(F.col("qb")), "left_semi"
    )
    sims = S._query_group_sims(
        q, cand, S._ann_salt_groups(emb), ["bucket"]
    ).select("query_id", "cand_id", F.round("cos_raw", 6).alias("cos_sim"))
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("cand_id"))
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("query_id", F.col("cand_id").alias("nn_id"), "cos_sim")
    )


def lsh_mid(spark, sf_dir):
    """Pair-join shape with the r13 fixes but WITHOUT the grouped
    kernel: eqNullSafe keys (single corpus bucket pass) + broadcast
    semi-join prefilter (norms on survivors only); pairs still carry
    both embeddings across the dot crossing."""
    emb = load_table(spark, sf_dir, "embeddings")
    norm_pd = V.norm_arrow()
    d = emb.select(
        "vec_id",
        "embedding",
        V.lsh_bucket_arrow(S.N_PLANES)(F.col("embedding")).alias("bucket"),
    )
    q = d.filter(F.col("vec_id") < S.N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        norm_pd(F.col("embedding")).alias("q_n"),
        "bucket",
    )
    qb = d.filter(F.col("vec_id") < S.N_QUERIES).select(
        F.col("bucket").alias("qb")
    )
    c = (
        d.join(F.broadcast(qb), F.col("bucket").eqNullSafe(F.col("qb")), "left_semi")
        .select(
            F.col("vec_id").alias("cand_id"),
            F.col("embedding").alias("c_emb"),
            norm_pd(F.col("embedding")).alias("c_n"),
            F.col("bucket").alias("c_bucket"),
        )
    )
    sims = (
        q.join(c, F.col("bucket").eqNullSafe(F.col("c_bucket")))
        .filter(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(
                _cos_pre_arrow(
                    F.col("q_emb"), F.col("c_emb"), F.col("q_n"), F.col("c_n")
                ),
                6,
            ).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("cand_id"))
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("query_id", F.col("cand_id").alias("nn_id"), "cos_sim")
    )


def lsh_mid2(spark, sf_dir):
    """lsh_mid with two stage trims: the ≤N_QUERIES query branches use
    the INTERPRETED JVM folds (bit-identical, pinned; constant 10 rows
    at every SF — no Python stage round-trip), and the candidate norm
    rides the pair crossing (adjacent independent Python UDFs merge
    into one ArrowEvalPython node; pairs-per-candidate ≈ queries in
    its bucket ≈ 1, so the eval count is unchanged)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < S.N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        V.norm(F.col("embedding")).alias("q_n"),
        V.lsh_bucket(F.col("embedding"), S.N_PLANES).alias("bucket"),
    )
    qb = q.select(F.col("bucket").alias("qb"))
    d = emb.select(
        "vec_id",
        "embedding",
        V.lsh_bucket_arrow(S.N_PLANES)(F.col("embedding")).alias("bucket"),
    )
    c = d.join(
        F.broadcast(qb), F.col("bucket").eqNullSafe(F.col("qb")), "left_semi"
    ).select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("c_emb"),
        F.col("bucket").alias("c_bucket"),
    )
    sims = (
        q.join(c, F.col("bucket").eqNullSafe(F.col("c_bucket")))
        .filter(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(
                V.dot_arrow()(F.col("q_emb"), F.col("c_emb"))
                / (F.col("q_n") * V.norm_arrow()(F.col("c_emb"))),
                6,
            ).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("cand_id"))
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("query_id", F.col("cand_id").alias("nn_id"), "cos_sim")
    )


def lsh_v1(spark, sf_dir):
    """OLD shape with ONLY the eqNullSafe fix: the equi-join key's
    inferred isnotnull(bucket) duplicated the corpus bucket UDF; the
    null-safe key removes the duplicate pass and changes nothing else
    (no prefilter, no grouped kernel)."""
    emb = load_table(spark, sf_dir, "embeddings")
    norm_pd = V.norm_arrow()
    d = emb.withColumn(
        "bucket", V.lsh_bucket_arrow(S.N_PLANES)(F.col("embedding"))
    )
    q = d.filter(F.col("vec_id") < S.N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        norm_pd(F.col("embedding")).alias("q_n"),
        "bucket",
    )
    c = d.select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("c_emb"),
        norm_pd(F.col("embedding")).alias("c_n"),
        F.col("bucket").alias("c_bucket"),
    )
    sims = (
        q.join(c, F.col("bucket").eqNullSafe(F.col("c_bucket")))
        .filter(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(
                _cos_pre_arrow(
                    F.col("q_emb"), F.col("c_emb"), F.col("q_n"), F.col("c_n")
                ),
                6,
            ).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("cand_id"))
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("query_id", F.col("cand_id").alias("nn_id"), "cos_sim")
    )


def lsh_mid3(spark, sf_dir):
    """lsh_mid with only ONE trim: the semi-join build side (qb)
    derives the query buckets with the INTERPRETED fold (bit-identical,
    pinned; constant ≤10 rows) so the prefilter adds no Python stage.
    The q pair side and the survivors norm stay Arrow as in lsh_mid."""
    emb = load_table(spark, sf_dir, "embeddings")
    norm_pd = V.norm_arrow()
    d = emb.select(
        "vec_id",
        "embedding",
        V.lsh_bucket_arrow(S.N_PLANES)(F.col("embedding")).alias("bucket"),
    )
    q = d.filter(F.col("vec_id") < S.N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        norm_pd(F.col("embedding")).alias("q_n"),
        "bucket",
    )
    qb = emb.filter(F.col("vec_id") < S.N_QUERIES).select(
        V.lsh_bucket(F.col("embedding"), S.N_PLANES).alias("qb")
    )
    c = (
        d.join(F.broadcast(qb), F.col("bucket").eqNullSafe(F.col("qb")), "left_semi")
        .select(
            F.col("vec_id").alias("cand_id"),
            F.col("embedding").alias("c_emb"),
            norm_pd(F.col("embedding")).alias("c_n"),
            F.col("bucket").alias("c_bucket"),
        )
    )
    sims = (
        q.join(c, F.col("bucket").eqNullSafe(F.col("c_bucket")))
        .filter(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(
                _cos_pre_arrow(
                    F.col("q_emb"), F.col("c_emb"), F.col("q_n"), F.col("c_n")
                ),
                6,
            ).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("cand_id"))
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("query_id", F.col("cand_id").alias("nn_id"), "cos_sim")
    )


# ---------------------------------------------------------------------------

def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark(app_name="r13_ann_ab")
    sc = spark.sparkContext
    pairs = [
        ("knn", knn_old, S.knn_bruteforce),
        ("lsh_shipped_vs_old", lsh_old, S.lsh_ann_topk),
        ("lsh_grouped_vs_old", lsh_old, lsh_grouped),
        ("lsh_mid_vs_old", lsh_old, lsh_mid),
        ("lsh_mid2_vs_old", lsh_old, lsh_mid2),
        ("lsh_mid3_vs_old", lsh_old, lsh_mid3),
    ]
    for name, old_fn, new_fn in pairs:
        a = sorted(map(tuple, old_fn(spark, SF_DIR).collect()))
        b = sorted(map(tuple, new_fn(spark, SF_DIR).collect()))
        assert a == b, f"{name}: output mismatch ({len(a)} vs {len(b)} rows)"
        print(f"{name}: outputs identical ({len(a)} rows)")
    for name, old_fn, new_fn in pairs:
        # warm both once
        noop(old_fn(spark, SF_DIR))
        noop(new_fn(spark, SF_DIR))
        olds, news = [], []
        for i in range(PASSES):
            sc.setJobDescription(f"ab:{name}:old:{i}")
            t0 = time.perf_counter()
            noop(old_fn(spark, SF_DIR))
            olds.append(time.perf_counter() - t0)
            sc.setJobDescription(f"ab:{name}:new:{i}")
            t0 = time.perf_counter()
            noop(new_fn(spark, SF_DIR))
            news.append(time.perf_counter() - t0)
        sc.setJobDescription(None)
        wins = sum(1 for o, n in zip(olds, news) if n < o)
        print(
            f"{name} @ {SF_DIR}: old median {statistics.median(olds):.3f}s "
            f"new median {statistics.median(news):.3f}s "
            f"(new lower in {wins}/{PASSES} passes)\n"
            f"  old {[round(t, 3) for t in olds]}\n"
            f"  new {[round(t, 3) for t in news]}"
        )


if __name__ == "__main__":
    main()
