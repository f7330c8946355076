"""Plan-quality gate: the structural properties tools/plan_audit.py
checks interactively, locked into CI for a fast representative subset
(sf0.001 so the whole module adds ~15 s). Catches regressions like a
dimension join silently degrading to sort-merge-with-shuffle or a filter
no longer reaching the scan.
"""

from __future__ import annotations

import re

import pytest

from map_reduce_engine_cdps_spark.plans.registry import _REGISTRY

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = _REGISTRY[name][0](spark, SF_DIR)
    df.count()
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize(
    "name,n_broadcast",
    [("revenue_by_nation", 2), ("shipping_priority", 1), ("top_return_customers", 2)],
)
def test_dim_joins_broadcast(spark, name, n_broadcast):
    plan = _plan(spark, name)
    assert len(re.findall(r"BroadcastHashJoin", plan)) >= n_broadcast, name
    assert not re.search(r"CartesianProduct", plan), name


def test_topk_is_take_ordered(spark):
    plan = _plan(spark, "danger_topk")
    assert "TakeOrderedAndProject" in plan


def test_filter_pushdown_reaches_scan(spark):
    plan = _plan(spark, "pricing_summary")
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m and m.group(1).strip(), "no filters pushed to the parquet scan"
    # column pruning: the scan must not read all 11 lineitem columns
    schema = re.search(r"ReadSchema: struct<([^>]*)", plan)
    assert schema and schema.group(1).count(",") + 1 <= 6


def test_forecast_revenue_is_scan_bound(spark):
    """Q6 shape: the whole predicate must reach the parquet scan and the
    plan must contain no join — at 100 TB this query is pure scan-rate,
    one partial/final agg, zero wide exchange."""
    plan = _plan(spark, "forecast_revenue")
    # the plan printer truncates long filter lists ("…"), so don't
    # require the closing bracket
    m = re.search(r"PushedFilters: \[(.*?)(?:\], |\.\.\.)", plan)
    assert m and "l_shipdate" in m.group(1) and "l_discount" in m.group(1)
    assert "Join" not in plan
    schema = re.search(r"ReadSchema: struct<([^>]*)", plan)
    assert schema and schema.group(1).count(",") + 1 <= 4


def test_top_revenue_supplier_broadcasts(spark):
    """Q15 shape: the 1-row max and the supplier dim must both arrive as
    broadcasts; the per-supplier aggregate is the only data-sized
    shuffle."""
    plan = _plan(spark, "top_revenue_supplier")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_bucketed_join_has_no_exchange(spark):
    """Both sides are written bucketBy(8, join_key), so the sort-merge
    join must consume the bucketed scans directly — any Exchange feeding
    the join means the write-time partitioning was wasted. The only
    allowed exchange is the tiny post-join groupBy on o_orderstatus."""
    plan = _plan(spark, "bucketed_join_stats")
    join_part = plan.split("SortMergeJoin")[-1]  # subtree feeding the join
    assert "SortMergeJoin" in plan
    assert "Exchange" not in join_part, join_part[:1500]
    # post-agg hash exchange + final orderBy range exchange only
    assert len(re.findall(r"Exchange", plan)) <= 2
    assert re.search(r"Bucketed: true", plan)


def test_runtime_bloom_filter_join_pruning(spark):
    """Runtime bloom-filter injection: a shuffle join whose build side is
    selectively filtered must push a bloom_filter_agg of the build keys
    into the probe side's scan stage, so non-joining fact rows die
    before the exchange. At 100 TB this is the difference between
    shuffling the whole fact table and shuffling the ~matching slice.
    Thresholds lowered because the default application-side floor is
    10 GB; the injected plan shape is scale-independent."""
    from pyspark.sql import functions as F

    from map_reduce_engine_cdps_spark.sources.readers import load_table

    tuned = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k) for k in tuned}
    for k, v in tuned.items():
        spark.conf.set(k, v)
    try:
        li = load_table(spark, SF_DIR, "lineitem").select(
            "l_orderkey", "l_quantity"
        )
        ords = (
            load_table(spark, SF_DIR, "orders")
            .filter(F.col("o_totalprice") > 400000)
            .select("o_orderkey")
        )
        j = li.join(ords, li.l_orderkey == ords.o_orderkey).select("l_quantity")
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan, plan[:2000]
        assert "might_contain" in plan.lower() or "bloomFilter" in plan
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_dynamic_partition_pruning(spark, tmp_path):
    """Joining a hive-partitioned fact on its partition column against a
    filtered dim must inject a dynamicpruningexpression into the scan's
    PartitionFilters — at 100 TB this is what turns 'scan every
    partition then join' into 'scan only the partitions the dim
    selects', without the query author naming them statically."""
    from pyspark.sql import functions as F

    from map_reduce_engine_cdps_spark.sources.readers import load_table

    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    out = str(tmp_path / "dpp_events")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(out)
    fact = spark.read.parquet(out)
    dim = spark.createDataFrame(
        [("click", "keep"), ("purchase", "keep"), ("view", "drop"),
         ("error", "drop"), ("signup", "drop")],
        "event_type string, tag string",
    )
    j = (
        fact.join(dim.filter(F.col("tag") == "keep"), "event_type")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    rows = {r["event_type"]: r["n"] for r in j.collect()}
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruningexpression" in plan, plan[:2000]
    # semantics: only the two kept partitions survive
    expect = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
        if r["event_type"] in ("click", "purchase")
    }
    assert rows == expect


def test_dynamic_partition_pruning_engages(spark, sf_dir, tmp_path):
    """Joining a hive-partitioned fact against a filtered dimension on
    the partition column must inject a dynamicpruning expression into
    the scan's PartitionFilters — at 100 TB this is what turns a
    full-fact scan into reading only the joined partitions."""
    from pyspark.sql import functions as F

    from map_reduce_engine_cdps_spark.sources.readers import load_table

    li = load_table(spark, sf_dir, "lineitem")
    out = str(tmp_path / "fact")
    li.select("l_orderkey", "l_returnflag", "l_extendedprice").write.mode(
        "overwrite"
    ).partitionBy("l_returnflag").parquet(out)
    fact = spark.read.parquet(out)
    dim = spark.createDataFrame([("A", "keep"), ("N", "drop")], "flag string, tag string")
    j = (
        fact.join(
            dim.filter(F.col("tag") == "keep"), fact.l_returnflag == dim.flag
        )
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("rev"))
    )
    j.collect()
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruningexpression" in plan.lower(), plan[:1500]


DEDUP_FAMILY = [
    "minhash_signatures",
    "minhash_lsh_pairs",
    "minhash_containment",
    "ngram_jaccard_topk",
    "near_dup_clusters",
    "near_dup_clusters_star",
    "duplicate_spans",
    "edit_distance_pairs",
    "simhash_hamming_pairs",
    "bbit_minhash_eval",
    "incremental_near_dup",
    "dup_length_bias",
    "cross_source_leakage",
    "dup_graph_triangles",
    "customer_record_linkage",
]


def test_dedup_exchanges_carry_no_string_arrays(spark):
    """No dedup-family exchange may move an array-of-string payload:
    shingle sets cross the one banded shuffle as hashed longs and every
    pair row downstream is scalar-only (plans/dedup.py). This is the
    regression gate for the round-2/3 spill-boundary instability
    (driver sf1: 31.4 s vs 2.1 s on identical code)."""
    from tools.plan_audit import string_array_exchanges

    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        for name in DEDUP_FAMILY:
            df = _REGISTRY[name][0](spark, SF_DIR)
            bad = string_array_exchanges(df)
            assert not bad, f"{name}: string-array shuffle payload {bad}"
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


def test_lsh_pair_exchanges_are_scalar_only(spark):
    """Stronger shape check for the LSH verifier itself: downstream of
    the single banded exchange (the only one allowed to carry ANY array
    — hashed-long shingle sets), the pair-dedup exchange must carry only
    scalar columns."""
    from tools.plan_audit import exchange_payload_types

    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = _REGISTRY["minhash_lsh_pairs"][0](spark, SF_DIR)
        payloads = exchange_payload_types(df)
        array_cols = [t for t in payloads if t[2].startswith("array<")]
        # exactly one exchange may carry arrays: the banded shuffle,
        # whose shingle payload is array<bigint>
        assert all(t[2] == "array<bigint>" for t in array_cols), array_cols
        nodes_with_arrays = {t[0] + t[1] for t in array_cols}
        assert len({t[1] for t in array_cols}) <= 1, nodes_with_arrays
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


ANN_FAMILY_ARRAY_EXCHANGE_BOUNDS = {
    # embeddings may cross a shuffle Exchange at most once per relation
    # (re-attach / probe join); rank windows shuffle scalars only unless
    # a Partial WindowGroupLimit bounds the exchange (r12 exemption, see
    # rank_window_array_exchanges).
    "knn_bruteforce": 1,        # r13 grouped kernel: ONE salt-group
                            # exchange carries the corpus ×1 (queries
                            # replicated via broadcast range) — the
                            # bucket_pair_cos shape; the old 0-crossing
                            # shape paid 10×2 embeddings per pair at
                            # the Arrow boundary instead
    "lsh_ann_topk": 0,          # bucket join broadcasts the candidate
                            # side at this SF (size-based, not hinted —
                            # at scale the planner shuffles instead);
                            # r13 kept the pair-join shape (grouped /
                            # semi-prefilter variants measured slower
                            # at sf0.1, receipts in tools/r13_ann_ab)
                            # but eqNullSafe keys now stop the bucket
                            # UDF from evaluating twice per side
    "ann_recall_eval": 1,       # LSH side broadcasts; the exact side
                            # is knn_bruteforce and inherits its one
                            # salt-group crossing (r13)
    "ivf_ann_topk": 4,          # r12 carry-through-window shape: q_emb /
                            # c_emb each cross their rank exchange
                            # (corpus×n rows — partial WindowGroupLimit
                            # prunes map-side BEFORE the shuffle, see
                            # rank_window_array_exchanges' WGL
                            # exemption) + the probe join's two list_id
                            # exchanges. The r5-r11 shape also moved
                            # the corpus arrays for its re-attach
                            # (broadcast locally, a corpus shuffle at
                            # scale) but paid a second scan + second
                            # norm pass for it (OPTIMIZATION_r12.md).
    "embedding_near_dup": 2,    # load_parallel's local-mode
                            # repartition (file splits provide this on
                            # a cluster) + ONE bucket shuffle shared
                            # by the EMB_BUCKET_CAP rank and the
                            # pairing join — Window+Filter preserve
                            # the partitioning, so pairing adds no
                            # exchange (a scalar-rank semi-join shape
                            # measured 3 crossings; this shape wins)
    "semdedup_prune": 3,        # min_by partial-agg structs: one row
                            # per group after map-side combine (x2
                            # argmin exchanges) + one plain join
}


def test_ann_rank_exchanges_are_scalar_only(spark):
    """VERDICT r4 item 8: no ANN-family Exchange feeding a rank/argmin
    Window may carry an array payload — in bucketed shapes that
    exchange moves K scored rows per vector, so an embedding there is
    K× the corpus (the ANN analogue of the dedup string-array ban).

    Exemption: embedding_near_dup's EMB_BUCKET_CAP rank rides the ONE
    bucket shuffle the pairing self-join needs anyway — a corpus-x1
    payload, not the K-multiplied shape this gate exists for — and the
    crossings-bound test pins that exchange count at 1."""
    from tools.plan_audit import rank_window_array_exchanges

    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        for name in ANN_FAMILY_ARRAY_EXCHANGE_BOUNDS:
            if name == "embedding_near_dup":
                continue
            df = _REGISTRY[name][0](spark, SF_DIR)
            bad = rank_window_array_exchanges(df)
            assert not bad, f"{name}: array payload on a rank-window shuffle {bad}"
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


def test_ann_embedding_shuffle_crossings_bounded(spark):
    """Embeddings cross shuffle Exchanges at most the recorded number
    of times per query (broadcast exchanges excluded — small-side
    broadcast IS the intended shape). A new crossing appearing here
    means a join/window reshuffle started moving vectors it didn't
    need to."""
    from tools.plan_audit import shuffle_array_exchange_count

    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        for name, bound in ANN_FAMILY_ARRAY_EXCHANGE_BOUNDS.items():
            df = _REGISTRY[name][0](spark, SF_DIR)
            n = shuffle_array_exchange_count(df)
            assert n <= bound, f"{name}: {n} array shuffle crossings > {bound}"
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


MULTIMODAL_FAMILY = [
    # every registry query whose input is the binary media column
    # (documents-derived payloads or .benchmedia fixtures)
    "doc_embeddings",
    "media_features",
    "image_dhash_dedup",
    "audio_window_features",
    "ppm_image_features",
    "ppm_gradient_features",
    "ppm_cnn_embeddings",
    "ppm_video_frame_samples",
    "wav_audio_windows",
    "video_frame_samples",
]


def test_multimodal_exchanges_carry_no_binary(spark):
    """Media bytes must reach the Arrow decode boundary without riding
    a shuffle: scan -> mapInPandas/pandas_udf -> scalar features, with
    every groupBy/join downstream keyed on scalars (dhash longs, media
    ids, feature columns). A binary Exchange payload here means
    megabyte rows being hashed, sorted, and spilled per shuffle write —
    the multimodal analogue of the dedup string-array ban that caused
    the round-2/3 sf1 instability."""
    from tools.plan_audit import binary_shuffle_exchanges

    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        for name in MULTIMODAL_FAMILY:
            df = _REGISTRY[name][0](spark, SF_DIR)
            bad = binary_shuffle_exchanges(df)
            assert not bad, f"{name}: binary shuffle payload {bad}"
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


def test_eval_global_windows_are_row_bounded(spark):
    """VERDICT r5 item 5: the two eval queries that rank through a
    no-partition window (shingle_size_sensitivity's median rank,
    wand_pruned_retrieval's k-th-score fetch) must keep that window's
    input an eval-scale object. This counts the ACTUAL frames those
    windows sort at the test SF and fails long before a sample-rate or
    threshold change (e.g. a _SHINGLE_SAMPLE_PCT bump) could turn the
    single-partition sort into a million-row bottleneck. Caps live
    next to the queries (SHINGLE_WINDOW_ROW_CAP / WAND_WINDOW_ROW_CAP);
    the margin factor keeps headroom so growth trends trip the gate
    before production scale does."""
    from map_reduce_engine_cdps_spark.plans import dedup, textops

    docs = dedup._shingle_sample(spark, SF_DIR)
    n_sampled = docs.count()
    for n in dedup._SHINGLE_SIZES:
        rows = dedup._shingle_truth_pairs(docs, n).count()
        assert rows <= dedup.SHINGLE_WINDOW_ROW_CAP, (
            f"shingle width {n}: {rows} truth pairs exceed the global-"
            f"window cap {dedup.SHINGLE_WINDOW_ROW_CAP}"
        )
        # quadratic-degeneration tripwire: truth pairs should stay far
        # below the all-pairs count of the sample
        all_pairs = n_sampled * (n_sampled - 1) // 2
        assert rows <= all_pairs // 4 or rows <= 1000, (
            f"shingle width {n}: {rows} of {all_pairs} sample pairs pass "
            "the truth threshold — the sample join is degenerating "
            "toward all-pairs"
        )

    _, scores = textops._wand_contrib_scores(spark, SF_DIR)
    rows = scores.count()
    assert rows <= textops.WAND_WINDOW_ROW_CAP, (
        f"wand k-th-score window input {rows} exceeds cap "
        f"{textops.WAND_WINDOW_ROW_CAP}"
    )


def test_round6_global_windows_are_value_bounded(spark):
    """The two round-6 queries that rank through a no-partition window
    must keep that window's input bounded by DESIGN, not by data size:
    quality_score_auc sorts one row per DISTINCT 4-decimal score
    (≤ 10001 values whatever the corpus), chi2_term_selection sorts the
    df-thresholded vocabulary (Heaps-sublinear; capped here with
    headroom so a tokenizer change trips the gate first), and
    bootstrap_revenue_ci's percentile sort is exactly _BOOT_B rows."""
    from map_reduce_engine_cdps_spark.functions import text as TX
    from map_reduce_engine_cdps_spark.plans import analytics, textops
    from map_reduce_engine_cdps_spark.sources.readers import load_parallel

    from pyspark.sql import functions as F

    docs = load_parallel(spark, SF_DIR, "documents")
    tok = TX.tokens(F.col("text"))
    n_scores = (
        docs.select(F.round(TX.stopword_ratio(tok), 4).alias("s"))
        .distinct()
        .count()
    )
    assert n_scores <= 10001  # structural bound of the 4-decimal ratio

    vocab = (
        docs.select(
            "doc_id",
            F.explode(F.array_distinct(TX.clean_tokens(F.col("text")))).alias(
                "term"
            ),
        )
        .groupBy("term")
        .count()
        .filter(F.col("count") >= textops._CHI2_MIN_DF)
        .count()
    )
    assert vocab <= 50_000, (
        f"chi2 ranking window input {vocab} terms — df>={textops._CHI2_MIN_DF} "
        "vocabulary no longer eval-scale"
    )
    assert analytics._BOOT_B <= 4096


def test_eval_sample_tiers_certified_rates_and_sql_parity():
    """Fixed-budget eval sampling (round 6): every certified SF's doc
    count (≤ 100k) must keep the original sample rates — the tier only
    engages beyond sf1 — and the DuckDB CASE must agree with the
    Python tier at every boundary, else truth fronts diverge."""
    import duckdb

    from map_reduce_engine_cdps_spark.plans.dedup import (
        RECALL_SAMPLE_PCT,
        _RECALL_SAMPLE_TIERS,
        _SHINGLE_SAMPLE_PCT,
        _SHINGLE_TIERS,
        _tier_pct,
        _tier_pct_sql,
    )

    for n in (500, 5_000, 50_000, 100_000):
        assert _tier_pct(n, _RECALL_SAMPLE_TIERS) == RECALL_SAMPLE_PCT
        assert _tier_pct(n, _SHINGLE_TIERS) == _SHINGLE_SAMPLE_PCT
    assert [
        _tier_pct(n, _RECALL_SAMPLE_TIERS)
        for n in (100_001, 300_000, 300_001, 10**9)
    ] == [20, 20, 10, 10]
    for tiers in (_RECALL_SAMPLE_TIERS, _SHINGLE_TIERS):
        rates = [_tier_pct(n, tiers) for n in (1, 10**5, 10**6, 10**9)]
        assert rates == sorted(rates, reverse=True), "tiers must not grow"
        for n in (500, 100_000, 100_001, 300_000, 300_001, 10**7):
            con = duckdb.connect()
            con.execute(f"CREATE TABLE documents AS SELECT * FROM range({n})")
            got = con.execute(f"SELECT {_tier_pct_sql(tiers)}").fetchone()[0]
            assert got == _tier_pct(n, tiers), (tiers, n)


@pytest.mark.parametrize(
    "name,n_shj",
    [
        ("adamic_adar_links", 3),
        ("ktruss_edges", 3),
        ("clustering_coefficients", 2),
        ("dup_graph_triangles", 2),
    ],
)
def test_graph_family_memo_joins_are_shuffle_hash(spark, name, n_shj):
    """r7 sf10 regression gate: every memo-derived join side in the
    graph family carries an explicit shuffle_hash hint — Catalyst
    misestimates the checkpointed/persisted LSH pair front and
    broadcast-OOMs at sf10 without them (SCALE.md rule 7; the probe
    caught adamic/LPA/ktruss as ERRORs). Hints force ShuffledHashJoin
    regardless of size estimates, so counting SHJ operators in the
    executed plan fails the moment a hint is dropped."""
    plan = _plan(spark, name)
    got = len(re.findall(r"ShuffledHashJoin", plan))
    assert got >= n_shj, f"{name}: expected >= {n_shj} ShuffledHashJoin, saw {got}"


def test_lpa_round_join_is_shuffle_hash(spark):
    """The LPA loop checkpoints each round eagerly, so its hinted join
    never appears in the final plan — gate the round helper directly
    (same sf10 broadcast-OOM regression as the test above)."""
    from map_reduce_engine_cdps_spark.plans.dedup import _lsh_pairs_cached
    from map_reduce_engine_cdps_spark.plans.graph import _lpa_round
    from pyspark.sql import functions as F

    pairs = _lsh_pairs_cached(spark, SF_DIR).select("doc_a", "doc_b")
    e = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")).union(
        pairs.select(F.col("doc_b"), F.col("doc_a"))
    )
    labels = e.select(F.col("src").alias("v")).distinct().withColumn(
        "lbl", F.col("v")
    )
    df = _lpa_round(e, labels)
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"ShuffledHashJoin", plan), plan[:2000]


def test_certification_window_names_all_have_oracles():
    """The driver gate = the first 50 registry names; a rows-only
    (no-oracle) name in that window burns a certification slot as a
    permanent err:no_oracle row (the r2/r3 one_vs_one_shim lesson,
    VERDICT r6 'What's wrong' #1). Pure structural check — no Spark."""
    from map_reduce_engine_cdps_spark.plans.registry import _REGISTRY

    window = list(_REGISTRY)[:50]
    missing = [n for n in window if _REGISTRY[n][1] is None]
    assert not missing, f"no-oracle names in the gate window: {missing}"


# --- round-12 optimization shape pins (OPTIMIZATION_r12.md) ---


def test_simhash_tokenizes_once(spark):
    """Round 12: _simhash_per_doc computes votes inline on the
    (doc_id, term, count) aggregate — exactly ONE tokenize/explode
    (Generate) in the whole plan. The r5-r11 dictionary-join shape
    planned the explode twice (vocab branch + join branch); a second
    Generate reappearing here means the double tokenize pass is back."""
    from map_reduce_engine_cdps_spark.plans.dedup import _simhash_per_doc

    df = _simhash_per_doc(spark, SF_DIR)
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_gen = len(re.findall(r"\bGenerate explode", plan))
    assert n_gen == 1, f"expected 1 tokenize Generate, found {n_gen}:\n{plan[:2000]}"


def test_tfidf_tf_is_checkpointed(spark):
    """Round 12: tfidf_top_terms localCheckpoints the tf aggregate so
    the corpus is tokenized once per run (the tf subtree is consumed by
    both the dfreq branch and the join probe side). The checkpoint
    truncates lineage, so the final plan must NOT contain a tokenize
    Generate — the tf rows come from the checkpointed RDD scan."""
    df = _REGISTRY["tfidf_top_terms"][0](spark, SF_DIR)
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Generate explode" not in plan, plan[:2000]
    assert "ExistingRDD" in plan or "Scan ExistingRDD" in plan, plan[:2000]


def test_ivf_rank_exchange_is_wgl_bounded(spark):
    """Round 12: the IVF rank exchanges may carry the embedding ONLY
    because a Partial WindowGroupLimit prunes map-side to <= n rows per
    vector first (plan_audit's WGL exemption). If the partial WGL ever
    disappears (optimizer regression / shape change), the exemption
    must stop applying and the scalar-only audit must flag the plan."""
    from tools.plan_audit import rank_window_array_exchanges

    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = _REGISTRY["ivf_ann_topk"][0](spark, SF_DIR)
        # the audit returns [] — arrays present but WGL-bounded
        assert rank_window_array_exchanges(df) == []
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "WindowGroupLimit" in plan and "Partial" in plan, plan[:2000]
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


# --- round-13 optimization shape pins (OPTIMIZATION_r13.md) ---


def test_wgl_bound_covers_nprobe_sweep():
    """ADVICE r12: plan_audit's WGL exemption (limit <= WGL_BOUND) and
    the IVF probe counts are coupled only by convention — make the
    relationship explicit so raising NPROBE past the bound is a loud,
    reviewed ratchet flip, not a silent plan-audit failure. Pure
    structural check — no Spark."""
    from map_reduce_engine_cdps_spark.plans.similarity import (
        NPROBE,
        _NPROBE_SWEEP,
    )
    from tools.plan_audit import WGL_BOUND

    assert max(_NPROBE_SWEEP) <= WGL_BOUND
    assert NPROBE <= WGL_BOUND


def test_knn_grouped_kernel_single_crossing(spark):
    """Round 13: knn_bruteforce scores via ONE grouped Arrow crossing
    (FlatMapGroupsInPandas over hash-salt groups) — no per-pair
    ArrowEvalPython passes remain (the old shape shipped the corpus
    once per query with BOTH embeddings on every pair row, plus a
    full-corpus norm pass). An ArrowEvalPython reappearing here means
    the pair-join shape is back."""
    df = _REGISTRY["knn_bruteforce"][0](spark, SF_DIR)
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan, plan[:2000]
    assert "ArrowEvalPython" not in plan, plan[:2000]


def test_lsh_bucket_kernel_not_duplicated(spark):
    """Round 13: lsh_ann_topk joins on eqNullSafe(bucket) so Catalyst
    cannot infer isnotnull(bucket) and duplicate the deterministic
    bucket UDF below the pushed filter (guide §4.4) — the r5-r12 plans
    ran the Arrow bucket kernel TWICE over the full corpus. Executed
    plan: exactly 3 ArrowEvalPython nodes (query norm+bucket, corpus
    norm+bucket — Spark merges adjacent independent UDFs — and the
    pair dot); a 4th means the inferred-null-filter duplication is
    back."""
    df = _REGISTRY["lsh_ann_topk"][0](spark, SF_DIR)
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    n = len(re.findall(r"ArrowEvalPython", plan))
    assert n <= 3, f"expected <=3 ArrowEvalPython, found {n}:\n{plan[:2000]}"


def test_one_vs_one_multicast_payload_is_minimal(spark):
    """Round 13 (VERDICT r12 item 6): the pair-multicast exchange
    feeding the grouped trainer must carry exactly the trainer's
    columns — label_a/label_b (pair key), label, vec_id, embedding.
    Any extra attribute here is multiplied K-1 times per embedding row
    by the multicast."""
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = _REGISTRY["one_vs_one_training"][0](spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)

    def find_fmg(node):
        if "FlatMapGroupsInPandas" in node.nodeName():
            return node
        ch = node.children()
        for i in range(ch.size()):
            r = find_fmg(ch.apply(i))
            if r is not None:
                return r
        return None

    fmg = find_fmg(plan)
    assert fmg is not None
    child = fmg.children().apply(0)
    attrs = child.output()
    names = {attrs.apply(i).name() for i in range(attrs.size())}
    assert names == {"label_a", "label_b", "label", "vec_id", "embedding"}, names


def test_quality_filter_flags_scan_is_parallel(spark):
    """Round 12: quality_filter_flags re-parallelizes the one-file scan
    (load_parallel) — the modal-token HOF is the per-row cost center
    and must not run single-threaded in local mode."""
    df = _REGISTRY["quality_filter_flags"][0](spark, SF_DIR)
    par = spark.sparkContext.defaultParallelism
    assert df.rdd.getNumPartitions() >= min(par, 2)
