"""Reference-fixture replay (SURVEY.md §5.2 item 4; FIXTURES.md F1/F2):
wordcount against the reference's checked-in corpus goldens, and the
accident pipeline through both the DataFrame path and the compat shim.
"""

from __future__ import annotations

import os

import pytest

from map_reduce_engine_cdps_spark.compat.mapreduce import run_task
from map_reduce_engine_cdps_spark.plans.workloads import (
    acc_map,
    acc_reduce,
    accident_danger_df,
    accident_danger_shim,
    wc_map,
    wc_reduce,
)

REF_DATA = "/root/reference/data"

# FIXTURES.md F1 golden (34 distinct words, 50 tokens)
GOLDEN_WC_HEAD = {"hello": 6, "map": 5, "reduce": 5, "distributed": 4, "world": 4}
GOLDEN_ONES = [
    "and", "at", "class", "combine", "complexity", "engine", "everything",
    "everywhere", "fourth", "fun", "great", "now", "one", "parallel",
    "powerful", "processing", "results", "scale", "systems", "tasks",
    "two", "wide", "wisely", "your",
]


@pytest.mark.skipif(not os.path.isdir(REF_DATA), reason="reference corpus absent")
def test_wordcount_golden_replay(spark):
    """Wordcount over the reference's 4-node sample corpus must match
    the FIXTURES.md F1 golden table — through the shim."""
    lines = []
    for node in sorted(os.listdir(REF_DATA)):
        path = os.path.join(REF_DATA, node, "sample.txt")
        if os.path.isfile(path):
            with open(path) as fh:
                lines.extend(ln.rstrip("\n") for ln in fh)
    got = dict(
        run_task(spark, lines, wc_map, reduce_func=wc_reduce, num_partitions=4).collect()
    )
    assert len(got) == 34
    # FIXTURES.md F1 says "50 total tokens" but the checked-in corpus
    # actually has 61 (per-word golden counts below sum to 61 and all
    # match); the distinct-word count and every per-word golden agree.
    assert sum(got.values()) == 61
    for w, c in GOLDEN_WC_HEAD.items():
        assert got[w] == c, w
    for w in GOLDEN_ONES:
        assert got[w] == 1, w
    assert got["from"] == 3 and got["is"] == 3 and got["node"] == 3
    assert got["computing"] == 2 and got["the"] == 2


ACC_ROWS = [
    # normal row: Junction wins (Station=False), Fair, Day
    {"Severity": "3", "Distance(mi)": "1.5", "Start_Time": "2023-01-01 10:00:00",
     "End_Time": "2023-01-01 11:30:00", "Weather_Condition": "Fair",
     "Sunrise_Sunset": "Day", "Station": "False", "Junction": "True"},
    # flag priority: Station listed first wins over Junction
    {"Severity": "2", "Distance(mi)": "0.5", "Start_Time": "2023-01-01 22:00:00",
     "End_Time": "2023-01-01 22:30:00", "Weather_Condition": "Light Rain",
     "Sunrise_Sunset": "Night", "Station": "True", "Junction": "True"},
    # defaults: missing severity→1, distance→0, weather→Unknown, tod→Day
    {"Start_Time": "2023-02-01 08:00:00", "End_Time": "2023-02-01 08:00:00"},
    # bad cast + truncated-microseconds timestamp parse ([:19])
    {"Severity": "oops", "Distance(mi)": "n/a",
     "Start_Time": "2023-03-05 01:02:03.456789", "End_Time": "2023-03-05 03:02:03.999",
     "Weather_Condition": "Mostly Cloudy", "Sunrise_Sunset": "Night"},
    # unparseable timestamps → duration 0
    {"Severity": "4", "Distance(mi)": "2", "Start_Time": "not-a-date",
     "End_Time": "also-bad", "Weather_Condition": "Partly Sunny",
     "Sunrise_Sunset": "Day", "Crossing": "True"},
    # weather substring bucket: storm → BadWeather
    {"Severity": "5", "Distance(mi)": "0", "Start_Time": "2023-04-01 12:00:00",
     "End_Time": "2023-04-01 13:00:00", "Weather_Condition": "Thunderstorm",
     "Sunrise_Sunset": "Day", "Roundabout": "True"},
    # duplicate of key group 1 for a multi-row group
    {"Severity": "1", "Distance(mi)": "3.0", "Start_Time": "2023-01-02 10:00:00",
     "End_Time": "2023-01-02 12:00:00", "Weather_Condition": "Fair",
     "Sunrise_Sunset": "Day", "Junction": "True"},
]

ALL_COLS = [
    "Severity", "Distance(mi)", "Start_Time", "End_Time", "Weather_Condition",
    "Sunrise_Sunset", "Station", "Junction", "Crossing", "Traffic_Signal",
    "Stop", "Railway", "Roundabout",
]


def _rows_as_df(spark):
    normalized = [tuple(r.get(c) for c in ALL_COLS) for r in ACC_ROWS]
    schema = ", ".join(f"`{c}` string" for c in ALL_COLS)
    return spark.createDataFrame(normalized, schema=schema)


def test_accident_df_vs_shim(spark):
    """DataFrame pipeline ≡ 4-hook shim program on the F2 fixture rows —
    including defaults, safe casts, flag priority, [:19] truncation,
    failed-parse→0 and the formula string."""
    df_out = {
        r["grp_key"]: r.asDict() for r in accident_danger_df(_rows_as_df(spark)).collect()
    }
    shim_out = {r["grp_key"]: r for r in accident_danger_shim(spark, ACC_ROWS)}
    assert set(df_out) == set(shim_out)
    for key, srow in shim_out.items():
        drow = df_out[key]
        for col in ("cnt", "avg_impact", "min_impact", "max_impact",
                    "log_factor", "danger_score", "formula"):
            assert drow[col] == srow[col], (key, col, drow[col], srow[col])


def test_accident_reference_semantics(spark):
    """Spot-check the tricky F2 semantics end-to-end."""
    out = {r["grp_key"]: r.asDict() for r in accident_danger_df(_rows_as_df(spark)).collect()}
    # flag priority: row 2 must be Station (not Junction); rain → BadWeather
    assert "Station_BadWeather_Night" in out
    # defaults row: None flag, Unknown weather, Day tod; impact = 1*(1+0)*(1+0)=1
    assert out["None_Unknown_Day"]["avg_impact"] == 1.0
    # failed parse → duration 0: severity 4, distance 2 → 4*3*1 = 12
    assert out["Crossing_PartlyClear_Day"]["avg_impact"] == 12.0
    # [:19] truncation: duration exactly 2h despite microsecond suffixes
    assert out["None_Cloudy_Night"]["avg_impact"] == round(1.0 * 1.0 * 3.0, 2)
    # storm bucket
    assert "Roundabout_BadWeather_Day" in out
    # multi-row group: two Junction_Fair_Day rows
    assert out["Junction_Fair_Day"]["cnt"] == 2


def test_acc_map_reduce_hooks_direct():
    """The shim hooks are plain functions — unit-check one row inline
    (tuple shape, impact arithmetic)."""
    key, impact = acc_map([ACC_ROWS[0]], 0)[0]
    assert key == "Junction_Fair_Day"
    assert impact == 3.0 * (1 + 1.5) * (1 + 1.5)  # 1.5h duration
    [res] = acc_reduce([(key, [impact])], 2)
    assert res["cnt"] == 1 and res["danger_score"] == round(
        round(impact, 2) * 0.69, 2
    )


# --- epoch shuffle / source interleave / transition matrix semantics ---


def test_epoch_shuffle_is_per_epoch_permutation(spark, sf_dir, tmp_path):
    from map_reduce_engine_cdps_spark.plans import curation

    df = curation.epoch_shuffle(spark, sf_dir).collect()
    by_epoch = {}
    for r in df:
        by_epoch.setdefault(r["epoch"], []).append((r["position"], r["doc_id"]))
    assert set(by_epoch) == {0, 1, 2}
    orders = {e: [d for _, d in sorted(v)] for e, v in by_epoch.items()}
    # deterministic: same call twice gives identical order
    again = curation.epoch_shuffle(spark, sf_dir).collect()
    orders2 = {}
    for r in again:
        orders2.setdefault(r["epoch"], []).append((r["position"], r["doc_id"]))
    assert orders == {e: [d for _, d in sorted(v)] for e, v in orders2.items()}
    # epochs genuinely differ (md5 keyed on epoch)
    assert orders[0] != orders[1] != orders[2]
    # write path: no global sort, but file-name order == key order and
    # the doc multiset is preserved exactly
    out = str(tmp_path / "epoch0")
    curation.epoch_shuffle_write(spark, sf_dir, out, epoch=0, n_files=4)
    back = spark.read.parquet(out)
    n_docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    )
    assert back.count() == n_docs
    assert back.select("doc_id").distinct().count() == n_docs
    import glob

    files = sorted(glob.glob(f"{out}/part-*"))
    assert len(files) == 4
    last_max = ""
    for f in files:  # range partitioning ⇒ keys ascend across files
        pdf = spark.read.parquet(f).select("shuffle_key").toPandas()
        assert pdf["shuffle_key"].is_monotonic_increasing
        assert pdf["shuffle_key"].iloc[0] >= last_max
        last_max = pdf["shuffle_key"].iloc[-1]


def test_source_interleave_stride_semantics(spark, sf_dir):
    from map_reduce_engine_cdps_spark.plans import curation

    rows = sorted(
        curation.source_interleave(spark, sf_dir).collect(),
        key=lambda r: r["rank"],
    )
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    # stride scheduling: in any prefix, a weight-w source has emitted
    # floor(vtime_max * w) ± 1 docs; check relative rates w=3 vs w=1
    prefix = rows[:120]
    from collections import Counter

    def weight(src):
        import re

        return 1 + int(re.search(r"(\d+)", src).group(1)) % 3

    cnt = Counter(r["source"] for r in prefix)
    w1 = [s for s in cnt if weight(s) == 1]
    w3 = [s for s in cnt if weight(s) == 3]
    assert w1 and w3
    avg1 = sum(cnt[s] for s in w1) / len(w1)
    avg3 = sum(cnt[s] for s in w3) / len(w3)
    assert 2.0 <= avg3 / avg1 <= 4.0  # ~3× emission rate


def test_transition_matrix_rows_normalize(spark, sf_dir):
    from map_reduce_engine_cdps_spark.plans import analytics

    rows = analytics.event_transition_matrix(spark, sf_dir).collect()
    from collections import defaultdict

    psum = defaultdict(float)
    for r in rows:
        assert r["n"] > 0
        psum[r["from_type"]] += r["prob"]
    for ft, s in psum.items():
        assert abs(s - 1.0) < 1e-4, (ft, s)


def test_pii_redaction_covers_every_contact(spark, sf_dir):
    """Every synthesized contact card carries exactly one email and one
    phone, so redaction counts must equal the customer count and the
    redacted text must be strictly shorter (both tokens shrink)."""
    from map_reduce_engine_cdps_spark.plans.curation import pii_redaction_stats

    rows = pii_redaction_stats(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["emails_redacted"] == r["n_customers"]
        assert r["phones_redacted"] == r["n_customers"]
        assert r["chars_removed"] > 0


def test_semdedup_prune_keep_rule(spark, sf_dir):
    """The earliest vec_id in every cluster can never be pruned (no
    earlier neighbor exists), and at least one vector survives while at
    least one is pruned at the chosen tau on this corpus."""
    from map_reduce_engine_cdps_spark.plans.similarity import semdedup_prune

    rows = semdedup_prune(spark, sf_dir).collect()
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for members in by_cluster.values():
        first = min(members, key=lambda r: r["vec_id"])
        assert not first["is_pruned"]
    flags = {r["is_pruned"] for r in rows}
    assert flags == {True, False}


def test_ccnet_buckets_balanced_per_lang(spark, sf_dir):
    """ntile(3) terciles: per language all three buckets appear, sizes
    differ by at most one, and mean score is monotone head<=middle<=tail
    (head = best = lowest avg negative log-prob)."""
    from map_reduce_engine_cdps_spark.plans.textops import ccnet_perplexity_buckets

    rows = ccnet_perplexity_buckets(spark, sf_dir).collect()
    langs = {}
    for r in rows:
        langs.setdefault(r["lang"], {})[r["bucket"]] = r
    for lang, buckets in langs.items():
        assert set(buckets) == {"head", "middle", "tail"}, lang
        sizes = [buckets[b]["n_docs"] for b in ("head", "middle", "tail")]
        assert max(sizes) - min(sizes) <= 1, lang
        scores = [buckets[b]["mean_score"] for b in ("head", "middle", "tail")]
        assert scores[0] <= scores[1] <= scores[2], lang


def test_dsir_weights_favor_target_language(spark, sf_dir):
    """DSIR sanity: the mean importance log-weight of target-language
    (en) docs must exceed the mean over non-target docs — selecting by
    the weight should pull the sample toward the target domain."""
    from map_reduce_engine_cdps_spark.plans.curation import dsir_importance_weights

    rows = dsir_importance_weights(spark, sf_dir).collect()
    en = [r["dsir_logw"] for r in rows if r["lang"] == "en"]
    rest = [r["dsir_logw"] for r in rows if r["lang"] != "en"]
    assert en and rest
    assert sum(en) / len(en) > sum(rest) / len(rest)


def test_containment_bounds_and_dominates_jaccard(spark, sf_dir):
    """Containment >= Jaccard always (min-normalizer <= union), both in
    [0,1], and every reported pair clears the containment threshold."""
    from map_reduce_engine_cdps_spark.plans.dedup import (
        CONTAINMENT_MIN,
        minhash_containment,
    )

    rows = minhash_containment(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert CONTAINMENT_MIN <= r["containment"] <= 1.0
        assert 0.0 <= r["jaccard"] <= 1.0
        assert r["containment"] >= r["jaccard"]


def test_pq_codebook_shape_and_coverage(spark, sf_dir):
    """Every (vec, subspace) is assigned exactly once: per-subspace
    usage counts sum to the corpus size, and reconstruction error is
    nonnegative everywhere."""
    from map_reduce_engine_cdps_spark.plans.similarity import PQ_M, pq_quantize_stats
    from map_reduce_engine_cdps_spark.sources.readers import load_table

    n_vecs = load_table(spark, sf_dir, "embeddings").count()
    rows = pq_quantize_stats(spark, sf_dir).collect()
    per_sub = {}
    for r in rows:
        per_sub[r["sub_id"]] = per_sub.get(r["sub_id"], 0) + r["n_vecs"]
        assert r["avg_sq_err"] >= 0.0
    assert set(per_sub) == set(range(PQ_M))
    assert all(v == n_vecs for v in per_sub.values())


def test_nb_confusion_partitions_test_fold(spark, sf_dir):
    """Confusion cells cover the held-out fold exactly once: counts sum
    to the number of test docs with at least one token, and every
    predicted language is one observed in training."""
    from map_reduce_engine_cdps_spark.plans.textops import (
        NB_FOLDS,
        NB_TEST_FOLD,
        nb_lang_confusion,
    )
    from map_reduce_engine_cdps_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    rows = nb_lang_confusion(spark, sf_dir).collect()
    langs = {r["lang"] for r in docs.select("lang").distinct().collect()}
    n_test = docs.filter(f"doc_id % {NB_FOLDS} = {NB_TEST_FOLD}").count()
    assert sum(r["n_docs"] for r in rows) == n_test
    for r in rows:
        assert r["true_lang"] in langs and r["pred_lang"] in langs


def test_dot_arrow_bitwise_equals_fold(spark, sf_dir):
    """The Arrow-vectorized dot must be BIT-identical to the JVM fold
    on real embedding pairs (cumsum reproduces the left fold order)."""
    from pyspark.sql import functions as F

    from map_reduce_engine_cdps_spark.functions import vectors as V
    from map_reduce_engine_cdps_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.select(F.col("vec_id").alias("ia"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("ib"), F.col("embedding").alias("eb"))
    pairs = a.join(b, F.col("ia") % 17 == F.col("ib") % 17).limit(5000)
    dot_pd = V.dot_arrow()
    mx = (
        pairs.select(
            F.abs(
                dot_pd(F.col("ea"), F.col("eb")) - V.dot(F.col("ea"), F.col("eb"))
            ).alias("d")
        )
        .agg(F.max("d"))
        .collect()[0][0]
    )
    assert mx == 0.0


def test_lsh_bucket_and_norm_arrow_bitwise_equal_fold(spark, sf_dir):
    """lsh_bucket_arrow / norm_arrow must be BIT-identical to the JVM
    interpreted formulations on every real embedding (the cumsum
    reproduces the fold's left-to-right addition; sqrt is IEEE
    correctly-rounded in both engines). The DuckDB oracles mirror the
    fold formulation, so this pin is what lets the hot paths use the
    Arrow twins without touching any oracle."""
    from pyspark.sql import functions as F

    from map_reduce_engine_cdps_spark.functions import vectors as V
    from map_reduce_engine_cdps_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    for planes in (8, 10):
        n_mismatch = (
            emb.select(
                V.lsh_bucket(F.col("embedding"), planes).alias("jvm"),
                V.lsh_bucket_arrow(planes)(F.col("embedding")).alias("arw"),
            )
            .filter(F.col("jvm") != F.col("arw"))
            .count()
        )
        assert n_mismatch == 0, f"planes={planes}: {n_mismatch} bucket mismatches"
    norm_pd = V.norm_arrow()
    mx = (
        emb.select(
            F.abs(
                norm_pd(F.col("embedding")) - V.norm(F.col("embedding"))
            ).alias("d")
        )
        .agg(F.max("d"))
        .collect()[0][0]
    )
    assert mx == 0.0


def test_arrow_twins_survive_empty_partitions(spark):
    """Same zero-row-batch guard contract as dot_arrow (VERDICT r2/r3)."""
    from map_reduce_engine_cdps_spark.functions import vectors as V

    df = spark.createDataFrame(
        [(i, [1.0, 2.0, 2.0]) for i in range(3)], "id long, a array<double>"
    ).repartition(8)
    norms = sorted(r["n"] for r in df.select(V.norm_arrow()("a").alias("n")).collect())
    assert norms == [3.0, 3.0, 3.0]
    buckets = df.select(V.lsh_bucket_arrow(4)("a").alias("b")).collect()
    assert len(buckets) == 3 and all(len(r["b"]) == 4 for r in buckets)
    empty = df.filter("id < 0")
    assert empty.select(V.norm_arrow()("a")).count() == 0
    assert empty.select(V.lsh_bucket_arrow(4)("a")).count() == 0


def test_dot_arrow_survives_empty_partitions(spark):
    """Arrow hands zero-row batches to the UDF for empty partitions;
    np.vstack raises on an empty sequence, so the UDF must short-circuit
    (VERDICT r2/r3 finding). Repartition to more partitions than rows to
    force empty ones, and filter-to-empty for the zero-row plan."""
    from pyspark.sql import functions as F

    from map_reduce_engine_cdps_spark.functions import vectors as V

    dot_pd = V.dot_arrow()
    df = spark.createDataFrame(
        [(i, [1.0, 2.0], [3.0, 4.0]) for i in range(3)], "id long, a array<double>, b array<double>"
    ).repartition(8)
    vals = sorted(
        r["d"] for r in df.select(dot_pd("a", "b").alias("d")).collect()
    )
    assert vals == [11.0, 11.0, 11.0]
    empty = df.filter("id < 0").select(dot_pd("a", "b").alias("d"))
    assert empty.count() == 0


def test_cogroup_asof_count_equals_collect(spark, sf_dir):
    """Regression: with both cogroup sides derived from one parent
    DataFrame, Catalyst deduplicated the right side's ts onto the
    left's attribute ids and column pruning under count() starved the
    UDF (count()=0 while collect() had rows). The two sides now come
    from separate scans; count must equal materialized length and the
    as-of join twin's row count."""
    from map_reduce_engine_cdps_spark.plans.relational import (
        click_asof_cogroup,
        click_asof_purchase,
    )

    df = click_asof_cogroup(spark, sf_dir)
    n_count = df.count()
    n_rows = len(df.collect())
    assert n_count == n_rows > 0
    assert n_count == click_asof_purchase(spark, sf_dir).count()


def test_triangle_census_consistency(spark, sf_dir):
    """Triangles close wedges of the near-dup edge list: every reported
    triangle implies its three edges exist, so the count is bounded by
    edges and the closure ratio stays in [0, 3]."""
    from map_reduce_engine_cdps_spark.plans.dedup import dup_graph_triangles

    row = dup_graph_triangles(spark, sf_dir).collect()[0]
    assert row["n_edges"] > 0
    assert 0 <= row["n_triangles"]
    assert 0.0 <= row["closure_ratio"] <= 3.0


def test_length_bucketing_beats_naive(spark, sf_dir):
    """Sorting by length before cutting batches can only reduce padding:
    sorted waste ratio <= naive waste ratio for every language."""
    from map_reduce_engine_cdps_spark.plans.curation import length_bucket_batches

    rows = length_bucket_batches(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["sorted_waste_ratio"] <= r["naive_waste_ratio"] <= 1.0


def test_arrow_kernels_null_and_ragged_contract(spark):
    """ADVICE r4: NULL arrays → SQL NULL from every Arrow kernel
    (matching the JVM folds for dot/norm); ragged batches → a clear
    precondition error, not a bare np.vstack traceback."""
    import pytest

    from map_reduce_engine_cdps_spark.functions import vectors as V

    df = spark.createDataFrame(
        [([1.0, 2.0], [3.0, 4.0]), (None, [1.0, 1.0]), ([1.0, 1.0], None)],
        "a array<double>, b array<double>",
    ).coalesce(1)
    rows = df.select(
        V.dot_arrow()("a", "b").alias("d"),
        V.norm_arrow()("a").alias("n"),
        V.lsh_bucket_arrow()("a").alias("bk"),
    ).collect()
    assert rows[0]["d"] == 11.0 and rows[0]["n"] is not None
    assert len(rows[0]["bk"]) == 8
    assert rows[1]["d"] is None and rows[1]["n"] is None and rows[1]["bk"] is None
    assert rows[2]["d"] is None and rows[2]["n"] is not None

    ragged = spark.createDataFrame(
        [([1.0, 2.0],), ([1.0, 2.0, 3.0],)], "a array<double>"
    ).coalesce(1)
    with pytest.raises(Exception, match="fixed-dimension"):
        ragged.select(V.norm_arrow()("a").alias("n")).collect()
