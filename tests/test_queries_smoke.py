"""Fast sanity layer over the registry: every declared query runs at
sf0.001 and returns a sane DataFrame; plus reference-semantics unit
tests for the expression library (SURVEY.md §5.2 item 3).

(The heavy oracle comparison runs via tools/oracle_check.py and the
round driver; duplicating it per-test would double runtime for no new
signal.)
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from map_reduce_engine_cdps_spark.functions import expressions as X
from map_reduce_engine_cdps_spark.plans.registry import _REGISTRY

# t_closeness_audit only reports classes that clear the k-anonymity
# release bar (n >= KANON_K); at sf0.001 no class does.
EXPECT_EMPTY_OK = {"customers_without_orders", "t_closeness_audit"}


@pytest.mark.parametrize("name", sorted(_REGISTRY))
def test_query_runs(spark, sf_dir, name):
    fn, _sql = _REGISTRY[name]
    df = fn(spark, sf_dir)
    rows = df.collect()
    assert df.columns, name
    if name not in EXPECT_EMPTY_OK:
        assert len(rows) > 0, name


def test_entry_contract(spark):
    import __spark_entry__ as e

    assert set(e.oracle_sql()) <= set(e.queries())
    df = e.entry(spark)
    assert len(df.collect()) > 0


def test_safe_double_fallback(spark):
    df = spark.createDataFrame([("1.5",), ("oops",), (None,)], "s string")
    got = [r[0] for r in df.select(X.safe_double(F.col("s"), 7.0)).collect()]
    assert got == [1.5, 7.0, 7.0]


def test_first_true_flag_priority(spark):
    df = spark.createDataFrame(
        [("False", "True", "True"), ("True", "False", "True"), ("False", "False", "False")],
        "A string, B string, C string",
    )
    got = [r[0] for r in df.select(X.first_true_flag(["A", "B", "C"])).collect()]
    assert got == ["B", "A", "None"]


def test_parse_ts_truncates_to_seconds(spark):
    df = spark.createDataFrame(
        [("2023-01-01 10:00:00.999999",), ("garbage",)], "s string"
    )
    got = df.select(X.parse_ts_seconds(F.col("s")).alias("ts")).collect()
    assert str(got[0]["ts"]) == "2023-01-01 10:00:00"
    assert got[1]["ts"] is None


def test_duration_hours_failed_parse_is_zero(spark):
    df = spark.createDataFrame([("bad", "2023-01-01 01:00:00")], "a string, b string")
    got = df.select(
        X.duration_hours(X.parse_ts_seconds(F.col("a")), X.parse_ts_seconds(F.col("b")))
    ).collect()
    assert got[0][0] == 0.0


def test_bucket_weather_cases(spark):
    cases = [
        ("Fair", "Fair"),
        ("Mostly Cloudy", "Cloudy"),
        ("overcast sky", "Cloudy"),
        ("Partly Sunny", "PartlyClear"),
        ("Clear", "PartlyClear"),
        ("Heavy Rain", "BadWeather"),
        ("Snow Showers", "BadWeather"),
        ("whatever", "Unknown"),
    ]
    df = spark.createDataFrame([(c,) for c, _ in cases], "w string")
    got = [r[0] for r in df.select(X.bucket_weather(F.col("w"))).collect()]
    assert got == [e for _, e in cases]


def test_connected_components_transitivity(spark):
    """a~b, b~c must land in one cluster; isolated vertex stays its own;
    two disjoint chains don't merge."""
    from map_reduce_engine_cdps_spark.plans.dedup import connected_components

    vertices = spark.createDataFrame([(i,) for i in range(7)], "doc_id long")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "doc_a long, doc_b long"
    )
    got = {
        r["doc_id"]: r["comp"]
        for r in connected_components(vertices, pairs).collect()
    }
    assert got == {0: 0, 1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 5}


def test_window_hashes_edges(spark):
    """Short-doc guard (Spark's sequence() counts DOWN when stop < 1):
    size < w → empty array, size == w → exactly one window, size == w+1
    → two overlapping windows whose hashes differ."""
    import hashlib

    from map_reduce_engine_cdps_spark.functions import text as TX

    rows = [
        ("a b c",),                      # 3 tokens < w
        ("a b c d",),                    # == w
        ("a b c d e",),                  # w + 1
    ]
    df = spark.createDataFrame(rows, "text string")
    got = [
        r[0]
        for r in df.select(
            TX.window_hashes(TX.tokens(F.col("text")), 4)
        ).collect()
    ]
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    assert got[0] == []
    assert got[1] == [md5("a b c d")]
    assert got[2] == [md5("a b c d"), md5("b c d e")]


def test_connected_components_deep_chain_crosses_checkpoint_boundary(spark):
    """A path graph of diameter 14 needs ~14 propagation rounds — the
    loop crosses the every-5th-round localCheckpoint boundary (and the
    persist/unpersist rotation in between) twice. Regression test for
    the round-5 state-management rework: every vertex must still
    converge to the chain's minimum label."""
    from map_reduce_engine_cdps_spark.plans.dedup import connected_components

    n = 15
    vertices = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    got = {
        r["doc_id"]: r["comp"]
        for r in connected_components(vertices, pairs).collect()
    }
    assert got == {i: 0 for i in range(n)}


def test_embedding_near_dup_bucket_cap_binds(spark, tmp_path, monkeypatch):
    """Exercise the EMB_BUCKET_CAP path with the cap ACTIVE (at every
    certified SF it is inert): 40 identical vectors all land in one LSH
    bucket; with the cap monkeypatched to 16, only the 16 smallest
    vec_ids may pair — C(16,2)=120 pairs, all among vec_id < 16 — vs
    C(40,2)=780 uncapped."""
    import map_reduce_engine_cdps_spark.plans.similarity as S

    rows = [(i, [1.0, 0.0, 0.5, 0.25], i % 4) for i in range(40)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    df.write.parquet(str(tmp_path / "embeddings.parquet"))
    monkeypatch.setattr(S, "EMB_BUCKET_CAP", 16)
    out = S.embedding_near_dup(spark, str(tmp_path)).collect()
    assert len(out) == 120
    ids = {r["vec_a"] for r in out} | {r["vec_b"] for r in out}
    assert ids == set(range(16))
    assert all(r["cos_sim"] == 1.0 for r in out)


def test_connected_components_matches_union_find(spark):
    """Property test for the round-5 CC rework: on random graphs the
    Spark min-label propagation must agree with a reference union-find
    (comp = min doc_id per component). A Spark roundtrip per hypothesis
    example is too slow for @given, so eight seeded random graphs
    (self-loops, parallel edges, isolated vertices all reachable) run
    through one session instead."""
    import random

    from map_reduce_engine_cdps_spark.plans.dedup import connected_components

    for seed in range(8):
        rng = random.Random(seed)
        n = rng.randint(1, 25)
        m = rng.randint(0, 2 * n)
        pairs_py = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(m)
        ]
        # reference union-find
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs_py:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        expected = {}
        comp_min: dict[int, int] = {}
        for v in range(n):
            r = find(v)
            comp_min[r] = min(comp_min.get(r, v), v)
        for v in range(n):
            expected[v] = comp_min[find(v)]

        vertices = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
        pairs = spark.createDataFrame(
            pairs_py or [(0, 0)], "doc_a long, doc_b long"
        )
        got = {
            r["doc_id"]: r["comp"]
            for r in connected_components(vertices, pairs).collect()
        }
        assert got == expected, f"seed {seed}: {got} != {expected}"


def test_connected_components_star_matches_union_find(spark):
    """The large-star/small-star variant (the documented 100 TB swap
    path) must agree with the same reference union-find on the same
    seeded random graphs, plus a 31-node path — the deep-chain case
    where O(log n) rounds beat diameter-many propagation rounds."""
    import random

    from map_reduce_engine_cdps_spark.plans.dedup import (
        connected_components_star,
    )

    cases = []
    for seed in range(8):
        rng = random.Random(seed)
        n = rng.randint(1, 25)
        m = rng.randint(0, 2 * n)
        cases.append(
            (n, [(rng.randrange(n), rng.randrange(n)) for _ in range(m)])
        )
    cases.append((31, [(i, i + 1) for i in range(30)]))  # deep chain

    for n, pairs_py in cases:
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs_py:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        comp_min: dict[int, int] = {}
        for v in range(n):
            r = find(v)
            comp_min[r] = min(comp_min.get(r, v), v)
        expected = {v: comp_min[find(v)] for v in range(n)}

        vertices = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
        pairs = spark.createDataFrame(
            pairs_py or [(0, 0)], "doc_a long, doc_b long"
        )
        got = {
            r["doc_id"]: r["comp"]
            for r in connected_components_star(vertices, pairs).collect()
        }
        assert got == expected, f"{n} nodes: {got} != {expected}"


def _py_kcore(pairs: list[tuple[int, int]], k: int) -> dict[int, int]:
    """Reference peeling: iterate degree-filter to fixpoint; returns
    {vertex: core_degree} for the k-core members."""
    edges = {tuple(sorted(p)) for p in pairs}
    while True:
        deg: dict[int, int] = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {v for v, d in deg.items() if d >= k}
        new_edges = {(a, b) for a, b in edges if a in keep and b in keep}
        if new_edges == edges:
            break
        edges = new_edges
    out: dict[int, int] = {}
    for a, b in edges:
        out[a] = out.get(a, 0) + 1
        out[b] = out.get(b, 0) + 1
    return out


def test_kcore_matches_reference_peeling(spark):
    """Triangle + pendant tail: the tail (and its cascade) peels away,
    the triangle survives as the 2-core; a square survives; a chain
    vanishes entirely. Checked against reference Python peeling."""
    from map_reduce_engine_cdps_spark.plans.graph import kcore_subgraph

    # triangle (0,1,2) with tail 2-3-4; square 10-11-12-13; chain 20..23
    edge_list = [
        (0, 1), (1, 2), (0, 2), (2, 3), (3, 4),
        (10, 11), (11, 12), (12, 13), (10, 13),
        (20, 21), (21, 22), (22, 23),
    ]
    pairs = spark.createDataFrame(edge_list, "doc_a long, doc_b long")
    survivors, converged = kcore_subgraph(pairs, 2)
    assert converged
    got = {r["doc_id"]: r["core_degree"] for r in survivors.collect()}
    assert got == _py_kcore(edge_list, 2)
    assert set(got) == {0, 1, 2, 10, 11, 12, 13}


def test_kcore_cascade_needs_multiple_rounds(spark):
    """A long pendant path off a clique peels one vertex per round —
    exercises the loop's persist rotation across ≥4 rounds."""
    from map_reduce_engine_cdps_spark.plans.graph import kcore_subgraph

    clique = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    path = [(3, 100), (100, 101), (101, 102), (102, 103)]
    edge_list = clique + path
    pairs = spark.createDataFrame(edge_list, "doc_a long, doc_b long")
    survivors, converged = kcore_subgraph(pairs, 2)
    assert converged
    got = {r["doc_id"]: r["core_degree"] for r in survivors.collect()}
    assert got == _py_kcore(edge_list, 2) == {0: 3, 1: 3, 2: 3, 3: 3}


def test_kcore_registry_converges_on_fixture(spark, sf_dir):
    """The registry query's round cap must be the true fixpoint on the
    fixture corpus (the oracle-equality argument needs no convergence,
    but the k-core CLAIM does)."""
    from map_reduce_engine_cdps_spark.plans.dedup import _lsh_pairs_cached
    from map_reduce_engine_cdps_spark.plans.graph import KCORE_K, kcore_subgraph

    pairs = _lsh_pairs_cached(spark, sf_dir).select("doc_a", "doc_b")
    survivors, converged = kcore_subgraph(pairs, KCORE_K)
    assert converged
    assert all(r["core_degree"] >= KCORE_K for r in survivors.collect())


def test_reservoir_sample_exact_k_and_deterministic(spark, sf_dir):
    from map_reduce_engine_cdps_spark.plans.relational import (
        RESERVOIR_K,
        reservoir_sample_per_source,
    )
    from map_reduce_engine_cdps_spark.sources.readers import load_table

    rows = reservoir_sample_per_source(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    per_source = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    from collections import Counter

    got = Counter(r["source"] for r in rows)
    for src, n in per_source.items():
        assert got[src] == min(RESERVOIR_K, n), src
    # deterministic: a rerun picks the identical sample
    again = {(r["source"], r["doc_id"]) for r in reservoir_sample_per_source(spark, sf_dir).collect()}
    assert again == {(r["source"], r["doc_id"]) for r in rows}


def test_lsh_recall_eval_sound(spark, sf_dir):
    """Recall is a true ratio of the reported integer counts, bounded
    by 1; every truth bucket is inside the claimed similarity range."""
    from map_reduce_engine_cdps_spark.plans.dedup import lsh_pair_recall_eval

    rows = lsh_pair_recall_eval(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_caught"] <= r["n_truth"]
        assert abs(r["recall"] - round(r["n_caught"] / r["n_truth"], 4)) < 1e-12
        assert r["j_bucket"] in {"0.5-0.6", "0.6-0.8", "0.8-1.0"}


def test_golden_records_survivorship_sound(spark, sf_dir):
    """Every entity cluster has ≥2 members, its golden key is a real
    member and the cluster minimum, and clusters partition the matched
    vertex set (sum of sizes = distinct matched customers)."""
    from map_reduce_engine_cdps_spark.plans.dedup import (
        _linkage_matched_pairs,
        customer_golden_records,
    )

    rows = customer_golden_records(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_members"] >= 2
        assert r["golden_key"] <= r["max_member_key"]
        assert r["n_segments"] >= 1
    pairs = _linkage_matched_pairs(spark, sf_dir)
    matched_verts = (
        pairs.select(F.col("doc_a").alias("v"))
        .union(pairs.select("doc_b"))
        .distinct()
        .count()
    )
    assert sum(r["n_members"] for r in rows) == matched_verts


def test_simhash_hamming_pairs_exact_recall(spark, sf_dir):
    """The banked candidate join must find EVERY distinct-hash pair
    within Hamming <= k (pigeonhole over k+1 banks) — compare against
    the brute-force cross join over distinct simhash values."""
    from map_reduce_engine_cdps_spark.plans.dedup import (
        SIMHASH_HAMMING_MAX,
        _simhash_per_doc,
        simhash_hamming_pairs,
    )

    got = simhash_hamming_pairs(spark, sf_dir)
    rows = got.collect()
    assert rows
    for r in rows:
        assert 1 <= r["hamming"] <= SIMHASH_HAMMING_MAX
        assert r["simhash_a"] < r["simhash_b"]
        assert r["n_doc_pairs"] >= 1
    hashes = [
        r["simhash"]
        for r in _simhash_per_doc(spark, sf_dir).select("simhash").distinct().collect()
    ]
    brute = {
        (a, b)
        for i, a in enumerate(hashes)
        for b in hashes[i + 1 :]
        if 1 <= sum(x != y for x, y in zip(a, b)) <= SIMHASH_HAMMING_MAX
    }
    normed = {(min(a, b), max(a, b)) for a, b in brute}
    assert {(r["simhash_a"], r["simhash_b"]) for r in rows} == normed


def test_ngram_novelty_conservation(spark, sf_dir):
    """Novel-trigram credit is conserved: each distinct corpus trigram
    is credited exactly once (to its min-doc_id owner), so per-source
    n_novel sums to the corpus distinct-trigram count."""
    from map_reduce_engine_cdps_spark.functions import text as TX
    from map_reduce_engine_cdps_spark.plans.textops import ngram_novelty_scores
    from map_reduce_engine_cdps_spark.sources.readers import load_table

    rows = ngram_novelty_scores(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_novel"] <= r["n_trigram_slots"]
        assert 0 <= r["novelty_rate"] <= 1
    docs = load_table(spark, sf_dir, "documents")
    total_distinct = (
        docs.select(F.explode(TX.shingles(TX.tokens(F.col("text")))).alias("g"))
        .distinct()
        .count()
    )
    assert sum(r["n_novel"] for r in rows) == total_distinct


def test_adamic_adar_matches_local_recompute(spark, sf_dir):
    """AA scores recomputed locally from the LSH pair list (python
    floats, same sum order irrelevance at round-4) must match the
    distributed wedge join pair-for-pair."""
    import math
    from collections import defaultdict

    from map_reduce_engine_cdps_spark.plans.dedup import _lsh_pairs_cached
    from map_reduce_engine_cdps_spark.plans.graph import adamic_adar_links

    rows = adamic_adar_links(spark, sf_dir).collect()
    assert rows
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in _lsh_pairs_cached(spark, sf_dir).select("doc_a", "doc_b").collect()
    }
    nbrs = defaultdict(set)
    for a, b in pairs:
        nbrs[a].add(b)
        nbrs[b].add(a)
    expect = {}
    for v, ns in nbrs.items():
        for a in ns:
            for b in ns:
                if a < b:
                    key = (a, b)
                    expect.setdefault(key, [0, 0.0])
                    expect[key][0] += 1
                    expect[key][1] += 1.0 / math.log(len(nbrs[v]))
    assert len(rows) == len(expect)
    for r in rows:
        n, s = expect[(r["doc_a"], r["doc_b"])]
        assert r["n_common"] == n
        assert abs(r["aa_score"] - round(s, 4)) < 1e-9
        assert r["is_new"] == ((r["doc_a"], r["doc_b"]) not in pairs)


def test_rolling_zscore_anomalies_sound(spark, sf_dir):
    """Every flagged day exceeds the threshold, and the flag set is a
    strict subset of the eligible (full-enough-window) days."""
    from map_reduce_engine_cdps_spark.plans.analytics import (
        ROLL_ZS_THRESH,
        rolling_zscore_anomalies,
        _daily_revenue,
    )

    rows = rolling_zscore_anomalies(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert abs(r["zscore"]) > ROLL_ZS_THRESH - 1e-4
        assert r["revenue"] != r["trail_mean"]
    n_days = _daily_revenue(spark, sf_dir).count()
    assert len(rows) < n_days


def test_sorted_neighborhood_pairs_sound(spark, sf_dir):
    """SN matches satisfy both predicates, pairs are key-ordered and
    unique, and candidate generation is O(n*w): the pair count can
    never exceed n_customers * SN_WINDOW."""
    from map_reduce_engine_cdps_spark.plans.dedup import (
        LINK_MAX_BAL_DIFF_CENTS,
        LINK_MAX_EDIT,
        SN_WINDOW,
        sorted_neighborhood_pairs,
    )
    from map_reduce_engine_cdps_spark.sources.readers import load_table

    rows = sorted_neighborhood_pairs(spark, sf_dir).collect()
    assert rows
    seen = set()
    for r in rows:
        assert r["key_a"] < r["key_b"]
        assert r["edit_dist"] <= LINK_MAX_EDIT
        assert r["bal_diff_cents"] <= LINK_MAX_BAL_DIFF_CENTS
        seen.add((r["key_a"], r["key_b"]))
    assert len(seen) == len(rows)
    n = load_table(spark, sf_dir, "customer").count()
    assert len(rows) <= n * SN_WINDOW


def test_jl_distortion_preserves_distances(spark, sf_dir):
    """The JL guarantee, empirically: most sampled pairs land near
    distortion 1 and the extremes stay within a loose [0.2, 5] band
    (16 planes is a coarse sketch; catastrophic collapse would show
    as ~0 or ~inf)."""
    from map_reduce_engine_cdps_spark.plans.similarity import (
        jl_distance_distortion,
    )

    r = jl_distance_distortion(spark, sf_dir).collect()[0]
    assert r["n_pairs"] > 0
    assert r["n_within_25pct"] >= r["n_pairs"] * 0.4
    assert 0.1 <= r["min_distortion"] <= r["max_distortion"] <= 5.0


def test_clustering_coefficients_bounds(spark, sf_dir):
    """coeff in [0,1], triangles bounded by deg-choose-2, and every
    triangle corner from the triangle query's count is represented."""
    from map_reduce_engine_cdps_spark.plans.graph import clustering_coefficients

    rows = clustering_coefficients(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["degree"] >= 2
        assert 0 <= r["n_tri"] <= r["degree"] * (r["degree"] - 1) // 2
        assert 0.0 <= r["coeff"] <= 1.0


def test_lpa_deterministic_on_fixture(spark, sf_dir):
    """Synchronous LPA with min tie-break is fully deterministic: two
    independent runs over the same graph produce identical communities,
    and every community is non-empty."""
    from map_reduce_engine_cdps_spark.plans.graph import (
        label_propagation_communities,
    )

    rows1 = sorted(
        (r["community"], r["n_members"], r["min_member"])
        for r in label_propagation_communities(spark, sf_dir).collect()
    )
    rows2 = sorted(
        (r["community"], r["n_members"], r["min_member"])
        for r in label_propagation_communities(spark, sf_dir).collect()
    )
    assert rows1 == rows2
    assert rows1
    assert sum(n for _, n, _ in rows1) >= len(rows1)


def test_holt_winters_matches_local_recompute(spark, sf_dir):
    """Bit-parity of the single-row HOF fold against a plain Python
    recurrence over the same collected daily series."""
    from map_reduce_engine_cdps_spark.plans.analytics import (
        _HW_A,
        _HW_B,
        _HW_G,
        _daily_revenue,
        holt_winters_revenue,
    )

    got = holt_winters_revenue(spark, sf_dir).collect()[0]
    series = [
        r["r"]
        for r in _daily_revenue(spark, sf_dir).orderBy("day").collect()
    ]
    assert got["n_days"] == len(series)
    l = sum(series[:7][j] for j in range(7)) / 7.0
    b = 0.0
    s = [series[j] - l for j in range(7)]
    for i in range(7, len(series)):
        x = series[i]
        idx = i % 7
        lvl = _HW_A * (x - s[idx]) + (1 - _HW_A) * (l + b)
        b = _HW_B * (lvl - l) + (1 - _HW_B) * b
        s[idx] = _HW_G * (x - lvl) + (1 - _HW_G) * s[idx]
        l = lvl
    assert abs(got["level"] - round(l, 4)) < 1e-6
    assert abs(got["trend"] - round(b, 4)) < 1e-6
    assert abs(got["forecast_next"] - round(l + b + s[len(series) % 7], 4)) < 1e-6
    for j in range(7):
        assert abs(got[f"s{j}"] - round(s[j], 4)) < 1e-6


def test_mutual_information_bounds(spark, sf_dir):
    """0 <= MI <= min(H(X), H(Y)); NMI in [0, 1]; entropies positive
    for the multi-valued columns."""
    from map_reduce_engine_cdps_spark.plans.analytics import segment_nation_mi

    r = segment_nation_mi(spark, sf_dir).collect()[0]
    assert r["n_rows"] > 0
    assert r["h_segment"] > 0 and r["h_nation"] > 0
    assert -1e-4 <= r["mi_nats"] <= min(r["h_segment"], r["h_nation"]) + 1e-4
    assert -1e-4 <= r["nmi"] <= 1 + 1e-4


def test_dbscan_roles_consistent(spark, sf_dir):
    """DBSCAN invariants: every vector labeled; noise has cluster -1
    and nothing else does; every cluster id is one of its own core
    members (min-label CC); border points never form clusters alone."""
    from map_reduce_engine_cdps_spark.plans.similarity import dbscan_clusters
    from map_reduce_engine_cdps_spark.sources.readers import load_table

    rows = dbscan_clusters(spark, sf_dir).collect()
    n = load_table(spark, sf_dir, "embeddings").count()
    assert len(rows) == n
    roles = {r["role"] for r in rows}
    assert roles <= {"core", "border", "noise"}
    core_ids = {r["vec_id"] for r in rows if r["role"] == "core"}
    for r in rows:
        if r["role"] == "noise":
            assert r["cluster_id"] == -1
        else:
            assert r["cluster_id"] >= 0
            assert r["cluster_id"] in core_ids


def test_ktruss_edges_invariants(spark, sf_dir):
    """Every 3-truss edge is an original candidate pair and closes at
    least one triangle within the surviving edge set."""
    from map_reduce_engine_cdps_spark.plans.dedup import _lsh_pairs_cached
    from map_reduce_engine_cdps_spark.plans.graph import ktruss_edges

    rows = ktruss_edges(spark, sf_dir).collect()
    assert rows
    orig = {
        (r["doc_a"], r["doc_b"])
        for r in _lsh_pairs_cached(spark, sf_dir).select("doc_a", "doc_b").collect()
    }
    kept = {(r["doc_a"], r["doc_b"]) for r in rows}
    assert kept <= orig
    nbrs = {}
    for a, b in kept:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    for r in rows:
        common = nbrs[r["doc_a"]] & nbrs[r["doc_b"]]
        assert len(common) == r["support"] >= 1


def test_blocking_overlap_consistent(spark, sf_dir):
    """Overlap counts must agree with the two pair queries they join,
    and jaccard = both / (grid + sn - both)."""
    from map_reduce_engine_cdps_spark.plans.dedup import (
        _linkage_matched_pairs,
        blocking_overlap_eval,
        sorted_neighborhood_pairs,
    )

    r = blocking_overlap_eval(spark, sf_dir).collect()[0]
    grid = {
        (x["doc_a"], x["doc_b"])
        for x in _linkage_matched_pairs(spark, sf_dir).collect()
    }
    sn = {
        (x["key_a"], x["key_b"])
        for x in sorted_neighborhood_pairs(spark, sf_dir)
        .select("key_a", "key_b")
        .distinct()
        .collect()
    }
    assert r["n_grid"] == len(grid)
    assert r["n_sn"] == len(sn)
    assert r["n_both"] == len(grid & sn)
    assert abs(r["jaccard"] - round(len(grid & sn) / len(grid | sn), 4)) < 1e-9


def test_bbit_minhash_eval_sound(spark, sf_dir):
    """MAE of the 1-bit estimator is a valid [0,1] error and every
    bucket has pairs; with 8 components the estimate is quantized to
    eighths, so MAE can never exceed 1."""
    from map_reduce_engine_cdps_spark.plans.dedup import bbit_minhash_eval

    rows = bbit_minhash_eval(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_pairs"] > 0
        assert 0.0 <= r["mae"] <= 1.0
        assert r["j_bucket"] in {"0.2-0.6", "0.6-0.8", "0.8-1.0"}


def test_ab_ztest_sound(spark, sf_dir):
    """Arms partition the user set; conversion rates in [0,1]; the
    z statistic recomputes from the reported integer counts."""
    import math

    from map_reduce_engine_cdps_spark.plans.analytics import ab_proportion_ztest
    from map_reduce_engine_cdps_spark.sources.readers import load_table

    r = ab_proportion_ztest(spark, sf_dir).collect()[0]
    ev = load_table(spark, sf_dir, "events")
    n_users = ev.select("user_id").distinct().count()
    assert r["n_a"] + r["n_b"] == n_users
    assert 0 <= r["conv_a"] <= 1 and 0 <= r["conv_b"] <= 1
    ca, cb = round(r["conv_a"] * r["n_a"]), round(r["conv_b"] * r["n_b"])
    pp = (ca + cb) / (r["n_a"] + r["n_b"])
    z = (ca / r["n_a"] - cb / r["n_b"]) / math.sqrt(
        pp * (1 - pp) * (1 / r["n_a"] + 1 / r["n_b"])
    )
    assert abs(r["zstat"] - round(z, 4)) < 1e-3
    assert r["significant_95"] == (abs(z) > 1.96)


def test_cdc_resynchronizes_after_insertion(spark, tmp_path):
    """The CDC property fixed-width chunking lacks: inserting one token
    at the head of a long doc leaves most chunk hashes shared, so the
    two-doc corpus dedups well below 2x distinct chunks."""
    from map_reduce_engine_cdps_spark.plans.curation import cdc_chunk_stats

    base = " ".join(f"tok{i % 37}x{i % 11}" for i in range(400))
    rows = [
        (1, base, "en", "s", len(base)),
        (2, "inserted " + base, "en", "s", len(base) + 9),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    r = cdc_chunk_stats(spark, str(tmp_path)).collect()[0]
    assert r["n_docs"] == 2
    assert r["n_chunks"] > 2
    # resync: far fewer distinct chunks than total (most are shared)
    assert r["n_distinct_chunks"] < 0.75 * r["n_chunks"]
    assert r["dedup_ratio"] > 0.25


def test_psi_and_neyman_sound(spark, sf_dir):
    """PSI >= 0 always (it's a symmetrized KL); Neyman shares form a
    probability vector and allocations approximately exhaust the
    budget."""
    from map_reduce_engine_cdps_spark.plans.analytics import (
        NEYMAN_BUDGET,
        neyman_allocation,
        psi_value_shift,
    )

    p = psi_value_shift(spark, sf_dir).collect()[0]
    assert p["n_first"] > 0 and p["n_second"] > 0
    assert p["psi"] >= 0
    rows = neyman_allocation(spark, sf_dir).collect()
    assert rows
    share = sum(r["alloc_share"] for r in rows)
    assert abs(share - 1.0) < 1e-3
    assert abs(sum(r["alloc_n"] for r in rows) - NEYMAN_BUDGET) <= len(rows)
    for r in rows:
        assert r["s_chars"] > 0 and r["alloc_n"] >= 0


def test_skew_and_emd_sound(spark, sf_dir):
    """Key-skew shares are valid probabilities with top1pct >= max-key;
    EMD over CDFs is within [0, n_bins-1]."""
    from map_reduce_engine_cdps_spark.plans.analytics import key_skew_profile
    from map_reduce_engine_cdps_spark.plans.curation import (
        _LEN_EDGES,
        length_emd_by_source,
    )

    r = key_skew_profile(spark, sf_dir).collect()[0]
    assert 0 < r["n_keys"] <= r["n_rows"]
    assert 0 < r["max_key_share"] <= r["top1pct_share"] <= 1
    rows = length_emd_by_source(spark, sf_dir).collect()
    assert rows
    for e in rows:
        assert 0 <= e["emd_bins"] <= len(_LEN_EDGES)


def test_kcenter_seeds_farthest_property(spark, sf_dir):
    """Greedy k-center invariants: seeds distinct, coverage radius
    non-increasing round over round (each pick is the global farthest,
    so later picks can never be farther than earlier ones)."""
    from map_reduce_engine_cdps_spark.plans.similarity import (
        KCENTER_K,
        kcenter_seeds,
    )

    rows = sorted(
        kcenter_seeds(spark, sf_dir).collect(), key=lambda r: r["sel_round"]
    )
    assert len(rows) == KCENTER_K
    assert len({r["vec_id"] for r in rows}) == KCENTER_K
    assert rows[0]["min_d2"] is None
    d = [r["min_d2"] for r in rows[1:]]
    assert all(x > 0 for x in d)
    assert all(d[i] >= d[i + 1] for i in range(len(d) - 1))


def test_shot_boundaries_on_gradient_frames(spark):
    """Shot detection must work on NON-constant frames too (the oracle
    fixture uses constant frames; this pins the general pixel-diff
    path): two gradient frames differing by +20 per pixel → one
    boundary with mean_diff exactly 20; identical frames → none."""
    from map_reduce_engine_cdps_spark.multimodal.binary import (
        detect_shot_boundaries,
    )

    def ppm(vals):
        return b"P6\n4 4\n255\n" + bytes(vals)

    grad = list(range(48))
    same = ppm(grad) + ppm(grad)
    jump = ppm(grad) + ppm([v + 20 for v in grad])
    df = spark.createDataFrame(
        [(1, bytearray(same)), (2, bytearray(jump))],
        "media_id long, content binary",
    )
    rows = detect_shot_boundaries(df).collect()
    assert {(r["media_id"], r["frame_idx"]) for r in rows} == {(2, 1)}
    assert rows[0]["mean_diff"] == 20.0


def test_incremental_near_dup_covers_batch_slice(spark, sf_dir):
    """Incremental probe finds exactly the full-pair-job matches that
    touch the new batch: filter minhash_lsh_pairs to pairs with >= 1
    new-batch (doc_id%4==0) member and compare pair sets."""
    from map_reduce_engine_cdps_spark.plans.dedup import (
        _lsh_pairs_cached,
        incremental_near_dup,
    )

    got = incremental_near_dup(spark, sf_dir).collect()
    assert got
    inc = set()
    for r in got:
        a, b = r["new_id"], r["match_id"]
        assert a % 4 == 0
        assert r["match_is_existing"] == (b % 4 != 0)
        inc.add((min(a, b), max(a, b)))
    full = {
        (r["doc_a"], r["doc_b"])
        for r in _lsh_pairs_cached(spark, sf_dir).collect()
        if r["doc_a"] % 4 == 0 or r["doc_b"] % 4 == 0
    }
    # full job bucket-caps its bands (BUCKET_CAP); the incremental
    # probe is uncapped, so it may see strictly more
    assert full <= inc


def test_source_vocab_jaccard_bounds(spark, sf_dir):
    from map_reduce_engine_cdps_spark.plans.textops import source_vocab_jaccard

    rows = source_vocab_jaccard(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["src_a"] < r["src_b"]
        assert r["inter"] >= 0
        assert 0 <= r["vocab_jaccard"] <= 1


def test_rrf_fusion_sound(spark, sf_dir):
    """RRF output: the lexical rank-1 seed doc must fuse at the top
    (it is rank 1 in BOTH lists), and scores decompose into the two
    reciprocal terms."""
    from map_reduce_engine_cdps_spark.plans.textops import RRF_K, rrf_fusion_topk

    rows = rrf_fusion_topk(spark, sf_dir).collect()
    assert rows
    top = rows[0]
    assert top["r_lex"] == 1 and top["r_sem"] == 1
    for r in rows:
        expect = (1.0 / (r["r_lex"] + RRF_K) if r["r_lex"] else 0.0) + (
            1.0 / (r["r_sem"] + RRF_K) if r["r_sem"] else 0.0
        )
        assert abs(r["rrf"] - round(expect, 6)) < 1e-12


def test_quantile_norm_and_conformal_sound(spark, sf_dir):
    """Quantile mapping preserves per-source rank order and lands in
    the corpus value range; conformal coverage is near the 90% target
    on the held-out split."""
    from map_reduce_engine_cdps_spark.plans.analytics import (
        conformal_revenue_interval,
    )
    from map_reduce_engine_cdps_spark.plans.curation import (
        quantile_normalized_quality,
    )

    rows = quantile_normalized_quality(spark, sf_dir).collect()
    assert rows
    lo = min(r["n_chars"] for r in rows)
    hi = max(r["n_chars"] for r in rows)
    by_source = {}
    for r in rows:
        assert lo <= r["norm_chars"] <= hi
        by_source.setdefault(r["source"], []).append(
            (r["n_chars"], r["doc_id"], r["norm_chars"])
        )
    for vals in by_source.values():
        vals.sort()
        norms = [n for _, _, n in vals]
        assert norms == sorted(norms)
    c = conformal_revenue_interval(spark, sf_dir).collect()[0]
    assert c["n_cal"] > 0 and c["n_test"] > 0 and c["q_hat"] > 0
    assert 0.75 <= c["coverage"] <= 1.0


def test_silence_segments_gradient_fixture(spark):
    """Silence merging on a hand-built non-constant signal: loud ramp,
    4 silent windows in two separated runs → 2 segments."""
    import struct

    from map_reduce_engine_cdps_spark.multimodal.binary import (
        _SIL_WIN,
        silence_segments,
    )

    def wav(samples):
        n = len(samples)
        hdr = (
            b"RIFF" + struct.pack("<I", 36 + n * 2) + b"WAVEfmt "
            + struct.pack("<IHHIIHH", 16, 1, 1, 16000, 32000, 2, 16)
            + b"data" + struct.pack("<I", n * 2)
        )
        return hdr + b"".join(struct.pack("<h", s) for s in samples)

    sig = []
    # windows: silent, silent, loud(ramp), silent, silent, loud
    for w, kind in enumerate(["s", "s", "l", "s", "s", "l"]):
        if kind == "s":
            sig += [3] * _SIL_WIN
        else:
            sig += list(range(200, 200 + _SIL_WIN))
    df = spark.createDataFrame(
        [(7, bytearray(wav(sig)))], "media_id long, content binary"
    )
    r = silence_segments(df).collect()[0]
    assert (r["n_windows"], r["n_silent"], r["n_segments"]) == (6, 4, 2)


def test_bloom_fpr_sound(spark, sf_dir):
    """No false negatives by construction (passed >= true members) and
    measured FPR within an order of magnitude of theory."""
    from map_reduce_engine_cdps_spark.plans.relational import bloom_fpr_eval

    r = bloom_fpr_eval(spark, sf_dir).collect()[0]
    assert r["n_passed"] >= r["n_true_members"]
    assert r["n_false_pos"] == r["n_passed"] - r["n_true_members"]
    assert 0 <= r["measured_fpr"] <= 1
    assert r["n_bits_set"] <= 3 * r["n_true_members"]


def test_zorder_improves_locality(spark, sf_dir):
    """The point of the measurement: for a custkey-range filter the
    Z-order layout must touch no more chunks than the date-linear
    layout (on realistic data, strictly fewer)."""
    from map_reduce_engine_cdps_spark.plans.relational import zorder_layout_stats

    r = zorder_layout_stats(spark, sf_dir).collect()[0]
    assert r["n_match_rows"] > 0
    assert 1 <= r["chunks_touched_zorder"] <= r["chunks_touched_linear"]
    assert r["zorder_chunk_ratio"] <= 1.0


def test_submodular_gains_decrease(spark, sf_dir):
    """Submodularity: greedy marginal gains are non-increasing, picks
    are distinct, and the first pick is the doc with the most distinct
    trigrams."""
    from map_reduce_engine_cdps_spark.plans.curation import (
        _doc_trigram_hashes,
        submodular_coverage_sample,
    )

    rows = sorted(
        submodular_coverage_sample(spark, sf_dir).collect(),
        key=lambda r: r["sel_round"],
    )
    assert rows
    gains = [r["marginal_gain"] for r in rows]
    assert all(gains[i] >= gains[i + 1] for i in range(len(gains) - 1))
    assert len({r["doc_id"] for r in rows}) == len(rows)
    tri = _doc_trigram_hashes(spark, sf_dir)
    best = (
        tri.groupBy("doc_id")
        .count()
        .orderBy(F.desc("count"), F.asc("doc_id"))
        .limit(1)
        .collect()[0]
    )
    assert rows[0]["doc_id"] == best["doc_id"]
    assert rows[0]["marginal_gain"] == best["count"]


def test_copurchase_decay_markov_sound(spark, sf_dir):
    """Lift pairs respect min supports; decayed values are positive and
    rank-sorted; Markov accuracy beats the 1/5 uniform baseline."""
    from map_reduce_engine_cdps_spark.plans.analytics import (
        MIN_PAIR_SUPPORT,
        MIN_PART_SUPPORT,
        copurchase_part_pairs,
        decayed_user_value,
        markov_next_event_accuracy,
    )

    pairs = copurchase_part_pairs(spark, sf_dir).collect()
    assert pairs
    for p in pairs:
        assert p["pair_sup"] >= MIN_PAIR_SUPPORT
        assert p["pa"] < p["pb"]
        assert p["lift"] > 0
    vals = sorted(decayed_user_value(spark, sf_dir).collect(),
                  key=lambda r: r["rn"])
    assert vals
    dv = [r["decayed_value"] for r in vals]
    assert all(dv[i] >= dv[i + 1] for i in range(len(dv) - 1))
    assert all(v > 0 for v in dv)
    m = markov_next_event_accuracy(spark, sf_dir).collect()[0]
    assert m["n_test"] > 0
    assert 0 <= m["accuracy"] <= 1
    assert m["accuracy"] >= 0.1


def test_linkage_block_cap_binds(spark, tmp_path, monkeypatch):
    """Exercise the LINK_BLOCK_CAP path ACTIVE (inert at every
    certified SF): 40 same-nation/segment/balance customers with
    identical names form one block; cap=8 limits pairs to C(8,2)=28
    among the 8 smallest keys vs C(40,2)=780 uncapped."""
    import map_reduce_engine_cdps_spark.plans.dedup as D

    rows = [(i, "Customer#X", 0, "SEG", 100.0) for i in range(40)]
    spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey int,"
        " c_mktsegment string, c_acctbal double",
    ).write.parquet(str(tmp_path / "customer.parquet"))
    monkeypatch.setattr(D, "LINK_BLOCK_CAP", 8)
    out = D._linkage_matched_pairs(spark, str(tmp_path)).collect()
    pairs = {(r["doc_a"], r["doc_b"]) for r in out}
    assert len(pairs) == 28
    assert {k for p in pairs for k in p} == set(range(8))


def test_wand_prune_sound(spark, sf_dir):
    """WAND safety: skippable docs can never include a top-k doc (UB >=
    exact score, so doc_ub < s_k implies score < s_k), so n_skippable
    <= n_candidates - k."""
    from map_reduce_engine_cdps_spark.plans.textops import (
        _WAND_K,
        wand_pruned_retrieval,
    )

    r = wand_pruned_retrieval(spark, sf_dir).collect()[0]
    assert r["n_candidates"] > 0
    assert 0 <= r["n_skippable"] <= max(r["n_candidates"] - _WAND_K, 0)
    assert 0 <= r["prune_rate"] <= 1
    assert r["topk_mass"] > 0


def test_twap_and_sax_sound(spark, sf_dir):
    """TWAP top-20 is rank-sorted and within the raw value range; SAX
    covers every day in 16 segments with symbols from the 4-letter
    alphabet matching the z-mean bands."""
    from map_reduce_engine_cdps_spark.plans.analytics import (
        _SAX_BREAKS,
        _SAX_SEGMENTS,
        _daily_revenue,
        sax_revenue_symbols,
        twap_user_value,
    )

    rows = sorted(twap_user_value(spark, sf_dir).collect(), key=lambda r: r["rn"])
    assert rows
    tw = [r["twap"] for r in rows]
    assert all(tw[i] >= tw[i + 1] for i in range(len(tw) - 1))
    sax = sorted(sax_revenue_symbols(spark, sf_dir).collect(),
                 key=lambda r: r["segment"])
    assert len(sax) == _SAX_SEGMENTS
    n_days = _daily_revenue(spark, sf_dir).count()
    assert sum(r["n_days"] for r in sax) == n_days
    b1, b2, b3 = _SAX_BREAKS
    for r in sax:
        z, s = r["z_mean"], r["symbol"]
        expect = "a" if z < b1 else "b" if z < b2 else "c" if z < b3 else "d"
        # z is rounded for display; only assert away from boundaries
        if min(abs(z - b) for b in (b1, b2, b3)) > 1e-3:
            assert s == expect


def test_cusum_and_aqp_sound(spark, sf_dir):
    """CUSUM invariants: monitored days = series minus burn-in, max
    excursion nonnegative; AQP: estimates positive and count errors
    within the plausible band for a 1/8 cluster sample."""
    from map_reduce_engine_cdps_spark.plans.analytics import (
        _CUSUM_BURN,
        _daily_revenue,
        cusum_control_chart,
    )
    from map_reduce_engine_cdps_spark.plans.relational import aqp_sample_accuracy

    c = cusum_control_chart(spark, sf_dir).collect()[0]
    n_days = _daily_revenue(spark, sf_dir).count()
    assert c["n_monitored"] == n_days - _CUSUM_BURN
    assert c["n_alarms"] >= 0
    assert c["max_excursion_sigma"] >= 0
    rows = aqp_sample_accuracy(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_exact"] > 0 and r["n_est"] >= 0
        assert 0 <= r["count_rel_err"] < 1
        assert 0 <= r["sum_rel_err"] < 1


def test_topshare_assortativity_burstiness_sound(spark, sf_dir):
    """Top-share curve is monotone in pct; assortativity in [-1, 1];
    burstiness VMRs positive for the top-cf terms."""
    from map_reduce_engine_cdps_spark.plans.analytics import (
        revenue_topshare_curve,
    )
    from map_reduce_engine_cdps_spark.plans.graph import degree_assortativity
    from map_reduce_engine_cdps_spark.plans.textops import term_burstiness

    rows = sorted(
        revenue_topshare_curve(spark, sf_dir).collect(),
        key=lambda r: r["top_pct"],
    )
    shares = [r["revenue_share"] for r in rows]
    assert all(0 < s <= 1 for s in shares)
    assert all(shares[i] <= shares[i + 1] for i in range(len(shares) - 1))
    assert all(r["revenue_share"] >= r["top_pct"] / 100.0 - 0.01 for r in rows)
    a = degree_assortativity(spark, sf_dir).collect()[0]
    assert a["n_edges"] > 0
    assert -1.0001 <= a["assortativity"] <= 1.0001
    tb = term_burstiness(spark, sf_dir).collect()
    assert len(tb) == 20
    assert all(r["vmr"] > 0 for r in tb)


def test_band_tuning_scurve_monotone(spark, sf_dir):
    """More bands (fewer rows each) must never lose candidates or
    recall: both are monotone nondecreasing from 1x8 to 8x1, and
    theory capture follows the same order."""
    from map_reduce_engine_cdps_spark.plans.dedup import lsh_band_tuning_eval

    rows = sorted(
        lsh_band_tuning_eval(spark, sf_dir).collect(),
        key=lambda r: r["bands"],
    )
    assert [(r["bands"], r["rows_per_band"]) for r in rows] == [
        (1, 8), (2, 4), (4, 2), (8, 1)
    ]
    cands = [r["n_candidates"] for r in rows]
    recalls = [r["recall"] for r in rows]
    theory = [r["capture_at_j07"] for r in rows]
    assert all(cands[i] <= cands[i + 1] for i in range(3))
    assert all(recalls[i] <= recalls[i + 1] for i in range(3))
    assert all(theory[i] < theory[i + 1] for i in range(3))
    assert all(r["n_caught"] <= r["n_truth"] for r in rows)


def test_dup_length_bias_sound(spark, sf_dir):
    """Point-biserial r in [-1, 1] and the flag partition accounts for
    every doc."""
    from map_reduce_engine_cdps_spark.plans.dedup import dup_length_bias
    from map_reduce_engine_cdps_spark.sources.readers import load_table

    r = dup_length_bias(spark, sf_dir).collect()[0]
    n = load_table(spark, sf_dir, "documents").count()
    assert r["n_docs"] == n
    assert 0 < r["n_dup_members"] < n
    assert -1.0001 <= r["point_biserial_r"] <= 1.0001
    assert r["mean_len_dup"] > 0 and r["mean_len_rest"] > 0


def test_shingle_sensitivity_monotone(spark, sf_dir):
    """Wider shingles are strictly stricter on word n-grams: the >=0.5
    pair count is non-increasing in n, and medians stay in [0.5, 1]."""
    from map_reduce_engine_cdps_spark.plans.dedup import shingle_size_sensitivity

    rows = sorted(
        shingle_size_sensitivity(spark, sf_dir).collect(),
        key=lambda r: r["shingle_n"],
    )
    assert [r["shingle_n"] for r in rows] == [3, 4, 5]
    counts = [r["n_pairs"] for r in rows]
    assert all(counts[i] >= counts[i + 1] for i in range(2))
    for r in rows:
        if r["n_pairs"]:
            assert 0.5 <= r["median_j"] <= 1.0


def test_query_expansion_pmi_sound(spark, sf_dir):
    """Three query terms, up to three ranked expansions each, no
    self-expansion, co-occurrence counts positive."""
    from map_reduce_engine_cdps_spark.plans.textops import query_expansion_pmi

    rows = query_expansion_pmi(spark, sf_dir).collect()
    assert rows
    terms = {r["query_term"] for r in rows}
    assert len(terms) == 3
    for r in rows:
        assert r["expansion"] != r["query_term"]
        assert r["n_co_docs"] > 0
        assert 1 <= r["rn"] <= 3


def test_quality_score_auc_vs_bruteforce(spark, sf_dir):
    """Midrank AUC equals the O(n1·n0) pairwise definition computed
    driver-side, and the stopword score really is an English signal."""
    from map_reduce_engine_cdps_spark.plans.textops import quality_score_auc
    from map_reduce_engine_cdps_spark.sources.readers import load_table

    row = quality_score_auc(spark, sf_dir).collect()[0]
    docs = load_table(spark, sf_dir, "documents").select("text", "lang").collect()
    stop = {"the", "a", "an", "of", "and", "to", "in", "is", "it", "that"}

    def score(text):
        toks = [t for t in text.lower().strip().split() if t]
        return round(sum(t in stop for t in toks) / len(toks), 4) if toks else 0.0

    pos = [score(d["text"]) for d in docs if d["lang"] == "en"]
    neg = [score(d["text"]) for d in docs if d["lang"] != "en"]
    assert row["n_en"] == len(pos) and row["n_other"] == len(neg)
    wins = sum(
        1.0 if p > q else (0.5 if p == q else 0.0) for p in pos for q in neg
    )
    assert abs(row["auc"] - wins / (len(pos) * len(neg))) < 1e-6
    # the synthetic corpus seeds stopwords across all langs, so the
    # signal is weak here — the identity above is the real check
    assert 0.0 <= row["auc"] <= 1.0


def test_chi2_terms_are_english_markers(spark, sf_dir):
    from map_reduce_engine_cdps_spark.plans.textops import (
        _CHI2_MIN_DF,
        _CHI2_TOP,
        chi2_term_selection,
    )

    rows = chi2_term_selection(spark, sf_dir).collect()
    assert [r["rnk"] for r in rows] == list(range(1, _CHI2_TOP + 1))
    assert all(r["df"] >= _CHI2_MIN_DF for r in rows)
    assert all(r["chi2"] >= 0.0 for r in rows)
    chis = [r["chi2"] for r in rows]
    assert chis == sorted(chis, reverse=True)
    # the strongest lang='en' discriminators must include EN stopwords
    top_terms = {r["term"] for r in rows}
    assert top_terms & {"the", "of", "and", "to", "a"}


def test_mcnemar_counts_consistent(spark, sf_dir):
    from map_reduce_engine_cdps_spark.plans.textops import mcnemar_lang_models
    from map_reduce_engine_cdps_spark.sources.readers import load_table

    row = mcnemar_lang_models(spark, sf_dir).collect()[0]
    n = load_table(spark, sf_dir, "documents").count()
    assert row["n_docs"] == n
    assert 0 <= row["b_disc"] + row["c_disc"] <= n
    assert 0.0 <= row["acc_a"] <= 1.0 and 0.0 <= row["acc_b"] <= 1.0
    # accuracy difference and discordant counts must agree in sign:
    # acc_a - acc_b == (b_disc - c_disc) / n
    assert abs((row["acc_a"] - row["acc_b"]) - (row["b_disc"] - row["c_disc"]) / n) < 2e-4
    if row["b_disc"] + row["c_disc"] > 0:
        expect = (abs(row["b_disc"] - row["c_disc"]) - 1) ** 2 / (
            row["b_disc"] + row["c_disc"]
        )
        assert abs(row["mcnemar_chi2"] - round(expect, 4)) < 1e-9


def test_knn_hubness_vs_bruteforce(spark, sf_dir):
    """In-degree stats must match a numpy recomputation of the exact
    kNN graph from the same probe set."""
    import numpy as np

    from map_reduce_engine_cdps_spark.plans.similarity import (
        HUB_K,
        HUB_QUERIES,
        knn_hubness_stats,
    )
    from map_reduce_engine_cdps_spark.sources.readers import load_table

    row = knn_hubness_stats(spark, sf_dir).collect()[0]
    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    n = len(emb)
    assert row["n_corpus"] == n
    indeg = {}
    for q in range(HUB_QUERIES):
        qv = emb[q]
        qn = np.sqrt((qv * qv).sum())
        sims = []
        for cid, cv in emb.items():
            if cid == q:
                continue
            cs = round(float(qv @ cv / (qn * np.sqrt((cv * cv).sum()))), 6)
            sims.append((-cs, cid))
        for _, cid in sorted(sims)[:HUB_K]:
            indeg[cid] = indeg.get(cid, 0) + 1
    assert row["max_indeg"] == max(indeg.values())
    assert row["antihub_cnt"] == n - len(indeg)
    assert row["hub_cnt"] == sum(
        1 for v in indeg.values() if v * n > 2 * HUB_QUERIES * HUB_K
    )
    degs = np.zeros(n)
    for cid, v in indeg.items():
        degs[cid] = v
    m2 = degs.var()
    skew = ((degs - degs.mean()) ** 3).mean() / (m2 * np.sqrt(m2))
    assert abs(row["indeg_skewness"] - skew) < 1e-3


def test_l_diversity_consistent_with_kanon(spark):
    """At sf0.01 released classes exist; the audit counts must be
    internally consistent and bounded by the tier cardinality."""
    sf = "/root/testdata/sf0.01"
    from map_reduce_engine_cdps_spark.plans.curation import (
        KANON_K,
        kanon_release_stats,
        l_diversity_audit,
    )

    rows = {r["c_mktsegment"]: r for r in l_diversity_audit(spark, sf).collect()}
    kan = {r["c_mktsegment"]: r for r in kanon_release_stats(spark, sf).collect()}
    assert rows.keys() == kan.keys()
    for seg, r in rows.items():
        assert r["released_classes"] == kan[seg]["groups_released"]
        assert 0 <= r["fails_l2"] <= r["fails_l3"] <= r["released_classes"]
        if r["released_classes"]:
            assert 1 <= r["min_l"] <= 4  # four balance tiers
            assert r["min_l"] <= r["avg_l"] <= 4.0


# --- round-8 additions: semantic invariants beyond the oracle match ---


def test_near_dup_prune_accounting(spark, sf_dir):
    """Kept + pruned partitions every doc, and exactly one doc is kept
    per near-dup cluster (the keep-best policy's defining invariant)."""
    from map_reduce_engine_cdps_spark.plans.dedup import (
        near_dup_clusters,
        near_dup_prune,
    )

    out = near_dup_prune(spark, sf_dir).collect()
    n_docs = sum(r["n_docs"] for r in out)
    n_kept = sum(r["n_kept"] for r in out)
    n_pruned = sum(r["n_pruned"] for r in out)
    assert n_kept + n_pruned == n_docs
    n_clusters = (
        near_dup_clusters(spark, sf_dir).select("cluster_id").distinct().count()
    )
    assert n_kept == n_clusters


def test_duplicate_spans_sampled_is_a_real_subsample(spark, sf_dir):
    """The 1/16 hash-mod sample: sampled window count is a plausible
    binomial draw of the full window count (loose 3x band — the bound
    certifies the filter actually prunes and actually keeps)."""
    from map_reduce_engine_cdps_spark.functions import text as TX
    from map_reduce_engine_cdps_spark.plans.dedup import (
        SPAN_W,
        duplicate_spans_sampled,
    )
    from map_reduce_engine_cdps_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    total = docs.select(
        F.explode(TX.window_hashes(TX.tokens(F.col("text")), SPAN_W))
    ).count()
    sampled = sum(
        r["n_sampled_windows"]
        for r in duplicate_spans_sampled(spark, sf_dir).collect()
    )
    assert 0 < sampled < total
    assert total / 48 <= sampled <= total * 3 / 16


def test_boilerplate_span_topk_spans_hash_back(spark, sf_dir):
    """Pass-2 text recovery is consistent: every returned span md5s to
    its whash, rows are shared (n_docs >= 2) and correctly ordered."""
    import hashlib

    from map_reduce_engine_cdps_spark.plans.dedup import (
        TOP_SPANS_K,
        boilerplate_span_topk,
    )

    rows = boilerplate_span_topk(spark, sf_dir).collect()
    assert 0 < len(rows) <= TOP_SPANS_K
    for r in rows:
        assert hashlib.md5(r["span"].encode()).hexdigest() == r["whash"]
        assert r["n_docs"] >= 2
        assert r["n_occurrences"] >= r["n_docs"]
    keys = [(-r["n_docs"], -r["n_occurrences"], r["whash"]) for r in rows]
    assert keys == sorted(keys)


def test_temporal_split_partitions_and_bounds(spark, sf_dir):
    """Split sizes partition the event count; user overlap is bounded
    by both side's user counts and both splits are non-empty (the
    cutoff sits strictly inside the time range by construction)."""
    from map_reduce_engine_cdps_spark.plans.curation import temporal_split_stats
    from map_reduce_engine_cdps_spark.sources.readers import load_table

    (r,) = temporal_split_stats(spark, sf_dir).collect()
    total = load_table(spark, sf_dir, "events").count()
    assert r["n_train"] + r["n_test"] == total
    assert r["n_train"] > 0 and r["n_test"] > 0
    assert r["n_overlap_users"] <= min(r["n_train_users"], r["n_test_users"])
    assert 0.0 <= r["test_user_leak_ratio"] <= 1.0


def test_cc_label_memo_semantics(spark, sf_dir):
    """Pins the write-through rule (SCALE.md round 8): near_dup_clusters
    must recompute (and refresh the memo) on every call — a read-through
    memo here would collapse its bench timings to cache reads — while
    near_dup_prune reads the memo; and distinct max_rounds keys must
    not cross-contaminate."""
    from map_reduce_engine_cdps_spark.plans import dedup as D

    key = (spark.sparkContext.applicationId, sf_dir, 25)
    D._CC_LABELS_CACHE.pop(key, None)
    D.near_dup_clusters(spark, sf_dir).count()
    first = D._CC_LABELS_CACHE.get(key)
    assert first is not None  # write-through populated the memo
    D.near_dup_clusters(spark, sf_dir).count()
    second = D._CC_LABELS_CACHE.get(key)
    assert second is not first  # recomputed + refreshed, not served from
    # consumers read the refreshed entry
    assert D._cc_labels_cached(spark, sf_dir) is second
    # a different max_rounds is a different cache line
    other = D._cc_labels_cached(spark, sf_dir, max_rounds=24)
    assert other is not second
    assert D._CC_LABELS_CACHE.get((key[0], key[1], 24)) is other


def test_span_sample_error_within_binomial_noise(spark, sf_dir):
    """The 1/16 hash-mod estimator's per-source error stays within a
    5-sigma binomial band of the exact ratio (sigma = sqrt(p(1-p)/n)
    at the sampled window count) — the measured-unbiasedness claim the
    eval twin exists to certify. At sf0.1: mean abs error 0.008 vs
    sigma ~0.011 at ~700 sampled windows/source."""
    import math

    from map_reduce_engine_cdps_spark.plans.dedup import span_sample_error_eval

    rows = span_sample_error_eval(spark, sf_dir).collect()
    assert rows
    for r in rows:
        p = r["exact_dup_ratio"]
        sigma = math.sqrt(max(p * (1 - p), 1e-6) / max(r["n_sampled"], 1))
        assert r["abs_error"] <= 5 * sigma + 1e-4, (r, sigma)


def test_t_closeness_audit_invariants(spark, sf_dir):
    """EMD is in [0, 1]; every reported class satisfies the k-anonymity
    release rule; the breach flag is exactly (t_emd > T)."""
    from map_reduce_engine_cdps_spark.plans.curation import (
        KANON_K,
        T_CLOSENESS_T,
        t_closeness_audit,
    )

    from map_reduce_engine_cdps_spark.sources.readers import load_table

    rows = t_closeness_audit(spark, sf_dir).collect()
    n_releasable = (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_mktsegment", "c_nationkey")
        .count()
        .filter(F.col("count") >= KANON_K)
        .count()
    )
    assert len(rows) == n_releasable
    for r in rows:
        assert r["n_members"] >= KANON_K
        assert 0.0 <= r["t_emd"] <= 1.0
        assert r["breaches_t"] == (r["t_emd"] > T_CLOSENESS_T)


def test_bfs_hops_histogram_invariants(spark, sf_dir):
    """Seeds all sit at hop 0; hop values stay within the cap (or -1);
    the histogram covers the whole pair-graph vertex set."""
    from map_reduce_engine_cdps_spark.plans.dedup import _lsh_pairs_cached
    from map_reduce_engine_cdps_spark.plans.graph import (
        BFS_MAX_HOPS,
        BFS_SEEDS,
        bfs_hops,
    )

    rows = {r["hops"]: r["n_docs"] for r in bfs_hops(spark, sf_dir).collect()}
    pairs = _lsh_pairs_cached(spark, sf_dir)
    n_verts = (
        pairs.select(F.col("doc_a").alias("v"))
        .union(pairs.select(F.col("doc_b")))
        .distinct()
        .count()
    )
    assert sum(rows.values()) == n_verts
    assert rows.get(0) == min(BFS_SEEDS, n_verts)
    assert all(h == -1 or 0 <= h <= BFS_MAX_HOPS for h in rows)


def test_retrieval_ndcg_eval_bounds(spark, sf_dir):
    """nDCG is in (0, 1]; DCG never exceeds IDCG; the candidate
    universe is every doc hitting at least one query term."""
    from map_reduce_engine_cdps_spark.plans.textops import retrieval_ndcg_eval

    r = retrieval_ndcg_eval(spark, sf_dir).collect()[0]
    assert r["n_candidates"] > 0
    assert 0 < r["dcg_micros"] <= r["idcg_micros"]
    assert 0.0 < r["ndcg_at_10"] <= 1.0


def test_bfs_layers_hand_graph(spark):
    """Path 0-1-2-3-4, cycle 10-11-12-10, isolated 20, and a vertex 30
    one hop past the cap: exact min distances from seeds {0, 10}; the
    over-cap vertex gets NO row; cycle distances take the short way."""
    from map_reduce_engine_cdps_spark.plans.graph import bfs_layers

    undirected = [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (12, 10)]
    # chain 4-5-6-7 hangs off the path so vertex 7 is 7 hops from 0
    undirected += [(4, 5), (5, 6), (6, 7)]
    edges = spark.createDataFrame(
        undirected + [(b, a) for a, b in undirected], "src long, dst long"
    )
    seeds = spark.createDataFrame([(0,), (10,)], "v long")
    got = {
        r["v"]: r["d"] for r in bfs_layers(edges, seeds, max_hops=3).collect()
    }
    assert got == {
        0: 0, 1: 1, 2: 2, 3: 3,          # path truncated at the cap
        10: 0, 11: 1, 12: 1,             # cycle: both directions, min wins
    }
    # 4 (distance 4) and everything past it: provably no label at cap 3
    assert 4 not in got and 7 not in got and 20 not in got
    # at a cap covering the whole graph, all reachable distances exact
    got8 = {
        r["v"]: r["d"] for r in bfs_layers(edges, seeds, max_hops=8).collect()
    }
    assert got8[7] == 7 and got8[4] == 4 and 20 not in got8


def test_bfs_layers_matches_python_bfs_on_random_graphs(spark):
    """Property: on random small graphs, bfs_layers agrees exactly with
    a pure-Python multi-source BFS — every vertex within the cap gets
    its true min distance, every deeper vertex gets no row."""
    from collections import deque

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from map_reduce_engine_cdps_spark.plans.graph import bfs_layers

    @settings(max_examples=8, deadline=None,
              suppress_health_check=list(HealthCheck))
    @given(
        st.lists(
            st.tuples(st.integers(0, 14), st.integers(0, 14)),
            min_size=1, max_size=25,
        ),
        st.integers(1, 4),
    )
    def check(edge_list, max_hops):
        undirected = [(a, b) for a, b in edge_list if a != b]
        if not undirected:
            return
        sym = undirected + [(b, a) for a, b in undirected]
        verts = sorted({v for e in sym for v in e})
        seed_ids = verts[:2]
        # reference: multi-source BFS in plain Python
        adj: dict = {}
        for a, b in sym:
            adj.setdefault(a, set()).add(b)
        dist = {s: 0 for s in seed_ids}
        q = deque(seed_ids)
        while q:
            u = q.popleft()
            for w in adj.get(u, ()):  # noqa: B023
                if w not in dist:
                    dist[w] = dist[u] + 1
                    q.append(w)
        expect = {v: d for v, d in dist.items() if d <= max_hops}
        edges = spark.createDataFrame(sym, "src long, dst long")
        seeds = spark.createDataFrame([(s,) for s in seed_ids], "v long")
        got = {
            r["v"]: r["d"]
            for r in bfs_layers(edges, seeds, max_hops=max_hops).collect()
        }
        assert got == expect, (sorted(sym), seed_ids, max_hops)

    check()


def test_group_holdout_split_invariants(spark, sf_dir):
    """Splits partition the event stream exactly (no row lost or
    double-counted), user counts partition the user set (the leakage
    guarantee: a user appears in exactly one split), and shares sum
    to ~1."""
    from map_reduce_engine_cdps_spark.plans.curation import group_holdout_split
    from map_reduce_engine_cdps_spark.sources.readers import load_table

    rows = {r["split"]: r for r in group_holdout_split(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events")
    assert sum(r["n_events"] for r in rows.values()) == ev.count()
    assert sum(r["n_users"] for r in rows.values()) == (
        ev.select("user_id").distinct().count()
    )
    assert abs(sum(r["event_share"] for r in rows.values()) - 1.0) < 1e-5
    assert set(rows) <= {"train", "val", "test"}
    # the split is a pure function of user_id — re-running must give
    # byte-identical assignments (no RNG, no run-order dependence).
    # (12/16 of the hash space is train, but with ~15 users at sf0.001
    # the realized split can deviate arbitrarily — no dominance check.)
    rows2 = {r["split"]: r for r in group_holdout_split(spark, sf_dir).collect()}
    assert rows == rows2


def test_hard_negative_mining_invariants(spark, sf_dir):
    """Every mined negative has a different label than its anchor,
    at most _HN_K per anchor, ranks are 1..k dense, and similarities
    are non-increasing within an anchor (the 'hard' ordering)."""
    import collections

    from map_reduce_engine_cdps_spark.plans.similarity import (
        _HN_K,
        hard_negative_mining,
    )

    rows = hard_negative_mining(spark, sf_dir).collect()
    assert rows
    per_anchor = collections.defaultdict(list)
    for r in rows:
        assert r["anchor_label"] != r["neg_label"]
        assert -1.0 <= r["cos_sim"] <= 1.0
        per_anchor[r["anchor_id"]].append(r)
    for rs in per_anchor.values():
        assert len(rs) <= _HN_K
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        sims = [r["cos_sim"] for r in rs]
        assert sims == sorted(sims, reverse=True)


def test_bucket_hard_negative_kernel_superset_property():
    """The kernel's raw-cosine cutoff (kth_raw - margin) must return a
    superset of the top-k by the ROUNDED cosine for every bucket — the
    correctness contract hard_negative_mining's JVM rank relies on.
    Checked against a brute-force python miner on random buckets,
    including adversarial near-tie values via tiny vector perturbations."""
    import numpy as np
    import pandas as pd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from map_reduce_engine_cdps_spark.functions.vectors import (
        bucket_hard_negative_kernel,
    )

    K = 2

    @settings(max_examples=60, deadline=None)
    @given(st.data())
    def check(data):
        rng = np.random.default_rng(data.draw(st.integers(0, 2**32 - 1)))
        n = data.draw(st.integers(2, 24))
        dim = data.draw(st.sampled_from([4, 8]))
        n_labels = data.draw(st.integers(1, 4))
        base = rng.normal(size=(n, dim))
        # adversarial near-ties: clone some rows with ~1e-9 jitter so
        # raw cosines collide within the rounding window
        for i in range(0, n - 1, 3):
            base[i + 1] = base[i] + rng.normal(scale=1e-9, size=dim)
        pdf = pd.DataFrame(
            {
                "vec_id": np.arange(n, dtype="int64"),
                "label": rng.integers(0, n_labels, n).astype("int32"),
                "embedding": [row for row in base],
            }
        )
        out = bucket_hard_negative_kernel(K)(pdf)
        returned = set(zip(out["anchor_id"], out["neg_id"]))
        # brute-force rounded top-k per anchor (the query's semantics)
        labels = pdf["label"].to_numpy()
        nrm = np.sqrt(np.cumsum(base * base, axis=1)[:, -1])
        for a in range(n):
            cands = []
            for c in range(n):
                if labels[c] == labels[a]:
                    continue
                dot = np.cumsum(base[a] * base[c])[-1]
                cands.append((round(dot / (nrm[a] * nrm[c]), 6), c))
            cands.sort(key=lambda t: (-t[0], t[1]))
            for _, c in cands[:K]:
                assert (a, c) in returned, (a, c, cands[:4])

    check()


def test_lsh_precision_eval_sound(spark, sf_dir):
    """Fractions are true ratios summing to 1; bucket counts cover the
    whole raw candidate front; the production banding's precision@0.5
    (share of candidates at/above the dedup threshold) is well-defined."""
    from map_reduce_engine_cdps_spark.plans.dedup import (
        _lsh_scored_pairs_cached,
        lsh_pair_precision_eval,
    )

    rows = lsh_pair_precision_eval(spark, sf_dir).collect()
    assert rows
    buckets = {
        "0.0-0.5", "0.5-0.8", "0.8-0.9", "0.9-0.95", "0.95-0.99", "0.99-1.0"
    }
    total = sum(r["n_cand"] for r in rows)
    n_front = _lsh_scored_pairs_cached(spark, sf_dir).count()
    assert total == n_front  # no candidate dropped (union>0 holds here)
    assert abs(sum(r["frac_cands"] for r in rows) - 1.0) < 1e-3
    for r in rows:
        assert r["j_bucket"] in buckets
        assert abs(r["frac_cands"] - round(r["n_cand"] / total, 4)) < 1e-12


def test_cross_dup_source_matrix_sound(spark, sf_dir):
    """Pair counts conserve the verified pair memo; source pairs are
    canonically ordered; mean jaccard stays within the memo's [0.2, 1]
    verification band."""
    from map_reduce_engine_cdps_spark.plans.dedup import (
        _lsh_pairs_cached,
        cross_dup_source_matrix,
    )

    rows = cross_dup_source_matrix(spark, sf_dir).collect()
    assert rows
    assert sum(r["n_pairs"] for r in rows) == _lsh_pairs_cached(
        spark, sf_dir
    ).count()
    for r in rows:
        assert r["src_lo"] <= r["src_hi"]
        assert 0.2 <= r["mean_jaccard"] <= 1.0


def test_scored_pair_memo_shared(spark, sf_dir):
    """minhash_lsh_pairs and the precision eval resolve to the SAME
    checkpointed scored front (one signature pass per app+sf)."""
    from map_reduce_engine_cdps_spark.plans.dedup import (
        _SCORED_PAIRS_CACHE,
        _lsh_scored_pairs_cached,
        minhash_lsh_pairs,
    )

    minhash_lsh_pairs(spark, sf_dir).count()
    key = (spark.sparkContext.applicationId, sf_dir)
    assert key in _SCORED_PAIRS_CACHE
    assert _lsh_scored_pairs_cached(spark, sf_dir) is _SCORED_PAIRS_CACHE[key]


def test_ivf_nprobe_sweep_sound(spark, sf_dir):
    """The tuning curve is internally consistent (ratios recompute from
    the integer columns), monotone in nprobe (more probed lists can
    only add candidates and hits), and its nprobe=NPROBE point agrees
    with the shipped ivf_ann_topk path scored against the brute-force
    truth."""
    from map_reduce_engine_cdps_spark.plans.similarity import (
        _NPROBE_SWEEP,
        N_QUERIES,
        NPROBE,
        TOP_K,
        ivf_ann_topk,
        ivf_nprobe_sweep_eval,
        knn_bruteforce,
    )

    rows = ivf_nprobe_sweep_eval(spark, sf_dir).collect()
    assert [r["nprobe"] for r in rows] == sorted(_NPROBE_SWEEP)
    for r in rows:
        assert 0 <= r["n_hits"] <= N_QUERIES * TOP_K
        assert abs(
            r["recall_at_k"] - round(r["n_hits"] / (N_QUERIES * TOP_K), 4)
        ) < 1e-12
        assert abs(
            r["mean_candidates"] - round(r["total_candidates"] / N_QUERIES, 4)
        ) < 1e-12
    for a, b in zip(rows, rows[1:]):
        assert b["total_candidates"] >= a["total_candidates"]
        assert b["n_hits"] >= a["n_hits"]
    # consistency with the production path at its shipped nprobe
    assert NPROBE in _NPROBE_SWEEP
    truth = knn_bruteforce(spark, sf_dir).select("query_id", "cand_id")
    prod_hits = (
        ivf_ann_topk(spark, sf_dir)
        .filter(f"rank <= {TOP_K}")
        .select("query_id", "cand_id")
        .join(truth, ["query_id", "cand_id"])
        .count()
    )
    by_nprobe = {r["nprobe"]: r for r in rows}
    assert by_nprobe[NPROBE]["n_hits"] == prod_hits


def test_minmax_file_skipping_sound(spark, sf_dir):
    """Zone-map pruning is sound (no matching row lives in a skipped
    file), the predicate answer is layout-invariant, the fraction
    recomputes from the integer columns, and the time-sorted layout
    scans no more than the hash-scattered one."""
    from map_reduce_engine_cdps_spark.plans.relational import (
        minmax_file_skipping_eval,
    )
    from map_reduce_engine_cdps_spark.sources.readers import load_table

    rows = {r["layout"]: r for r in
            minmax_file_skipping_eval(spark, sf_dir).collect()}
    assert set(rows) == {"key_clustered", "scattered", "time_sorted"}
    n_total = load_table(spark, sf_dir, "lineitem").count()
    match_counts = {r["match_rows"] for r in rows.values()}
    assert len(match_counts) == 1  # layout never changes the answer
    for r in rows.values():
        assert 0 < r["files_kept"] <= r["files_total"]
        assert r["match_rows"] <= r["rows_in_kept_files"] <= n_total
        assert abs(
            r["scan_fraction"] - round(r["rows_in_kept_files"] / n_total, 4)
        ) < 1e-12
    assert (
        rows["time_sorted"]["rows_in_kept_files"]
        <= rows["scattered"]["rows_in_kept_files"]
    )


def test_skew_remediation_eval_sound(spark, sf_dir):
    """The salting curve is internally consistent (straggler_factor
    recomputes from the integer columns), conserves rows across
    strategies, materializes exactly the expected sub-key counts at
    the unsalted baseline, and actually remediates on this data —
    the max salt level must beat the unsalted straggler factor."""
    from map_reduce_engine_cdps_spark.plans.analytics import (
        _SKEW_N_RED,
        _SKEW_SALTS,
        skew_remediation_eval,
    )
    from map_reduce_engine_cdps_spark.sources.readers import load_table

    rows = {r["n_salt"]: r for r in
            skew_remediation_eval(spark, sf_dir).collect()}
    assert set(rows) == set(_SKEW_SALTS)
    ev = load_table(spark, sf_dir, "events")
    n_events = ev.count()
    n_types = ev.select("event_type").distinct().count()
    for n_salt, r in rows.items():
        assert r["total_rows"] == n_events  # every strategy sees all rows
        assert 1 <= r["reducers_used"] <= min(r["subkeys"], _SKEW_N_RED)
        assert r["subkeys"] <= n_types * n_salt
        # max reducer must hold at least a perfectly-balanced share
        # of its own reducer count
        assert r["max_reducer_rows"] * r["reducers_used"] >= n_events
        assert abs(
            r["straggler_factor"]
            - round(r["max_reducer_rows"] * _SKEW_N_RED / n_events, 4)
        ) < 1e-12
    assert rows[1]["subkeys"] == n_types  # unsalted baseline
    # sub-keys can only multiply as the salt fans out
    for a, b in zip(sorted(_SKEW_SALTS), sorted(_SKEW_SALTS)[1:]):
        assert rows[b]["subkeys"] >= rows[a]["subkeys"]
    hi, lo = max(_SKEW_SALTS), min(_SKEW_SALTS)
    assert rows[hi]["straggler_factor"] < rows[lo]["straggler_factor"]


def test_compaction_plan_eval_sound(spark, sf_dir):
    """The compaction plan conserves bytes (sum over months equals
    rows x row-bytes), never plans more output files than inputs or
    than the byte total allows, and counts small files consistently."""
    from map_reduce_engine_cdps_spark.plans.relational import (
        _COMPACT_N_WRITERS,
        _COMPACT_ROW_BYTES,
        _COMPACT_TARGET_BYTES,
        compaction_plan_eval,
    )
    from map_reduce_engine_cdps_spark.sources.readers import load_table

    rows = compaction_plan_eval(spark, sf_dir).collect()
    o = load_table(spark, sf_dir, "orders")
    n_orders = o.count()
    n_months = o.selectExpr(
        "year(o_orderdate) * 12 + month(o_orderdate) AS m"
    ).distinct().count()
    assert len(rows) == n_months
    assert sum(r["bytes_total"] for r in rows) == n_orders * _COMPACT_ROW_BYTES
    months = [r["month"] for r in rows]
    assert months == sorted(months)
    for r in rows:
        assert 1 <= r["files_after"] <= r["files_before"] <= _COMPACT_N_WRITERS
        assert 0 <= r["small_files_before"] <= r["files_before"]
        # greedy cumulative cut: bin indices span floor(bytes/target)+1
        # at most, so the plan can never emit more bins than that
        assert (
            r["files_after"]
            <= r["bytes_total"] // _COMPACT_TARGET_BYTES + 1
        )
        assert r["max_bin_bytes"] <= r["bytes_total"]
        assert r["files_after"] * r["max_bin_bytes"] >= r["bytes_total"]
