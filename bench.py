"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line with per-query wall times.

Methodology (BASELINE.md, revised round 5 per VERDICT r4): one warm-up
pass over the whole suite, then >=5 INTERLEAVED timed passes — pass 1
times every query once, then pass 2, ... — with the per-query median
and IQR across passes reported. Interleaving is the point: ambient
host-load spikes last seconds-to-minutes, so consecutive per-query
runs let one spike own all of a query's samples, while interleaved
passes spread it across different queries where the median discards
it. Timing includes full execution to a count of the result (never
caching between runs). AQE on.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from map_reduce_engine_cdps_spark.plans.registry import _REGISTRY
from map_reduce_engine_cdps_spark.session import get_spark

# Headline set: one per operator family — agg, flagship CASE+agg+topk,
# join chain, windows (tumbling + sliding), sessionization, as-of +
# range temporal joins, salted-skew join, text explode, TF-IDF,
# minhash-LSH dedup, brute-force/LSH/IVF ANN, grouped-map training,
# compat shim. (Streaming queries are excluded: fixed-cost microbatch
# machinery, measured by their own tests.)
# FROZEN at 27 queries as of round 1 — keep this list stable so
# BENCH_r{N}.json totals stay comparable across rounds; new operator
# families get their own timings via tools/, not by growing this set.
HEADLINE = [
    "pricing_summary",
    "danger_topk",
    "revenue_by_nation",
    "shipping_priority",
    "priority_order_counts",
    "top_return_customers",
    "running_order_totals",
    "user_sessions",
    "tumbling_window_counts",
    "sliding_window_counts",
    "click_asof_purchase",
    "click_purchase_within_1h",
    "salted_above_type_mean",
    "wordcount",
    "text_quality",
    "tfidf_top_terms",
    "quality_filter_flags",
    "decontamination",
    "dedup_exact",
    "minhash_lsh_pairs",
    "near_dup_clusters",
    "simhash_buckets",
    "knn_bruteforce",
    "lsh_ann_topk",
    "ivf_ann_topk",
    "one_vs_one_training",
    "wordcount_shim",
]


def _run_once(spark, fn, sf_dir: str) -> float:
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    n = df.count()
    assert n >= 0
    return time.perf_counter() - t0


def prewarm(spark, sf_dir: str) -> None:
    """One representative heavy pass BEFORE anything is timed
    (VERDICT r11 item 1): the round-11/12 host class backs guest
    frames lazily on first touch (SCALE.md), so the first heavy
    allocations of a session — JVM heap growth, shuffle buffers,
    Python workers — run 1.5-5x slow. The sweep protocol's
    "representative-query warm-up" turned the driver-window memo line
    from 24.96 s into 4.07 s; this applies the same recipe to the
    bench session so driver-window numbers price compute, not
    first-touch. Excluded from every reported line.

    simhash_buckets exercises the JVM/shuffle path (tokenize, two
    aggregates, broadcast); ivf_ann_topk starts the Arrow Python
    workers and the vector kernels. Neither touches the LSH memos, so
    the memo_builds lines still time their own first build.
    """
    for name in ("simhash_buckets", "ivf_ann_topk"):
        fn, _ = _REGISTRY[name]
        try:
            _run_once(spark, fn, sf_dir)
        except Exception as e:  # noqa: BLE001
            print(f"prewarm error {name}: {e}", file=sys.stderr)


def measure_memo_builds(spark, sf_dir: str) -> dict[str, float]:
    """Time the once-per-session memo builds the HEADLINE set depends
    on, BEFORE the warm-up pass (VERDICT r10 item 1: the round-10
    memoization of the raw LSH scored front moved the signature/banding
    pass out of minhash_lsh_pairs' measured passes and into the
    excluded warm-up, so ~1.4 s of the r10 headline gain was
    attribution, not compute — these lines make the cost visible
    in-artifact so round-over-round totals stay honest).

    The two builds nest: the pair memo is a cheap filter+checkpoint
    over the scored front, so its line measures only that increment
    when run second. CC labels are write-through (measured fresh inside
    near_dup_clusters every pass) and need no line here.
    """
    from map_reduce_engine_cdps_spark.plans.dedup import (
        _lsh_pairs_cached,
        _lsh_scored_pairs_cached,
    )

    # Cheap pre-warm so the memo line prices the build, not the
    # session's first-touch overhead (JVM scan init, file listing) —
    # the same overhead the warm-up pass used to absorb when the
    # signature pass lived inside minhash_lsh_pairs.
    from map_reduce_engine_cdps_spark.sources.readers import load_table

    load_table(spark, sf_dir, "documents").count()

    builds: dict[str, float] = {}
    for label, fn in (
        ("lsh_scored_pairs_memo_build", _lsh_scored_pairs_cached),
        ("lsh_pairs_memo_build", _lsh_pairs_cached),
    ):
        try:
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            builds[label] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # noqa: BLE001
            print(f"memo build error {label}: {e}", file=sys.stderr)
            builds[label] = -1.0
    return builds


def run_suite(
    spark, sf_dir: str, runs: int = 5
) -> tuple[dict[str, float], dict[str, float]]:
    """Warm-up pass, then ``runs`` interleaved passes over the whole
    HEADLINE list. Returns (per-query median, per-query IQR)."""
    samples: dict[str, list[float]] = {}
    failed: set[str] = set()
    for name in HEADLINE:  # warm-up (plan compilation, file listing, JIT)
        fn, _ = _REGISTRY[name]
        try:
            _run_once(spark, fn, sf_dir)
            samples[name] = []
        except Exception as e:  # noqa: BLE001
            print(f"bench error {name}: {type(e).__name__}: {e}", file=sys.stderr)
            failed.add(name)
    for _ in range(runs):
        for name in HEADLINE:
            if name in failed:
                continue
            fn, _ = _REGISTRY[name]
            try:
                samples[name].append(_run_once(spark, fn, sf_dir))
            except Exception as e:  # noqa: BLE001
                print(f"bench error {name}: {type(e).__name__}: {e}", file=sys.stderr)
                failed.add(name)
    medians: dict[str, float] = {}
    iqrs: dict[str, float] = {}
    for name in HEADLINE:
        vals = samples.get(name, [])
        if name in failed or not vals:
            medians[name] = -1.0
            continue
        medians[name] = round(statistics.median(vals), 3)
        q = statistics.quantiles(vals, n=4, method="inclusive")
        iqrs[name] = round(q[2] - q[0], 3)
    return medians, iqrs


# Queries whose cost lives in COMPUTED columns the count() action
# prunes (VERDICT r12 items 3/7: quality_filter_flags' modal-token HOF
# was invisible to the count-timed line — an 8.4x fix never moved the
# bench). Timed separately with the noop sink (guide §1.4: computes
# every column, discards the result), AFTER the frozen count-timed
# suite so the 27 headline lines stay comparable across rounds.
# Additions-only: new artifact key, never part of `value`.
NOOP_COMPUTE = ["quality_filter_flags", "text_quality"]


def measure_noop_compute(spark, sf_dir: str, runs: int = 3) -> dict[str, float]:
    out: dict[str, float] = {}
    for name in NOOP_COMPUTE:
        fn, _ = _REGISTRY[name]
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            ts = []
            for _ in range(runs):
                df = fn(spark, sf_dir)
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                ts.append(time.perf_counter() - t0)
            out[name] = round(statistics.median(ts), 3)
        except Exception as e:  # noqa: BLE001
            print(f"noop-compute error {name}: {e}", file=sys.stderr)
            out[name] = -1.0
    return out


# Derived 10x replication of sf0.1 (tools/scale_data.py) for the
# scaling-slope point in BASELINE.md's measurement plan. Only timed
# when present and not disabled, so the driver's sf0.1 run stays fast.
SF1_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".benchdata", "sf1")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))
    spark = get_spark(app_name="bench")
    prewarm(spark, sf_dir)
    memo_builds = measure_memo_builds(spark, sf_dir)
    timings, iqrs = run_suite(spark, sf_dir, runs=runs)
    noop_compute = measure_noop_compute(spark, sf_dir)
    total = round(sum(t for t in timings.values() if t > 0), 3)
    out = {
        "metric": "headline_query_wall_time_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_iqr": iqrs,
        "runs": runs,
        "methodology": (
            "median+IQR over interleaved passes, warm-up pass excluded; "
            "r12+: representative heavy pre-warm before all timed lines "
            "(excluded), see OPTIMIZATION_r12.md; r13+: separate "
            "noop-sink medians for compute-pruned queries under "
            "noop_compute (additions-only, excluded from value)"
        ),
        # Noop-sink lines for queries whose computed columns count()
        # prunes (VERDICT r12 item 7); excluded from `value`.
        "noop_compute": noop_compute,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # Once-per-session memo builds, timed before warm-up and
        # EXCLUDED from `value` (the 27-query set is frozen; r1-r9
        # totals amortized the signature pass inside
        # minhash_lsh_pairs' measured passes, r10+ totals do not —
        # compare across rounds with these lines in view).
        "memo_builds": memo_builds,
        "memo_note": (
            "memo builds excluded from value; r10 moved the LSH "
            "signature/banding pass out of minhash_lsh_pairs into the "
            "session memo (~1.4s at sf0.1)"
        ),
        # Provenance (VERDICT r8 item 8): builder runs export
        # SPARK_GRAFT_BENCH_CONTEXT=builder-quiet; the round driver sets
        # nothing, so an unlabeled artifact is a driver-window run.
        "context": os.environ.get("SPARK_GRAFT_BENCH_CONTEXT", "driver-window"),
    }
    try:
        import subprocess as _sp0

        out["tree_commit"] = _sp0.run(
            ["git", "-C", os.path.dirname(os.path.abspath(__file__)),
             "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, check=True,
        ).stdout.strip()
    except Exception:  # pragma: no cover
        out["tree_commit"] = "unknown"
    if os.path.isdir(SF1_DIR) and not os.environ.get("SPARK_GRAFT_SKIP_SF1"):
        prewarm(spark, SF1_DIR)
        out["sf1_memo_builds"] = measure_memo_builds(spark, SF1_DIR)
        sf1, sf1_iqr = run_suite(spark, SF1_DIR, runs=runs)
        out["sf1_queries"] = sf1
        out["sf1_queries_iqr"] = sf1_iqr
        out["sf1_value"] = round(sum(t for t in sf1.values() if t > 0), 3)
        out["sf1_noop_compute"] = measure_noop_compute(spark, SF1_DIR)
    # The driver's BENCH_r{N}.json keeps only the last 2000 stdout
    # chars (the visible first dict is queries_iqr, not the medians —
    # VERDICT r6 item 7), so also persist the complete JSON alongside
    # the round artifacts. Round number = explicit $SPARK_GRAFT_ROUND
    # if set, else next after the newest GIT-TRACKED BENCH_r*.json —
    # the driver drops its BENCH_r{N}.json into the working tree
    # before committing, so globbing the tree mislabels a re-run
    # within the same round (ADVICE r7). Failures here must never
    # sink the bench.
    full_name = None
    try:
        import re as _re
        import subprocess as _sp

        here = os.path.dirname(os.path.abspath(__file__))
        if os.environ.get("SPARK_GRAFT_ROUND"):
            tag = f"r{int(os.environ['SPARK_GRAFT_ROUND']):02d}"
        else:
            tracked = _sp.run(
                ["git", "-C", here, "ls-files", "BENCH_r*.json"],
                capture_output=True,
                text=True,
                check=True,
            ).stdout.split()
            rounds = [
                int(m.group(1))
                for f in tracked
                if (m := _re.search(r"BENCH_r(\d+)\.json$", f))
            ]
            tag = f"r{max(rounds, default=0) + 1:02d}"
        full_name = f"BENCH_full_{tag}.json"
        with open(os.path.join(here, full_name), "w") as fh:
            json.dump(out, fh, indent=1)
    except Exception as e:  # pragma: no cover
        print(f"bench full-artifact write skipped: {e}", file=sys.stderr)
    # The driver keeps only the last 2000 stdout chars and json-parses
    # the tail; the full dict (IQRs + sf1 detail) is ~3.3k chars, so
    # printing it whole truncated the line and left BENCH_r{8,9}.json
    # with "parsed": null (VERDICT r9 item 3). Print a compact line
    # (<1k chars) as the LAST stdout line — medians + totals only,
    # with a pointer to the complete committed artifact.
    compact = {
        k: v
        for k, v in out.items()
        if k not in (
            "queries_iqr", "sf1_queries", "sf1_queries_iqr",
            "sf1_memo_builds", "sf1_noop_compute", "memo_note",
        )
    }
    if full_name:
        compact["full"] = full_name
    print(json.dumps(compact, separators=(",", ":")))


if __name__ == "__main__":
    main()
