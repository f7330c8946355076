"""Full-registry scale-slope sweep: time EVERY registered query once at
two scale factors and report the wall-time ratio, to catch super-linear
cliffs hiding outside the 27-query headline set (the round-3 verdict's
ask #9, generalized — bench.py and round_bench.py only cover curated
subsets).

Methodology: one cold run per query per SF in a single Spark session
(cold = includes planning; queries share JVM/codegen warm-up order, so
sub-second timings are noisy — the signal is queries ≥1 s at the large
SF whose ratio exceeds ~4x for 10x data). Prints one JSON line:
{"queries": {name: {"small": s, "large": s, "ratio": r}},
 "flagged": [...]}  with `flagged` = large ≥ 1 s AND ratio > 4.

Run: python tools/slope_sweep.py [small_sf_dir] [large_sf_dir]
Defaults: /root/testdata/sf0.1 and /root/repo/.benchdata/sf1
(generate the latter with tools/scale_data.py).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from map_reduce_engine_cdps_spark.plans.registry import _REGISTRY
from map_reduce_engine_cdps_spark.session import get_spark


def main() -> None:
    small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    large = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.benchdata/sf1"
    spark = get_spark(app_name="slope_sweep")
    out: dict[str, dict] = {}
    # Warm the shared LSH pair memo FIRST and report it as its own
    # timed line (VERDICT r4 item 3): the memo is built once per
    # (app, sf_dir) and consumed by 5+ dedup-family queries, so left
    # implicit it gets charged to whichever consumer the sweep reaches
    # first — a 7.85x "cliff" in SWEEP_r04.json that was really cache
    # attribution. With the memo warmed, every consumer line below
    # times its own work only, and the artifact is self-explaining.
    from map_reduce_engine_cdps_spark.plans.dedup import (
        _lsh_pairs_cached,
        _lsh_scored_pairs_cached,
    )
    from map_reduce_engine_cdps_spark.sources.readers import load_table

    # Session pre-warm BEFORE the first timed memo line: SWEEP_r10's
    # lsh_pairs_memo_build read INVERTED (sf0.1 13.4 s > sf1 4.5 s)
    # because the small-SF build was the session's very first Spark
    # work and carried the cold first touch (JVM scan init, codegen,
    # Arrow spin-up) — the same mechanism the ktruss sf10 A/B isolated
    # (VERDICT r10 item 2). A cheap scan per SF absorbs that overhead
    # so the memo lines price the builds.
    for sf_dir in (small, large):
        try:
            load_table(spark, sf_dir, "documents").count()
        except Exception as e:  # noqa: BLE001
            print(f"sweep prewarm error @{sf_dir}: {e}", file=sys.stderr)

    # The r10 memoization split the pair memo in two (raw scored front
    # + filtered pair list); time each build as its own line, like
    # bench.py's memo_builds — the pair line then prices only its
    # filter+checkpoint increment.
    for label, builder in (
        ("lsh_scored_pairs_memo_build", _lsh_scored_pairs_cached),
        ("lsh_pairs_memo_build", _lsh_pairs_cached),
    ):
        memo: dict = {}
        for key, sf_dir in (("small", small), ("large", large)):
            t0 = time.perf_counter()
            try:
                builder(spark, sf_dir)
                memo[key] = round(time.perf_counter() - t0, 3)
            except Exception as e:  # noqa: BLE001
                print(f"sweep error {label}@{key}: {type(e).__name__}: {e}",
                      file=sys.stderr)
                memo[key] = -1.0
        if memo.get("small", 0) > 0 and memo.get("large", 0) > 0:
            memo["ratio"] = round(memo["large"] / memo["small"], 2)
        out[label] = memo
        print(f"{label}: {memo}", file=sys.stderr)
    # Same attribution treatment for the round-6 shared truth front
    # (consumed by lsh_pair_recall_eval AND lsh_band_tuning_eval).
    from map_reduce_engine_cdps_spark.plans.dedup import _recall_truth_pairs

    tmemo: dict = {}
    for key, sf_dir in (("small", small), ("large", large)):
        t0 = time.perf_counter()
        try:
            _recall_truth_pairs(spark, sf_dir)
            tmemo[key] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # noqa: BLE001
            print(f"sweep error recall_truth_memo@{key}: {type(e).__name__}: {e}",
                  file=sys.stderr)
            tmemo[key] = -1.0
    if tmemo.get("small", 0) > 0 and tmemo.get("large", 0) > 0:
        tmemo["ratio"] = round(tmemo["large"] / tmemo["small"], 2)
    out["recall_truth_memo_build"] = tmemo
    print(f"recall_truth_memo_build: {tmemo}", file=sys.stderr)
    # ...and the linkage matched-pair memo (first consumer was
    # customer_golden_records, which absorbed the build in its line).
    from map_reduce_engine_cdps_spark.plans.dedup import _linkage_pairs_cached

    lmemo: dict = {}
    for key, sf_dir in (("small", small), ("large", large)):
        t0 = time.perf_counter()
        try:
            _linkage_pairs_cached(spark, sf_dir)
            lmemo[key] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # noqa: BLE001
            print(f"sweep error linkage_pairs_memo@{key}: {type(e).__name__}: {e}",
                  file=sys.stderr)
            lmemo[key] = -1.0
    if lmemo.get("small", 0) > 0 and lmemo.get("large", 0) > 0:
        lmemo["ratio"] = round(lmemo["large"] / lmemo["small"], 2)
    out["linkage_pairs_memo_build"] = lmemo
    print(f"linkage_pairs_memo_build: {lmemo}", file=sys.stderr)
    for name, (fn, _) in _REGISTRY.items():
        rec: dict = {}
        for key, sf_dir in (("small", small), ("large", large)):
            t0 = time.perf_counter()
            try:
                fn(spark, sf_dir).count()
                rec[key] = round(time.perf_counter() - t0, 3)
            except Exception as e:  # noqa: BLE001
                print(f"sweep error {name}@{key}: {type(e).__name__}: {e}",
                      file=sys.stderr)
                rec[key] = -1.0
        if rec.get("small", 0) > 0 and rec.get("large", 0) > 0:
            rec["ratio"] = round(rec["large"] / rec["small"], 2)
        out[name] = rec
        print(f"{name}: {rec}", file=sys.stderr)
    # Warm-median hygiene (VERDICT r8 item 3): a first-touch cold run
    # can read 5-7x the query's true wall (incremental_near_dup's
    # 19.8 s line in SWEEP_r08 was 2.8-3.8 s warm) and a committed
    # artifact then carries a misleading main-line number. Re-run
    # every expensive large-SF line once more inside the SAME session
    # (everything is warm by now — the whole registry has executed):
    # the MAIN `large` becomes the warm re-run, the cold first touch
    # moves to `large_cold`, and the ratio is recomputed from the warm
    # number. Cheap lines (<3 s) keep their single reading — re-running
    # 300+ queries would double the sweep for sub-noise deltas.
    for name, (fn, _) in _REGISTRY.items():
        rec = out[name]
        if rec.get("large", 0) >= 3.0:
            t0 = time.perf_counter()
            try:
                fn(spark, large).count()
                warm = round(time.perf_counter() - t0, 3)
            except Exception as e:  # noqa: BLE001
                print(f"sweep rewarm error {name}: {type(e).__name__}: {e}",
                      file=sys.stderr)
                continue
            rec["large_cold"] = rec["large"]
            rec["large"] = warm
            if rec.get("small", 0) > 0:
                rec["ratio"] = round(warm / rec["small"], 2)
            print(f"rewarm {name}: cold={rec['large_cold']} warm={warm}",
                  file=sys.stderr)
    flagged = sorted(
        (n for n, r in out.items()
         if r.get("large", 0) >= 1.0 and r.get("ratio", 0) > 4.0),
        key=lambda n: -out[n]["ratio"],
    )
    try:
        import subprocess as _sp

        commit = _sp.run(
            ["git", "-C", os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
             "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, check=True,
        ).stdout.strip()
    except Exception:  # pragma: no cover
        commit = "unknown"
    print(json.dumps({
        "queries": out,
        "flagged": flagged,
        "annotations": {n: ANNOTATIONS[n] for n in flagged if n in ANNOTATIONS},
        "small": small,
        "large": large,
        "context": os.environ.get("SPARK_GRAFT_BENCH_CONTEXT", "builder-quiet"),
        "tree_commit": commit,
        "main_line_policy": "large>=3s lines re-run warm in-session; "
                            "cold first touch preserved in large_cold",
    }))


# In-artifact explanations for known >4x-but-sublinear ratios, so the
# sweep JSON never carries a red number that needs a commit message to
# decode (VERDICT r4 item 3). A 10x-data ratio between 4x and 10x is
# at-most-linear work; it trips the flag only because the sf0.1 point
# is fixed-overhead-dominated for these queries.
ANNOTATIONS = {
    "linkage_pairs_memo_build": (
        "once-per-session blocked-join + gated-levenshtein front shared "
        "by the linkage family; ~6x for 10x data = sublinear, and the "
        "cost amortizes across all consumers"
    ),
    "recall_truth_memo_build": (
        "once-per-session exact-Jaccard truth front on the fixed-budget "
        "sample, shared by the eval family; ~4x for 10x data = sublinear"
    ),
    "sorted_neighborhood_pairs": (
        "window-pass over the sorted key; <10x for 10x data = "
        "at-most-linear — the sf0.1 point is sort fixed-overhead-dominated"
    ),
    "blocking_overlap_eval": (
        "blocked candidate fronts at two block widths; ~4x for 10x data "
        "= sublinear"
    ),
    "group_holdout_split": (
        "one projection + 3-group aggregate; ~4x for 10x data on a "
        "sub-2-second line = at-most-linear, sf0.1 point is "
        "fixed-overhead-dominated"
    ),
    "ppm_image_features": (
        "decode work scales with document count; 4-5x for 10x data is "
        "sublinear — the sf0.1 point is JVM/Arrow fixed-overhead-dominated"
    ),
    "ppm_gradient_features": (
        "same decode-bound profile as ppm_image_features; <10x for 10x "
        "data = at-most-linear"
    ),
    "embedding_near_dup": (
        "EMB_BUCKET_CAP bucket-rank adds ~1.7 s fixed overhead at sf1 "
        "(SCALE.md round 5) in exchange for bounded pair output at any "
        "scale; 4x for 10x data is sublinear"
    ),
    "click_asof_cogroup": (
        "output rows grow 10x with the data (SCALE_PROBE_sf10.json); "
        "wall tracks output sublinearly"
    ),
}


if __name__ == "__main__":
    main()
