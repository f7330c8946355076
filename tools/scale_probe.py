"""Two-point scale-slope probe at sf1 -> sf10 for the queries the
round-4 sweep flagged as steepest (ivf_ann_topk 3.1x, cube_counts
3.2x, click_asof_cogroup 3.0x for 10x data) plus the rest of the ANN
family, to settle whether those slopes bend super-linear at the next
decade (VERDICT r4 item 5).

Methodology matches bench.py's noise-proofing: per-query runs are
interleaved round-robin (so ambient host-load spikes hit all queries,
not whichever one was running), median + IQR reported per query per
SF. The shared LSH pair memo (plans/dedup.py:_lsh_pairs_cached) is
warmed first and reported as its own line so near_dup_clusters times
only its own work (SWEEP_r04's cache-attribution lesson).

Run:  python tools/scale_probe.py [runs] [out_json]
Defaults: 3 runs, /root/repo/SCALE_PROBE_sf10.json. Expects
.benchdata/sf1 and .benchdata/sf10 (tools/scale_data.py K=10 / K=100).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from map_reduce_engine_cdps_spark.plans.registry import _REGISTRY
from map_reduce_engine_cdps_spark.session import get_spark

QUERIES = [
    "ivf_ann_topk",
    "lsh_ann_topk",
    "knn_bruteforce",
    "embedding_near_dup",
    "near_dup_clusters",
    "cube_counts",
    "click_asof_cogroup",
    # dedup family two-point coverage (pair-memo consumers time their
    # own work — the memo build is its own line above)
    "minhash_lsh_pairs",
    "simhash_buckets",
    "semdedup_prune",
    # round-6 additions with the steepest sweep ratios, plus the
    # reworked eval trio (truth memo is its own line below)
    "frequent_event_subsequences",
    "knn_hubness_stats",
    "max_concurrent_sessions",
    "lsh_pair_recall_eval",
    "lsh_band_tuning_eval",
    "shingle_size_sensitivity",
    # round-7-certified families with >=2.5x sf0.1->sf1 sweep ratios
    # (SWEEP_r07.json; VERDICT r6 item 6) — linkage memo consumers
    # time their own work, the memo build is its own line below
    "blocking_overlap_eval",
    "incremental_near_dup",
    "sorted_neighborhood_pairs",
    "customer_golden_records",
    "adamic_adar_links",
    "label_propagation_communities",
    "ktruss_edges",
    "dbscan_clusters",
    # round-8 continuation additions (graph distance, IR eval, privacy)
    "bfs_hops",
    "retrieval_ndcg_eval",
    "t_closeness_audit",
    # round-8 span-dedup family (VERDICT r8 item 7) + round-9 additions
    "duplicate_spans_sampled",
    "boilerplate_span_topk",
    "near_dup_prune",
    "group_holdout_split",
    "hard_negative_mining",
    # round-10 ratchet (VERDICT r9 item 7): the two round-9 perf
    # reworks that had only been measured at sf1
    "waiting_suppliers",
    "lsh_band_tuning_eval",
    # round-12 ratchet (VERDICT r11 item 7): the r11 additions, so
    # every 100 TB-decision eval carries its own decade-scaling
    # receipt; plus the r12 additions for the same reason. Run via the
    # existing subset+merge mode when an sf10-capable quiet host is
    # available (round-12 host unsuitable — SCALE.md decay receipts).
    "ivf_nprobe_sweep_eval",
    "minmax_file_skipping_eval",
    "skew_remediation_eval",
    "compaction_plan_eval",
]

SFS = {
    "sf1": "/root/repo/.benchdata/sf1",
    "sf10": "/root/repo/.benchdata/sf10",
}


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/SCALE_PROBE_sf10.json"
    # Optional query subset: probe only these names and MERGE their
    # entries into the existing artifact (ratchet additions shouldn't
    # force a full multi-hour re-probe).
    subset = sys.argv[3:]
    queries = subset or QUERIES
    unknown = [q for q in queries if q not in _REGISTRY]
    assert not unknown, unknown
    spark = get_spark(app_name="scale_probe")

    from map_reduce_engine_cdps_spark.plans.dedup import _lsh_pairs_cached

    out: dict[str, dict] = {}
    memo: dict[str, float] = {}
    for sf, sf_dir in SFS.items():
        t0 = time.perf_counter()
        _lsh_pairs_cached(spark, sf_dir)
        memo[sf] = round(time.perf_counter() - t0, 3)
        print(f"memo warm {sf}: {memo[sf]}s", flush=True)
    out["lsh_pairs_memo_build"] = {
        **memo, "ratio": round(memo["sf10"] / memo["sf1"], 2)
    }

    from map_reduce_engine_cdps_spark.plans.dedup import _recall_truth_pairs

    tmemo: dict[str, float] = {}
    for sf, sf_dir in SFS.items():
        t0 = time.perf_counter()
        _recall_truth_pairs(spark, sf_dir)
        tmemo[sf] = round(time.perf_counter() - t0, 3)
        print(f"truth memo warm {sf}: {tmemo[sf]}s", flush=True)
    out["recall_truth_memo_build"] = {
        **tmemo, "ratio": round(tmemo["sf10"] / tmemo["sf1"], 2)
    }

    from map_reduce_engine_cdps_spark.plans.dedup import _linkage_pairs_cached

    lmemo: dict[str, float] = {}
    for sf, sf_dir in SFS.items():
        t0 = time.perf_counter()
        _linkage_pairs_cached(spark, sf_dir)
        lmemo[sf] = round(time.perf_counter() - t0, 3)
        print(f"linkage memo warm {sf}: {lmemo[sf]}s", flush=True)
    out["linkage_pairs_memo_build"] = {
        **lmemo, "ratio": round(lmemo["sf10"] / lmemo["sf1"], 2)
    }

    samples: dict[tuple[str, str], list[float]] = {
        (q, sf): [] for q in queries for sf in SFS
    }
    rows: dict[tuple[str, str], int] = {}
    for r in range(runs):
        for q in queries:
            fn = _REGISTRY[q][0]
            for sf, sf_dir in SFS.items():
                t0 = time.perf_counter()
                try:
                    n_rows = fn(spark, sf_dir).count()
                except Exception as e:  # noqa: BLE001
                    print(f"run {r + 1}/{runs} {q}@{sf}: ERROR "
                          f"{type(e).__name__}: {e}", flush=True)
                    continue
                dt = round(time.perf_counter() - t0, 3)
                samples[(q, sf)].append(dt)
                rows.setdefault((q, sf), n_rows)
                print(f"run {r + 1}/{runs} {q}@{sf}: {dt}s "
                      f"({n_rows} rows)", flush=True)

    for q in queries:
        rec: dict = {}
        for sf in SFS:
            vals = sorted(samples[(q, sf)])
            if not vals:
                rec[sf] = {"median": -1.0, "spread": 0.0, "runs": []}
                continue
            med = statistics.median(vals)
            iqr = (vals[-1] - vals[0]) if len(vals) < 4 else (
                statistics.quantiles(vals, n=4)[2]
                - statistics.quantiles(vals, n=4)[0]
            )
            rec[sf] = {"median": round(med, 3), "spread": round(iqr, 3),
                       "runs": vals, "out_rows": rows.get((q, sf))}
        if rec["sf1"]["median"] > 0 and rec["sf10"]["median"] > 0:
            rec["ratio"] = round(rec["sf10"]["median"] / rec["sf1"]["median"], 2)
            # time per output row: a near-dup query's output is
            # Theta(sum of dup-group sizes^2), and the derived sf10
            # multiplies group sizes 10x — so wall-ratio alone overstates
            # the slope when the OUTPUT grew faster than the input.
            ra, rb = rows.get((q, "sf1")), rows.get((q, "sf10"))
            if ra and rb:
                rec["out_rows_ratio"] = round(rb / ra, 2)
        else:
            rec["ratio"] = -1.0
        out[q] = rec
        print(f"{q}: {rec}", flush=True)

    payload = {
        "probe": "sf1->sf10 (10x data)", "runs_per_point": runs,
        "interleaved": True,
        # The shared local-mode JVM needs a cluster-executor-sized heap
        # for the sf10 shuffles: at 16g the adamic_adar_links@sf10 line
        # heap-OOMs and poisons every later line in the session (seen
        # round 9). Record what this run used so a -1.0 artifact line
        # is attributable.
        "driver_mem": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        "queries": out,
        "superlinear": sorted(
            (q for q in queries
             if out[q]["ratio"] > 10.0
             and out[q]["ratio"] > out[q].get("out_rows_ratio", 1.0)),
            key=lambda q: -out[q]["ratio"],
        ),
    }
    if subset and os.path.exists(out_path):
        # merge: update only the probed entries (+ their memo lines),
        # keep the existing artifact's other lines and provenance
        with open(out_path) as f:
            prior = json.load(f)
        prior["queries"].update(out)
        prior.setdefault("merged_subsets", []).append(
            {"queries": subset, "runs_per_point": runs,
             "driver_mem": payload["driver_mem"]}
        )
        prior["superlinear"] = sorted(
            (q for q, rec in prior["queries"].items()
             if isinstance(rec, dict) and rec.get("ratio", -1) > 10.0
             and rec["ratio"] > rec.get("out_rows_ratio", 1.0)),
            key=lambda q: -prior["queries"][q]["ratio"],
        )
        payload = prior
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
