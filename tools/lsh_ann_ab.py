"""A/B attribution for the lsh_ann_topk r8 driver-window sf1 doubling
(VERDICT r8 item 2 / "What's wrong" #1).

The driver's BENCH_r08.json sf1 half read lsh_ann_topk at 3.03 s vs
1.53 s in r7 on a byte-identical code path (plans/similarity.py did
not change r7->r8 on that query). The builder's sf10 probe on the same
tree read sf1 = 1.71 s, and warm fresh-session cross-checks reproduced
the r7 value, so the working hypothesis is cold planning / JVM context
on the re-provisioned driver container — but lsh_ann_topk itself never
got a named A/B. This script is that receipt, the tfidf_ab.py pattern
applied to the drifted query, all on the SAME tree in ONE process:

  phase COLD: the very first execution in this fresh session (the
    driver's context — per-query first-touch planning, codegen, and
    Arrow/Python worker spin-up are all in this number).
  phase A (isolated): 5 consecutive timed runs after warm-up.
  phase B (interleaved): 5 passes each preceded by the four heavy
    minhash/ANN neighbours that surround it in the driver window,
    filling the JVM with competing shuffle/broadcast state.

Interpretation: if COLD ~= the r8 driver number (~3 s) while
median(A) and median(B) both land at the r7/probe value (~1.5-1.7 s),
the drift is first-touch cost in a cold window, not a regression; if
median(B) >> median(A), it is interleaving pressure; if all three are
high, it is a real regression and the plan needs re-audit.
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from map_reduce_engine_cdps_spark.session import get_spark  # noqa: E402
from map_reduce_engine_cdps_spark.plans.registry import QUERIES  # noqa: E402

SF_DIR = ".benchdata/sf1"
NEIGHBOURS = [
    "minhash_lsh_pairs",
    "near_dup_clusters",
    "simhash_buckets",
    "ivf_ann_topk",
]


def once(spark, fn) -> float:
    t0 = time.perf_counter()
    n = fn(spark, SF_DIR).count()
    assert n >= 0
    return time.perf_counter() - t0


def main() -> None:
    spark = get_spark()
    q = QUERIES()
    target = q["lsh_ann_topk"]

    # Phase COLD — first touch in a fresh session (driver context).
    cold = once(spark, target)

    # Phase A — isolated consecutive warm runs.
    a = [once(spark, target) for _ in range(5)]

    # Phase B — interleaved with the heavy dedup/ANN neighbours that
    # precede it in the certification window.
    for name in NEIGHBOURS:
        once(spark, q[name])  # warm the neighbours first
    b = []
    for _ in range(5):
        for name in NEIGHBOURS:
            once(spark, q[name])
        b.append(once(spark, target))

    out = {
        "query": "lsh_ann_topk",
        "sf_dir": SF_DIR,
        "cold_first_run": round(cold, 3),
        "isolated_runs": [round(x, 3) for x in a],
        "isolated_median": round(statistics.median(a), 3),
        "interleaved_runs": [round(x, 3) for x in b],
        "interleaved_median": round(statistics.median(b), 3),
        "r7_driver_reference": 1.53,
        "r8_driver_reference": 3.03,
        "sf10_probe_sf1_reference": 1.71,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
