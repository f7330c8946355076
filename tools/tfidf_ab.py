"""A/B attribution for the tfidf_top_terms sf1 drift (VERDICT r5 item 2).

The r4 sf1 number (1.64 s) was measured with the OLD bench methodology
(per-query: warm-up then median of 3 CONSECUTIVE runs in a session that
had just run that same query); the r5 number (2.58 s) with the NEW one
(median of >=5 passes INTERLEAVED across the whole 27-query suite).
`tfidf_top_terms` and every helper it touches (functions/text.py,
sources/readers.py) are byte-identical between the r4 tree (15515e8)
and HEAD, so any wall-clock difference is harness/JVM-context, not a
code regression. This script measures BOTH methodologies on the SAME
tree in the SAME process:

  phase A (r4 method): warm-up, then 5 consecutive timed runs.
  phase B (r5 method): 5 passes interleaved with four heavy neighbours
    (minhash_lsh_pairs, near_dup_clusters, ivf_ann_topk,
    shipping_priority) that fill the JVM with shuffle/broadcast state.

If median(A) ~= the r4 number and median(B) ~= the r5 number, the drift
is attributed to the methodology change; SCALE.md gets the note.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, ".")

from map_reduce_engine_cdps_spark.session import get_spark  # noqa: E402
from map_reduce_engine_cdps_spark.plans.registry import QUERIES  # noqa: E402

SF_DIR = ".benchdata/sf1"
NEIGHBOURS = [
    "minhash_lsh_pairs",
    "near_dup_clusters",
    "ivf_ann_topk",
    "shipping_priority",
]


def once(spark, fn) -> float:
    t0 = time.perf_counter()
    n = fn(spark, SF_DIR).count()
    assert n >= 0
    return time.perf_counter() - t0


def main() -> None:
    spark = get_spark()
    q = QUERIES()
    tfidf = q["tfidf_top_terms"]

    # Phase A — old (r4) methodology: isolated consecutive runs.
    once(spark, tfidf)  # warm-up
    a = [once(spark, tfidf) for _ in range(5)]

    # Phase B — new (r5) methodology: interleaved with heavy neighbours.
    for name in NEIGHBOURS:  # warm the neighbours too (r5 does a full
        once(spark, q[name])  # warm-up pass before timing)
    b = []
    for _ in range(5):
        for name in NEIGHBOURS:
            once(spark, q[name])
        b.append(once(spark, tfidf))

    out = {
        "sf_dir": SF_DIR,
        "isolated_runs": [round(x, 3) for x in a],
        "isolated_median": round(statistics.median(a), 3),
        "interleaved_runs": [round(x, 3) for x in b],
        "interleaved_median": round(statistics.median(b), 3),
        "r4_reference": 1.64,
        "r5_reference": 2.58,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
