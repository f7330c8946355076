"""Per-family timings for operators added after the frozen 27-query
headline set (bench.py). Same methodology: one warm-up, median of 3
timed runs to a full count at $SPARK_GRAFT_SF_DIR (default sf0.1).

Run: python tools/round_bench.py [query ...]   (default: round-2 adds)
Prints ONE JSON line mirroring bench.py's shape, tagged "extras".
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

ROUND2_EXTRAS = [
    "epoch_shuffle",
    "source_interleave",
    "event_transition_matrix",
    "cms_user_event_counts",
    "bm25_scores",
    "inverted_index_stats",
    "embedding_covariance",
    "pareto_orders",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:] or ROUND2_EXTRAS
    spark = get_spark(app_name="round_bench")
    timings: dict[str, float] = {}
    for name in names:
        fn, _ = _REGISTRY[name]
        fn(spark, sf_dir).count()  # warm-up
        runs = []
        for _ in range(3):
            t0 = time.monotonic()
            fn(spark, sf_dir).count()
            runs.append(time.monotonic() - t0)
        timings[name] = round(statistics.median(runs), 3)
    print(
        json.dumps(
            {
                "metric": "extras_query_wall_time_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]),
            }
        )
    )


if __name__ == "__main__":
    main()
