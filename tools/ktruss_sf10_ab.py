"""Isolated ktruss_edges@sf10 A/B (VERDICT r9 item 4).

SCALE_PROBE_sf10.json's interleaved runs recorded [150, 164, 689] s —
a 4.2x worst case. Two candidate causes: (a) the DISK_ONLY
persist/rotate thrashes when co-scheduled with other heavy queries
(probe interleaving), (b) ambient host contention. This tool runs the
query ISOLATED (nothing else on the JVM), N times, under both persist
levels — if isolated DISK_ONLY is tight at ~150 s the outlier was
co-scheduling; if it still spreads, the rotate itself is unstable and
the MEMORY_AND_DISK column shows whether changing the level fixes it.

Run:  SPARK_GRAFT_DRIVER_MEM=48g python tools/ktruss_sf10_ab.py [runs]
Appends a JSON line per configuration to stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from map_reduce_engine_cdps_spark.plans import graph
from map_reduce_engine_cdps_spark.session import get_spark

SF10 = "/root/repo/.benchdata/sf10"


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark(app_name="ktruss_sf10_ab")
    from pyspark import StorageLevel

    results = {}
    for label, level in [
        ("DISK_ONLY", StorageLevel.DISK_ONLY),
        ("MEMORY_AND_DISK", StorageLevel.MEMORY_AND_DISK),
    ]:
        # Pass the level explicitly (ktruss_edges storage_level arg) —
        # the r10 version monkey-patched pyspark.StorageLevel.DISK_ONLY,
        # which stopped working (and silently measured the shipped
        # level in both arms) once ktruss_edges switched its default to
        # MEMORY_AND_DISK (ADVICE r10).
        times = []
        for i in range(runs):
            t0 = time.monotonic()
            n = graph.ktruss_edges(spark, SF10, storage_level=level).count()
            dt = round(time.monotonic() - t0, 1)
            times.append(dt)
            print(
                json.dumps(
                    {"config": label, "run": i, "sec": dt, "rows": n}
                ),
                flush=True,
            )
        results[label] = times
    print(json.dumps({"summary": results, "runs": runs, "isolated": True}))


if __name__ == "__main__":
    main()
