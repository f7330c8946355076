"""Round-12 measurement probe: per-query isolated timing with the noop
sink + the EXECUTED (post-AQE) plan, so runtime exchange/stage reuse is
visible (the initial explain() hides it: isFinalPlan=false).

Usage:
    python tools/r12_measure.py <query> [query ...]      # sf0.1 default
    SPARK_GRAFT_SF_DIR=... python tools/r12_measure.py <query> ...

Per query: 1 warm-up noop run, then 3 timed noop runs (median printed),
then the executed plan summary (node histogram + reuse markers).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from map_reduce_engine_cdps_spark.plans.registry import _REGISTRY
from map_reduce_engine_cdps_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    names = sys.argv[1:]
    spark = get_spark(app_name="r12_measure")
    sc = spark.sparkContext
    for name in names:
        fn, _ = _REGISTRY[name]
        sc.setJobDescription(f"r12_measure:{name}:warmup")
        df = fn(spark, SF_DIR)
        t0 = time.perf_counter()
        noop(df)
        warm = time.perf_counter() - t0
        times = []
        for i in range(3):
            sc.setJobDescription(f"r12_measure:{name}:run{i}")
            df_i = fn(spark, SF_DIR)
            t0 = time.perf_counter()
            noop(df_i)
            times.append(time.perf_counter() - t0)
        sc.setJobDescription(None)
        # collect() executes THIS DataFrame's QueryExecution, so the
        # AQE final plan (with ReusedExchange markers) is readable; a
        # noop write or count() runs a separate QueryExecution and
        # leaves this one at isFinalPlan=false.
        df_f = fn(spark, SF_DIR)
        df_f.collect()
        executed = df_f._jdf.queryExecution().executedPlan().toString()
        lines = executed.splitlines()
        reuse = [ln.strip()[:120] for ln in lines if "Reused" in ln]
        n_ex = sum(1 for ln in lines if "Exchange" in ln and "Reused" not in ln)
        n_scan = sum(1 for ln in lines if "Scan parquet" in ln)
        n_py = sum(
            1 for ln in lines
            if "EvalPython" in ln or "MapInPandas" in ln or "FlatMapGroupsInPandas" in ln
        )
        print(
            f"{name}: warm={warm:.3f}s median={statistics.median(times):.3f}s "
            f"runs={[round(t,3) for t in times]} "
            f"| executed: {n_ex} exchanges, {n_scan} scans, {n_py} pyEval, "
            f"{len(reuse)} reused"
        )
        for r in reuse:
            print(f"    {r}")
        if os.environ.get("R12_DUMP_DIR"):
            os.makedirs(os.environ["R12_DUMP_DIR"], exist_ok=True)
            with open(os.path.join(os.environ["R12_DUMP_DIR"], f"{name}_executed.txt"), "w") as fh:
                fh.write(executed)


if __name__ == "__main__":
    main()
