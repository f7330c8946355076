"""Fact-scan census: count per-table parquet scans in every registry
query's formatted physical plan and flag queries scanning one FACT
table >= THRESHOLD times.

This is the candidate-finder for SCALE.md rule 11 (checkpoint a shared
subtree only when the materialized frame is small — measure first): a
repeated scan in the pre-execution plan is only a CANDIDATE, because
ReusedExchange/ReusedSubquery dedupe many of them at runtime and a
codegen'd tokenize+aggregate re-evaluation can be cheaper than a fat
materialization. Round-8 census: 16 flagged, 2 real wins
(retrieval_ndcg_eval, query_expansion_pmi — small checkpointed frames),
14 runtime-deduplicated or scan-cheap (bm25/nb/bigram/rake/type_pair
A/B'd and left alone).

Run: python tools/scan_census.py [sf_dir] [threshold]
Defaults: $SPARK_GRAFT_SF_DIR (else /root/testdata/sf0.01) and 4.
Prints one line per flagged query; exit code 0 always (informational,
not a gate). The per-query disposition table from the round-8 census
lives in SCALE.md rule 11, not here.
"""

from __future__ import annotations

import collections
import contextlib
import io
import os
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from map_reduce_engine_cdps_spark.plans.registry import _REGISTRY
from map_reduce_engine_cdps_spark.session import get_spark

FACTS = ("lineitem", "orders", "documents", "events", "embeddings")
DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def _formatted_plan(df) -> str:
    # Public API only: df.explain(mode=...) prints to stdout; capture it.
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_SF_DIR
    threshold = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark(app_name="scan_census")
    n_flagged = 0
    for name, (fn, _) in _REGISTRY.items():
        try:
            plan = _formatted_plan(fn(spark, sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {type(e).__name__}: {e}")
            continue
        tables = re.findall(r"file:[^\s\]]*/(\w+)\.parquet", plan)
        counts = collections.Counter(t for t in tables if t in FACTS)
        heavy = {t: k for t, k in counts.items() if k >= threshold}
        if heavy:
            n_flagged += 1
            print(f"{name}: {heavy}")
    print(f"{n_flagged} queries scan a fact table >= {threshold}x "
          "(candidates, not defects — A/B before changing; rule 11)")


if __name__ == "__main__":
    main()
