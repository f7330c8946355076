"""Capture .explain("formatted") for round-12 optimization evidence.

Usage:
    python tools/r12_plans.py before [query ...]   # plans/r12/<q>_before.txt
    python tools/r12_plans.py after  [query ...]   # plans/r12/<q>_after.txt

With no query names, captures the full bench HEADLINE set. Plans are
captured at sf0.01 (plan shape is SF-invariant for these queries; the
scan stats differ only in sizes).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

from map_reduce_engine_cdps_spark.plans.registry import _REGISTRY
from map_reduce_engine_cdps_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
OUT_DIR = "/root/repo/plans/r12"


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    if not names:
        from bench import HEADLINE

        names = list(HEADLINE)
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark(app_name=f"r12_plans_{tag}")
    for name in names:
        fn, _ = _REGISTRY[name]
        try:
            df = fn(spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as e:  # noqa: BLE001
            text = f"ERROR capturing plan: {type(e).__name__}: {e}\n"
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} — {tag} (round 12), sf_dir={SF_DIR}\n\n")
            fh.write(text)
        n_exchange = text.count("Exchange")
        n_py = text.count("BatchEvalPython") + text.count("ArrowEvalPython")
        print(f"{name}: {len(text)} chars, Exchange x{n_exchange}, PyEval x{n_py}")


if __name__ == "__main__":
    main()
