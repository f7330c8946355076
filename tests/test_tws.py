"""transformWithStateInPandas sessionizer (streaming/tws.py).

The execution path needs google.protobuf (the TWS state-server
protocol); in environments without it the operator raises a clear
NotImplementedError and these tests assert that gate instead. When
protobuf IS present, the TWS result must equal the
applyInPandasWithState sessionizer's (same operator, successor API).
"""

from __future__ import annotations

import pytest

from map_reduce_engine_cdps_spark.streaming import tws


def test_processor_sessionizes_locally():
    """The per-group logic itself is plain pandas — unit-test it without
    a state store by faking ValueState."""
    import pandas as pd

    class FakeState:
        def __init__(self):
            self.v = None

        def exists(self):
            return self.v is not None

        def get(self):
            return self.v

        def update(self, v):
            self.v = v

    p = tws.SessionCountProcessor()
    p._state = FakeState()
    # 3 events: two 1 s apart (one session), one 2 h later (new session)
    ts_ns = pd.Series([0, 1_000_000_000, 7_200 * 10**9], dtype="int64")
    out = list(
        p.handleInputRows((42,), iter([pd.DataFrame({"ts": ts_ns})]), None)
    )
    assert len(out) == 1
    row = out[0].iloc[0]
    assert (row["user_id"], row["n_sessions"], row["n_events"]) == (42, 2, 3)
    # second microbatch continues from state: event right after the last
    out2 = list(
        p.handleInputRows(
            (42,),
            iter([pd.DataFrame({"ts": pd.Series([7_201 * 10**9], dtype="int64")})]),
            None,
        )
    )
    row2 = out2[0].iloc[0]
    assert (row2["n_sessions"], row2["n_events"]) == (2, 4)


def test_tws_end_to_end_or_gated(spark, sf_dir):
    if not tws.tws_available():
        with pytest.raises(NotImplementedError, match="protobuf"):
            tws.streaming_sessions_tws(spark, sf_dir)
        return
    got = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in tws.streaming_sessions_tws(spark, sf_dir).collect()
    }
    from map_reduce_engine_cdps_spark.streaming.stateful import (
        streaming_user_sessions,
    )

    want = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in streaming_user_sessions(spark, sf_dir).collect()
    }
    assert got == want
