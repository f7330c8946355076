"""Property + example tests for the MapReduce compatibility shim
(SURVEY.md §5.2 items 4-5; fixture spec FIXTURES.md F5).

The oracle is ``simulate_locally`` — an independent single-process
executable spec of the reference pipeline (engine/worker.py:93-158
semantics: multicast bucketing, arrival-order grouping, partition-id-
visible reduce).
"""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from map_reduce_engine_cdps_spark.compat.mapreduce import (
    default_shuffle,
    run_task,
    simulate_locally,
)

keys = st.text(alphabet="abcdef", min_size=1, max_size=3)
values = st.one_of(st.integers(-100, 100), st.floats(allow_nan=False, allow_infinity=False, width=32), st.lists(st.integers(0, 5), max_size=3))
pairs_strategy = st.lists(st.tuples(keys, values), max_size=40)


def normalize(results: list) -> Counter:
    """Order-insensitive multiset of stringified results (values may be
    unhashable lists)."""
    return Counter(repr(r) for r in results)


def multicast_mod3(key: str) -> list[int]:
    # multicast: route to len(key) distinct targets incl. duplicates
    return [hash_stable(key) + i for i in range(1 + len(key) % 3)]


def hash_stable(key: str) -> int:
    return sum(ord(c) for c in key)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(pairs=pairs_strategy, n=st.integers(1, 8))
def test_shim_matches_simulation_identity_reduce(spark, pairs, n):
    """∀ pair lists + partition counts: shim(groupByKey∘multicast) ≡
    single-process simulation — identity (default) reduce."""
    def map_func(items, worker_id):
        return list(items)

    expected = simulate_locally(pairs, n, shuffle_func=multicast_mod3)
    got = run_task(
        spark,
        [list(p) for p in pairs] or [],
        map_func,
        shuffle_func=multicast_mod3,
        num_partitions=n,
    ).collect()
    exp_flat = [r for out in expected.values() for r in out]
    assert normalize(got) == normalize(exp_flat)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(pairs=st.lists(st.tuples(keys, st.integers(-50, 50)), max_size=40), n=st.integers(1, 6))
def test_shim_matches_simulation_sum_reduce_with_worker_id(spark, pairs, n):
    """Reduce sees the correct partition id (reference
    engine/worker.py:156 passes WORKER_ID to reduce_func)."""
    def map_func(items, worker_id):
        return list(items)

    def reduce_func(grouped, worker_id):
        return [(k, sum(vs), worker_id) for k, vs in grouped]

    expected = simulate_locally(pairs, n, shuffle_func=default_shuffle, reduce_func=reduce_func)
    got = run_task(
        spark,
        [list(p) for p in pairs] or [],
        map_func,
        reduce_func=reduce_func,
        num_partitions=n,
    ).collect()
    exp_flat = [r for out in expected.values() for r in out]
    assert normalize(got) == normalize(exp_flat)
    # every reported worker_id is a valid partition index
    assert all(0 <= r[2] < n for r in got)


def test_multicast_duplication_counts(spark):
    """Reference semantics (engine/worker.py:95-99): one bucket append
    per listed target — a key multicast to 4 partitions groups in each;
    a duplicated target duplicates the value within that partition."""
    def map_func(items, worker_id):
        return [("x", 1) for _ in items]

    def everywhere(key):
        return [0, 1, 2, 3]

    got = run_task(
        spark, [0], map_func, shuffle_func=everywhere, num_partitions=4
    ).collect()
    assert normalize(got) == Counter({repr(("x", [1])): 4})

    def twice_same(key):
        return [5, 5]  # both → partition 5 % 4 = 1, appended twice

    got2 = run_task(
        spark, [0], map_func, shuffle_func=twice_same, num_partitions=4
    ).collect()
    assert normalize(got2) == Counter({repr(("x", [1, 1])): 1})


def test_init_state_broadcast(spark):
    """init_func state reaches map and reduce hooks (reference INIT
    stage engine/worker.py:78-80)."""
    def init_func(worker_id):
        return {"factor": 10}

    def map_func(items, worker_id, state):
        return [("k", v * state["factor"]) for v in items]

    def reduce_func(grouped, worker_id, state):
        return [(k, sum(vs) + state["factor"]) for k, vs in grouped]

    got = run_task(
        spark, [1, 2, 3], map_func, reduce_func=reduce_func,
        init_func=init_func, num_partitions=2,
    ).collect()
    assert got == [("k", 70)]


def test_wordcount_shim_equals_dataframe_path(spark, sf_dir):
    """Reference-style wordcount program through the shim ≡ the
    DataFrame wordcount (plans/textops.py) on the same table."""
    from map_reduce_engine_cdps_spark.plans.textops import wordcount
    from map_reduce_engine_cdps_spark.plans.workloads import wordcount_shim

    df_counts = {(r["word"], r["cnt"]) for r in wordcount(spark, sf_dir).collect()}
    shim_counts = {(r["word"], r["cnt"]) for r in wordcount_shim(spark, sf_dir).collect()}
    assert df_counts == shim_counts
