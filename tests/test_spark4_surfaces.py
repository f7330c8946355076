"""Spark-4-native surfaces: VariantType, Python UDTFs, and the custom
Python DataSource. Each test checks a property the sf0.001 smoke run
can't: typed-path semantics, formulation equivalence, and split-plan
invariance.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_engine_cdps_spark.plans import curation, semistructured
from map_reduce_engine_cdps_spark.sources import pyds


def test_variant_typed_extraction(spark):
    df = spark.createDataFrame(
        [('{"k": 7, "s": "x"}',), ('{"k": "notanint"}',), ("[1,2]",)],
        "props string",
    )
    v = F.parse_json("props")
    got = df.select(
        F.try_variant_get(v, "$.k", "bigint").alias("k"),
        F.try_variant_get(v, "$.s", "string").alias("s"),
        F.try_variant_get(v, "$[0]", "bigint").alias("first"),
    ).collect()
    assert (got[0]["k"], got[0]["s"], got[0]["first"]) == (7, "x", None)
    # "notanint" is not castable to bigint → try_ returns null, no failure
    assert got[1]["k"] is None
    assert got[2]["first"] == 1


def test_udtf_chunks_match_builtin_formulation(spark, sf_dir):
    """UDTF lateral join and the built-in array-op chunker must produce
    the identical multiset of (doc_id, chunk_idx, chunk_len, chunk_hash)."""
    builtin = {
        tuple(r) for r in curation.doc_chunks(spark, sf_dir).collect()
    }
    via_udtf = {
        tuple(r) for r in semistructured.udtf_doc_chunks(spark, sf_dir).collect()
    }
    assert builtin == via_udtf
    assert len(builtin) > 0


def test_udtf_sentences_counts(spark):
    spark.udtf.register("doc_sentences_t", semistructured.SentencesUDTF)
    rows = spark.sql(
        "SELECT s.* FROM (SELECT 'One two. Three!  ' AS text) t, "
        "LATERAL doc_sentences_t(t.text) s ORDER BY s.sent_idx"
    ).collect()
    assert [(r["sent_idx"], r["n_tokens"]) for r in rows] == [(0, 2), (1, 1)]


def test_pyds_split_invariance(spark):
    """Same numRows under different split plans → identical multiset:
    re-splitting the source never changes its contents (the 100 TB
    resize-safety property)."""
    pyds.register(spark)

    def load(parts: int):
        return (
            spark.read.format("synthetic_events")
            .option("numRows", 1000)
            .option("numPartitions", parts)
            .load()
        )

    one = sorted(tuple(r) for r in load(1).collect())
    many = sorted(tuple(r) for r in load(13).collect())
    assert one == many
    assert len(one) == 1000
    assert load(13).rdd.getNumPartitions() == 13


def test_pyds_schema_and_determinism(spark):
    pyds.register(spark)
    df = (
        spark.read.format("synthetic_events")
        .option("numRows", 10)
        .option("numPartitions", 2)
        .load()
    )
    assert [f.name for f in df.schema.fields] == [
        "event_id",
        "user_id",
        "value",
        "event_type",
    ]
    rows = {r["event_id"]: r for r in df.collect()}
    assert rows[3]["user_id"] == (3 * 37) % 97
    assert rows[3]["event_type"] == "click"
    assert rows[4]["value"] == ((4 * 4) % 1000) / 10.0


def test_pyds_streaming_reader_drains_and_replays(spark):
    """Streaming face of the custom source: microbatches advance by
    offset until the synthetic feed is exhausted, and the final counts
    equal the batch read of the same numRows — stream ≡ batch for a
    pure-function-of-offset source."""
    import time

    from pyspark.sql import functions as F

    pyds.register(spark)
    n_rows = 3000
    stream = (
        spark.readStream.format("synthetic_events")
        .option("numRows", n_rows)
        .option("rowsPerBatch", 700)
        .load()
    )
    agg = stream.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("s")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("pyds_stream_drain")
        .outputMode("complete")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 90
        while time.time() < deadline:
            got = spark.table("pyds_stream_drain").agg(F.sum("n")).collect()[0][0]
            if got == n_rows:
                break
            time.sleep(1)
        assert got == n_rows, f"stream drained only {got}/{n_rows} rows"
    finally:
        q.stop()
    streamed = {
        (r["event_type"], r["n"], r["s"])
        for r in spark.table("pyds_stream_drain").collect()
    }
    batch = (
        spark.read.format("synthetic_events")
        .option("numRows", n_rows)
        .load()
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("s"))
    )
    assert streamed == {tuple(r) for r in batch.collect()}


def test_pyds_stream_replay_determinism():
    """readBetweenOffsets (the failure-replay path) must reproduce
    exactly the rows the original polls produced."""
    r = pyds.SyntheticEventsStreamReader({"numRows": "100", "rowsPerBatch": "30"})
    polled, off = [], r.initialOffset()
    while off["idx"] < 100:
        rows, off2 = r.read(off)
        polled.extend(rows)
        off = off2
    assert len(polled) == 100
    assert polled == list(r.readBetweenOffsets({"idx": 0}, {"idx": 100}))
