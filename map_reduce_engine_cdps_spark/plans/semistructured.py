"""Semi-structured + Spark-4-native surfaces: VariantType over the
events.props JSON column and a Python UDTF (lateral table function)
restatement of the context-window chunker.

The reference parses semi-structured input row-by-row in task code
(csv.DictReader dict access with defaults, reference
tasks/accident_analysis.py:15-26); Spark 4's VariantType is the
engine-native form of the same capability — parse once into a binary
variant, then typed path extraction that Catalyst can push around. The
UDTF is the engine-native form of the reference's "arbitrary Python
producing many rows per input" map contract (reference
engine/worker.py:83-87, README.md:48-50), but expressed as a declared
table function the optimizer can lateral-join, not an opaque map phase.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

from map_reduce_engine_cdps_spark.plans.curation import CHUNK_TOKENS
from map_reduce_engine_cdps_spark.sources.readers import load_parallel, load_table


# ---------------------------------------------------------------------------
# variant_props_stats — parse events.props into a VariantType column once,
# then typed-path extraction (try_variant_get) + aggregate. At 100 TB the
# win over get_json_object is that the JSON is parsed exactly once into a
# compact binary encoding even when many paths are extracted, and shredded
# variant columns keep pushdown available; a missing path returns NULL via
# try_variant_get instead of failing the task.
# ---------------------------------------------------------------------------

def variant_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.try_variant_get(v, "$.k", "bigint")
    missing = F.try_variant_get(v, "$.missing", "string")
    return (
        ev.select("event_type", k.alias("k"), missing.alias("m"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.count("m").alias("n_missing_path"),
        )
    )


VARIANT_PROPS_STATS_SQL = """
SELECT event_type,
       count(*) AS n,
       CAST(sum(json_extract(props, '$.k')::BIGINT) AS BIGINT) AS sum_k,
       round(avg(json_extract(props, '$.k')::BIGINT), 4) AS avg_k,
       count(json_extract_string(props, '$.missing')) AS n_missing_path
FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# variant_typeof_profile — schema profiling of semi-structured data:
# schema_of_variant per row → frequency profile. This is the "what is
# actually in this JSON column" discovery query every ingest pipeline
# runs before committing to a schema; on shredded storage it reads only
# the variant metadata bytes, never the full document.
# ---------------------------------------------------------------------------

def variant_typeof_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    return (
        ev.select(F.schema_of_variant(v).alias("props_schema"))
        .groupBy("props_schema")
        .agg(F.count(F.lit(1)).alias("n"))
    )


VARIANT_TYPEOF_PROFILE_SQL = """
SELECT 'OBJECT<k: BIGINT>' AS props_schema, count(*) AS n
FROM events
WHERE json_type(json_extract(props, '$.k')) IN ('BIGINT', 'UBIGINT')
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# udtf_doc_chunks — the doc_chunks query re-expressed through a Python
# UDTF invoked as a SQL LATERAL table function. Same semantics and the
# SAME DuckDB oracle as plans/curation.doc_chunks, so the driver verifies
# the two formulations agree bit-for-bit. Arrow-batched; each input row
# fans out to ceil(n_tokens/CHUNK_TOKENS) output rows JVM→Python→JVM.
# Production guidance stays "prefer the built-in array-op formulation"
# (curation.doc_chunks is one narrow codegen'd stage); this exists to
# cover the declared-table-function surface itself.
# ---------------------------------------------------------------------------


@udtf(returnType="chunk_idx int, chunk_len int, chunk_hash string")
class ChunkDocUDTF:
    """Yield (chunk_idx, chunk_len, md5-of-chunk) per CHUNK_TOKENS-token
    slice of the lowercased whitespace tokenization — token semantics
    identical to functions/text.tokens (trim → lower → split \\s+ → drop
    empties)."""

    def eval(self, text: str):  # noqa: ANN201
        toks = [t for t in (text or "").strip().lower().split() if t]
        for ci in range(0, (len(toks) + CHUNK_TOKENS - 1) // CHUNK_TOKENS):
            chunk = toks[ci * CHUNK_TOKENS:(ci + 1) * CHUNK_TOKENS]
            digest = hashlib.md5(" ".join(chunk).encode("utf-8")).hexdigest()
            yield ci, len(chunk), digest


def udtf_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_parallel(spark, sf_dir, "documents")
    spark.udtf.register("chunk_doc", ChunkDocUDTF)
    docs.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, d.lang, c.chunk_idx, c.chunk_len, c.chunk_hash
        FROM _udtf_docs d, LATERAL chunk_doc(d.text) c
        """
    )


# ---------------------------------------------------------------------------
# udtf_top_sentences — a genuinely generative UDTF (not a restatement):
# split each document into sentences on [.!?], emit per-sentence index,
# token count and a stable hash. Oracle via DuckDB regexp_split + unnest
# with identical split/trim semantics.
# ---------------------------------------------------------------------------


@udtf(returnType="sent_idx int, n_tokens int, sent_hash string")
class SentencesUDTF:
    def eval(self, text: str):  # noqa: ANN201
        import re

        parts = re.split(r"[.!?]", (text or ""))
        idx = 0
        for p in parts:
            s = p.strip().lower()
            if not s:
                continue
            toks = s.split()
            yield idx, len(toks), hashlib.md5(s.encode("utf-8")).hexdigest()
            idx += 1


def udtf_doc_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_parallel(spark, sf_dir, "documents")
    spark.udtf.register("doc_sentences", SentencesUDTF)
    docs.createOrReplaceTempView("_udtf_docs_sent")
    return spark.sql(
        """
        SELECT d.doc_id, s.sent_idx, s.n_tokens, s.sent_hash
        FROM _udtf_docs_sent d, LATERAL doc_sentences(d.text) s
        """
    )


# ---------------------------------------------------------------------------
# pyds_synthetic_stats — reads the custom Python DataSource
# (sources/pyds.py) and aggregates it. The oracle recomputes the same
# deterministic generator in DuckDB SQL over range(), so this checks the
# source's partition planning end-to-end: any split of [0, numRows) must
# produce exactly the same multiset of rows.
# ---------------------------------------------------------------------------

PYDS_ROWS = 20_000


def pyds_synthetic_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from map_reduce_engine_cdps_spark.sources import pyds

    pyds.register(spark)
    df = (
        spark.read.format("synthetic_events")
        .option("numRows", PYDS_ROWS)
        .option("numPartitions", 16)
        .load()
    )
    return df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("user_id").alias("n_users"),
        F.round(F.sum("value"), 4).alias("sum_value"),
        F.max("event_id").alias("max_event_id"),
    )


PYDS_SYNTHETIC_STATS_SQL = f"""
WITH t AS (
  SELECT i AS event_id, (i * 37) % 97 AS user_id,
         ((i * i) % 1000) / 10.0 AS value,
         CASE i % 3 WHEN 0 THEN 'click' WHEN 1 THEN 'view'
                    ELSE 'purchase' END AS event_type
  FROM range(0, {PYDS_ROWS}) r(i)
)
SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users,
       round(sum(value), 4) AS sum_value, max(event_id) AS max_event_id
FROM t GROUP BY event_type
"""


UDTF_DOC_SENTENCES_SQL = """
WITH raw AS (
  SELECT doc_id,
         list_filter(
           list_transform(regexp_split_to_array(text, '[.!?]'),
                          x -> lower(trim(x))),
           x -> length(x) > 0) AS sents
  FROM documents
), s AS (
  SELECT doc_id, unnest(sents) AS sent,
         unnest(range(len(sents))) AS sent_idx
  FROM raw
)
SELECT doc_id, sent_idx,
       len(list_filter(regexp_split_to_array(sent, '\\s+'),
                       x -> length(x) > 0)) AS n_tokens,
       md5(sent) AS sent_hash
FROM s
"""


# ---------------------------------------------------------------------------
# udtf_top_tokens — POLYMORPHIC Python UDTF (Spark 4 analyze()): the
# output schema (tok1..tokK columns) is computed at PLAN TIME from the
# constant `k` argument — the table-function equivalent of generics.
# Token semantics match functions/text.clean_tokens; top-k ordering is
# count desc then token asc so the oracle's pivoted row_number ranking
# agrees exactly.
# ---------------------------------------------------------------------------


class TopTokensUDTF:
    @staticmethod
    def analyze(text, k):  # noqa: ANN001, ANN205
        from pyspark.sql.types import StringType, StructType
        from pyspark.sql.udtf import AnalyzeResult

        n = int(k.value)
        st = StructType()
        for i in range(n):
            st = st.add(f"tok{i + 1}", StringType())
        return AnalyzeResult(schema=st)

    def eval(self, text: str, k: int):  # noqa: ANN201
        import re
        from collections import Counter

        toks = [
            re.sub(r"[^a-z0-9]", "", t)
            for t in (text or "").strip().lower().split()
        ]
        toks = [t for t in toks if t]
        top = [
            t
            for t, _ in sorted(
                Counter(toks).items(), key=lambda kv: (-kv[1], kv[0])
            )[: int(k)]
        ]
        top += [None] * (int(k) - len(top))
        yield tuple(top)


def udtf_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf as _udtf

    docs = load_parallel(spark, sf_dir, "documents")
    spark.udtf.register("top_tokens", _udtf(TopTokensUDTF))
    docs.createOrReplaceTempView("_udtf_docs_topk")
    return spark.sql(
        """
        SELECT d.doc_id, t.tok1, t.tok2, t.tok3
        FROM _udtf_docs_topk d, LATERAL top_tokens(d.text, 3) t
        """
    )


UDTF_TOP_TOKENS_SQL = """
WITH toks AS (
  SELECT doc_id,
         regexp_replace(t.tok, '[^a-z0-9]', '', 'g') AS word
  FROM documents, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS t(tok)
  WHERE length(t.tok) > 0
),
counts AS (
  SELECT doc_id, word, count(*) AS c FROM toks
  WHERE length(word) > 0 GROUP BY doc_id, word
),
ranked AS (
  SELECT doc_id, word,
         row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, word ASC) AS rn
  FROM counts
)
SELECT doc_id,
       max(CASE WHEN rn = 1 THEN word END) AS tok1,
       max(CASE WHEN rn = 2 THEN word END) AS tok2,
       max(CASE WHEN rn = 3 THEN word END) AS tok3
FROM ranked GROUP BY doc_id
"""
