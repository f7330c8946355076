"""Distributed one-vs-one classifier pipeline (the reference's plants
workload, tasks/plants_classifier.py, re-architected Spark-first;
SURVEY.md §7 step 6).

Reference shape: images → per-image embedding (frozen CNN) → embeddings
multicast to every worker owning a species *pair* (a hand-rolled
replicated join via shuffle_func, tasks/plants_classifier.py:206-219 and
a greedy work-divider at 57-96) → per-pair binary LogisticRegression.

Spark-native shape: the multicast + work-division machinery collapses
into a real join — pairs ⋈ embeddings with the (tiny) pair table
broadcast — and per-pair training is a grouped-map Pandas UDF
(`applyInPandas`), Arrow-batched. At 100 TB scale the shuffle moves
each embedding once per pair membership (same as the reference's
multicast) but binary-encoded, combined, and AQE-balanced, and training
parallelism is per-pair tasks, not per-worker loops.

The trainer is a self-contained numpy logistic regression (deterministic
full-batch gradient descent) because sklearn isn't available in this
container — swapping in sklearn's LogisticRegression is a one-line
change inside ``_train_pair``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_engine_cdps_spark.sources.readers import load_table

TRAIN_SCHEMA = (
    "pair_key string, label_a int, label_b int, n_samples long, "
    "train_acc double, coef_norm double, intercept double"
)


def _sigmoid(z: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-np.clip(z, -30, 30)))


def _train_pair(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic binary logistic regression for one label pair.

    Full-batch GD, zero init, fixed LR/iters → reproducible across
    cluster layouts (no RNG, no data-order dependence beyond the
    pre-sort below).
    """
    pdf = pdf.sort_values("vec_id").reset_index(drop=True)
    label_a = int(pdf["label_a"].iloc[0])
    label_b = int(pdf["label_b"].iloc[0])
    x = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
    y = (pdf["label"].to_numpy() == label_b).astype(np.float64)
    w = np.zeros(x.shape[1])
    b = 0.0
    lr = 0.5
    for _ in range(200):
        p = _sigmoid(x @ w + b)
        grad_w = x.T @ (p - y) / len(y)
        grad_b = float(np.mean(p - y))
        w -= lr * grad_w
        b -= lr * grad_b
    acc = float(np.mean((_sigmoid(x @ w + b) >= 0.5) == (y == 1.0)))
    return pd.DataFrame(
        [
            {
                "pair_key": f"{label_a}_{label_b}",
                "label_a": label_a,
                "label_b": label_b,
                "n_samples": len(y),
                "train_acc": round(acc, 4),
                "coef_norm": round(float(np.linalg.norm(w)), 4),
                "intercept": round(b, 4),
            }
        ]
    )


def label_pairs_df(emb: DataFrame) -> DataFrame:
    """All unordered label pairs (reference tasks/plants_classifier.py:57-63)."""
    labels = emb.select("label").distinct()
    a, b = labels.alias("a"), labels.alias("b")
    return (
        a.crossJoin(b)
        .filter(F.col("a.label") < F.col("b.label"))
        .select(F.col("a.label").alias("label_a"), F.col("b.label").alias("label_b"))
    )


def train_one_vs_one(spark: SparkSession, sf_dir: str, model_dir: str | None = None) -> DataFrame:
    """Train one binary classifier per label pair over the embeddings
    table. Returns one row per pair (metrics + coefficients summary).

    The broadcast join replicates each embedding row to each of its
    pairs — the declarative replacement for the reference's multicast
    shuffle_func + divide_work (tasks/plants_classifier.py:57-96,
    206-219). If ``model_dir`` is given, per-pair coefficient rows are
    also persisted there as parquet (the reference's joblib side-output,
    tasks/plants_classifier.py:175-180, as a proper columnar sink).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = label_pairs_df(emb)
    sided = pairs.withColumn(
        "label", F.explode(F.array(F.col("label_a"), F.col("label_b")))
    )
    joined = emb.join(F.broadcast(sided), "label")
    trained = joined.groupBy("label_a", "label_b").applyInPandas(
        _train_pair, schema=TRAIN_SCHEMA
    )
    if model_dir is not None:
        trained.write.mode("overwrite").parquet(model_dir)
        return spark.read.parquet(model_dir)
    return trained


def one_vs_one_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: deterministic per-pair training metrics
    (non-SQL-expressible — iterative optimizer — so rows-only check)."""
    return train_one_vs_one(spark, sf_dir).orderBy("label_a", "label_b")


# ---------------------------------------------------------------------------
# Ensemble majority-vote evaluation — the reference's tester flow
# (scripts/plants_classifier_tester.py:37-58): every one-vs-one model
# votes on every sample; the majority label wins (ties → smallest
# label); accuracy is reported per true label (T33 mode-per-group +
# T34 accuracy). Spark-native shape: the C(n,2) models are a bounded
# driver-side artifact (like kmeans centroids), broadcast into an
# Arrow-batched scoring UDF; only (vec, true, pred) rows ever shuffle,
# and only to the per-label accuracy aggregate.
# ---------------------------------------------------------------------------

FULL_TRAIN_SCHEMA = (
    "label_a int, label_b int, weights array<double>, intercept double"
)


def _train_pair_full(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("vec_id").reset_index(drop=True)
    label_a = int(pdf["label_a"].iloc[0])
    label_b = int(pdf["label_b"].iloc[0])
    x = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
    y = (pdf["label"].to_numpy() == label_b).astype(np.float64)
    w = np.zeros(x.shape[1])
    b = 0.0
    lr = 0.5
    for _ in range(200):
        p = _sigmoid(x @ w + b)
        w -= lr * (x.T @ (p - y) / len(y))
        b -= lr * float(np.mean(p - y))
    return pd.DataFrame(
        [
            {
                "label_a": label_a,
                "label_b": label_b,
                "weights": list(w),
                "intercept": b,
            }
        ]
    )


def ensemble_vote_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry (rows-only): one-vs-one ensemble evaluated by
    majority vote, per-true-label accuracy. Deterministic end to end
    (GD trainer has no RNG; tie-break = smallest label)."""
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = label_pairs_df(emb)
    sided = pairs.withColumn(
        "label", F.explode(F.array(F.col("label_a"), F.col("label_b")))
    )
    models_rows = (
        emb.join(F.broadcast(sided), "label")
        .groupBy("label_a", "label_b")
        .applyInPandas(_train_pair_full, schema=FULL_TRAIN_SCHEMA)
        .collect()
    )
    models = [
        (r["label_a"], r["label_b"], np.asarray(r["weights"]), r["intercept"])
        for r in models_rows
    ]
    bc = spark.sparkContext.broadcast(models)

    @F.pandas_udf("int")
    def vote(embs: pd.Series) -> pd.Series:
        ms = bc.value
        x = np.vstack(embs.to_numpy()).astype(np.float64)
        labels = sorted({m[0] for m in ms} | {m[1] for m in ms})
        counts = {lab: np.zeros(len(x), dtype=np.int64) for lab in labels}
        for la, lb, w, b in ms:
            is_b = _sigmoid(x @ w + b) >= 0.5
            counts[lb] += is_b.astype(np.int64)
            counts[la] += (~is_b).astype(np.int64)
        # majority vote, ties to the smallest label (labels iterated asc)
        best = np.full(len(x), labels[0])
        best_n = counts[labels[0]].copy()
        for lab in labels[1:]:
            better = counts[lab] > best_n
            best = np.where(better, lab, best)
            best_n = np.maximum(best_n, counts[lab])
        return pd.Series(best, dtype="int32")

    scored = emb.select("label", vote(F.col("embedding")).alias("pred"))
    return scored.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_samples"),
        F.round(
            F.avg((F.col("pred") == F.col("label")).cast("double")), 4
        ).alias("vote_accuracy"),
    )


# ---------------------------------------------------------------------------
# The plants workload through the 4-hook compat shim — the reference's
# ACTUAL program shape (tasks/plants_classifier.py): init computes the
# pair→worker plan (divide_work, :57-96), map emits (label, embedding)
# pairs (:190-203), shuffle MULTICASTS each label to every worker
# owning one of its pairs (:206-219), and the worker-aware reduce
# trains the pairs assigned to that worker id (:222-231). Training
# math and the vec_id pre-sort are shared with the DataFrame path, so
# the two formulations must produce identical metrics — asserted in
# tests. (The DataFrame path remains the recommended one: SURVEY §4.1
# shows the broadcast join subsumes divide_work.)
# ---------------------------------------------------------------------------


def one_vs_one_shim(spark: SparkSession, sf_dir: str, n_workers: int = 4) -> DataFrame:
    from map_reduce_engine_cdps_spark.compat.mapreduce import run_task

    emb = load_table(spark, sf_dir, "embeddings")
    labels = sorted(r["label"] for r in emb.select("label").distinct().collect())
    pairs = [
        (a, b) for i, a in enumerate(labels) for b in labels[i + 1 :]
    ]

    def init_func(_worker_id: int):
        # divide_work analogue: pair i trains on worker i % n; a label
        # multicasts to every worker owning one of its pairs
        pair_worker = {p: i % n_workers for i, p in enumerate(pairs)}
        label_targets: dict[int, list[int]] = {}
        for (a, b), w in pair_worker.items():
            for lab in (a, b):
                ts = label_targets.setdefault(lab, [])
                if w not in ts:
                    ts.append(w)
        return {"pair_worker": pair_worker, "label_targets": label_targets}

    state = init_func(0)

    def map_func(items, _pid):
        return [
            (r["label"], (r["vec_id"], list(r["embedding"]))) for r in items
        ]

    def shuffle_func(label):
        return state["label_targets"][label]

    def reduce_func(grouped, pid, st):
        out = []
        by_label = dict(grouped)
        for (a, b), w in sorted(st["pair_worker"].items()):
            if w != pid or a not in by_label or b not in by_label:
                continue
            rows = [(vid, vec, a) for vid, vec in by_label[a]] + [
                (vid, vec, b) for vid, vec in by_label[b]
            ]
            rows.sort(key=lambda t: t[0])  # the _train_pair vec_id pre-sort
            x = np.array([v for _, v, _ in rows], dtype=np.float64)
            y = np.array([1.0 if lab == b else 0.0 for _, _, lab in rows])
            w_vec = np.zeros(x.shape[1])
            bias = 0.0
            for _ in range(200):
                p = _sigmoid(x @ w_vec + bias)
                w_vec -= 0.5 * (x.T @ (p - y) / len(y))
                bias -= 0.5 * float(np.mean(p - y))
            acc = float(np.mean((_sigmoid(x @ w_vec + bias) >= 0.5) == (y == 1.0)))
            out.append(
                {
                    "pair_key": f"{a}_{b}",
                    "label_a": a,
                    "label_b": b,
                    "n_samples": len(y),
                    "train_acc": round(acc, 4),
                    "coef_norm": round(float(np.linalg.norm(w_vec)), 4),
                    "intercept": round(bias, 4),
                }
            )
        return out

    results = run_task(
        spark,
        emb.select("label", "vec_id", "embedding"),
        map_func,
        shuffle_func=shuffle_func,
        reduce_func=reduce_func,
        init_func=init_func,
        num_partitions=n_workers,
    ).collect()
    return spark.createDataFrame(
        results,
        "pair_key string, label_a int, label_b int, n_samples long, "
        "train_acc double, coef_norm double, intercept double",
    )


def one_vs_one_shim_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checkable projection of the shim's routing ledger.

    ``n_samples`` in the shim output is the number of rows the
    multicast shuffle actually DELIVERED to the worker that trained
    pair (a, b) — so comparing it against a plain per-label-pair
    count(*) certifies that the init/map/multicast-shuffle/reduce
    machinery routed exactly the right rows to exactly one worker per
    pair (no drops, no double-delivery). The iterative trainer metrics
    stay in the rows-only ``one_vs_one_shim`` entry.
    """
    return one_vs_one_shim(spark, sf_dir).select(
        "pair_key", "label_a", "label_b", "n_samples"
    )


ONE_VS_ONE_SHIM_PAIRS_SQL = """
WITH counts AS (
  SELECT label, count(*) AS n FROM embeddings GROUP BY label
)
SELECT cast(a.label AS varchar) || '_' || cast(b.label AS varchar) AS pair_key,
       a.label AS label_a, b.label AS label_b,
       cast(a.n + b.n AS bigint) AS n_samples
FROM counts a JOIN counts b ON a.label < b.label
"""
