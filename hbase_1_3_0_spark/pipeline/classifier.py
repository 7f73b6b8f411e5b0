"""Hashed-feature logistic-regression quality classifier (train + score).

The quality-filtering component of GPT-3-style pipelines (Brown 2020
§A: a classifier trained to separate a high-quality reference corpus
from raw crawl, whose score gates documents), in the fastText shape
(Joulin 2016: bag of hashed n-gram features, linear model). DSIR
(pipeline/dsir.py) is the importance-weighting alternative; this is
the discriminative one.

Model: logistic regression over the SAME hashed unigram+bigram bucket
features as DSIR (``dsir.hashed_ngram_counts``), mean-normalized per
document (fastText's averaged bag keeps long docs from dominating the
margin). The intercept is feature bucket ``-1`` with x=1 on every doc
(bias-as-feature), so one gradient aggregation updates the whole
model. Training is full-batch gradient descent — ``iterations``
deterministic passes, zero init, fixed learning rate.

Scale shape (the reason to train IN Spark rather than export):
- One corpus featurize, checkpointed; iterations never re-tokenize.
- Per iteration: ONE broadcast weight join + ONE (doc) margin agg +
  ONE (bucket) gradient agg. Nothing quadratic; the only materialized
  state is the weight table (<= buckets+1 rows, KB-scale — the
  k-means/PQ model-state precedent), localCheckpoint'd per round with
  the superseded checkpoint unpersisted (the BPE convention).
- Scoring is one featurize + one broadcast join + one doc agg — a
  map-side pipeline over the corpus.
- Full-batch GD converges slower per pass than SGD but is the
  deterministic, retry-safe formulation (no sample-order dependence);
  at 100 TB each pass is one scan of the bounded feature table and
  ~10 passes beat shipping the corpus to a single-node trainer.

Float caveat: distributed sums make bit-identity across engines
impossible; pytest compares against a pure-Python trainer at 1e-6 and
the driver check is rows-only + py-model (the trained-float-model
ceiling, same as PQ/k-means/BPE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hbase_1_3_0_spark.pipeline.dsir import hashed_ngram_counts

__all__ = [
    "normalized_features",
    "train_quality_classifier",
    "score_quality",
]

#: the intercept's pseudo-bucket (real buckets are >= 0)
BIAS_BUCKET = -1


def normalized_features(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 4096,
) -> DataFrame:
    """(doc_id, bucket, x): hashed n-gram counts scaled to the doc mean
    (x = cnt / total grams in doc — fastText's averaged bag), plus the
    bias row (BIAS_BUCKET, 1.0) for every doc that has at least one
    gram. Both shuffles key on doc_id (exchange reuse)."""
    counts = hashed_ngram_counts(
        df, text_col=text_col, id_col=id_col, buckets=buckets
    )
    totals = counts.groupBy("doc_id").agg(F.sum("cnt").alias("_n"))
    feats = counts.join(totals, "doc_id").select(
        "doc_id", "bucket", (F.col("cnt") / F.col("_n")).alias("x")
    )
    bias_rows = totals.select(
        "doc_id",
        F.lit(BIAS_BUCKET).cast("long").alias("bucket"),
        F.lit(1.0).alias("x"),
    )
    return feats.unionByName(bias_rows)


def _margins(features: DataFrame, weights: DataFrame) -> DataFrame:
    """(doc_id, m): per-doc linear margin w·x (the bias rides along as
    feature BIAS_BUCKET) via a broadcast weight join + one doc agg.
    Buckets without a weight row contribute 0."""
    return (
        features.join(F.broadcast(weights), "bucket", "left")
        .groupBy("doc_id")
        .agg(F.sum(F.col("x") * F.coalesce(F.col("w"), F.lit(0.0))).alias("m"))
    )


def train_quality_classifier(
    positive: DataFrame,
    negative: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 4096,
    iterations: int = 10,
    lr: float = 2.0,
    l2: float = 1e-4,
) -> DataFrame:
    """Train on positive (reference-quality) vs negative (raw) docs.

    Returns the weight table ``(bucket, w)`` — at most ``buckets``+1
    rows; row ``bucket = -1`` is the intercept. Full-batch logistic
    GD: p = sigmoid(w·x), gradient on bucket j is mean over docs of
    (p − y)·x_j plus L2 (intercept unregularized, the standard
    convention). Docs with zero grams carry no information for a
    bag-of-words model and drop out of training.
    """
    pos = normalized_features(
        positive, text_col=text_col, id_col=id_col, buckets=buckets
    ).select(
        F.concat(F.lit("p"), F.col("doc_id").cast("string")).alias("doc_id"),
        "bucket",
        "x",
        F.lit(1.0).alias("y"),
    )
    neg = normalized_features(
        negative, text_col=text_col, id_col=id_col, buckets=buckets
    ).select(
        F.concat(F.lit("n"), F.col("doc_id").cast("string")).alias("doc_id"),
        "bucket",
        "x",
        F.lit(0.0).alias("y"),
    )
    feats = pos.unionByName(neg).localCheckpoint()
    n_docs = feats.where(F.col("bucket") == BIAS_BUCKET).count()
    if n_docs == 0:
        raise ValueError("no documents with at least one token to train on")

    spark = positive.sparkSession
    weights = spark.createDataFrame([], "bucket bigint, w double")
    prev_ckpt: DataFrame | None = None
    for _ in range(iterations):
        m = _margins(feats, weights)
        p = m.select("doc_id", (1.0 / (1.0 + F.exp(-F.col("m")))).alias("p"))
        grad = (
            feats.join(p, "doc_id")
            .select(
                "bucket", ((F.col("p") - F.col("y")) * F.col("x")).alias("g")
            )
            .groupBy("bucket")
            .agg((F.sum("g") / n_docs).alias("g"))
        )
        new_w = (
            grad.join(weights, "bucket", "full")
            .select(
                "bucket",
                (
                    F.coalesce(F.col("w"), F.lit(0.0))
                    - lr
                    * (
                        F.coalesce(F.col("g"), F.lit(0.0))
                        + F.when(
                            F.col("bucket") == BIAS_BUCKET, F.lit(0.0)
                        ).otherwise(l2 * F.coalesce(F.col("w"), F.lit(0.0)))
                    )
                ).alias("w"),
            )
            .localCheckpoint()
        )
        if prev_ckpt is not None:
            prev_ckpt.unpersist()
        prev_ckpt = weights
        weights = new_w
    return weights


def score_quality(
    df: DataFrame,
    weights: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 4096,
) -> DataFrame:
    """(doc_id, score): sigmoid quality probability per document — one
    featurize + one broadcast weight join + one doc agg. Docs with
    zero grams have no features (not even the bias row) and score at
    sigmoid(bias) via the left join back to the id universe."""
    feats = normalized_features(
        df, text_col=text_col, id_col=id_col, buckets=buckets
    )
    m = _margins(feats, weights)
    # always exactly one row (null w -> bias 0), so the crossJoin can
    # never wipe the result on an untrained/empty weight table
    bias = weights.agg(
        F.coalesce(
            F.sum(F.when(F.col("bucket") == BIAS_BUCKET, F.col("w"))),
            F.lit(0.0),
        ).alias("_b")
    )
    base = df.select(F.col(id_col).alias("doc_id"))
    return (
        base.join(m, "doc_id", "left")
        .crossJoin(F.broadcast(bias))
        .select(
            "doc_id",
            (
                1.0 / (1.0 + F.exp(-F.coalesce(F.col("m"), F.col("_b"))))
            ).alias("score"),
        )
    )
