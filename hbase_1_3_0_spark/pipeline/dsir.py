"""DSIR: Data Selection with Importance Resampling (Xie et al. 2023).

Selects raw-corpus documents that look like a target corpus by
importance weighting in a hashed n-gram feature space:

1. Featurize every document as a bag of hashed n-grams — unigrams and
   bigrams hashed into ``buckets`` slots (the paper's hashed n-gram
   features, 10k buckets).
2. Fit two bag-of-buckets unigram models — p from the TARGET sample,
   q from the RAW corpus — with add-lambda smoothing over the bucket
   space.
3. Per raw document, log importance weight
   log w = sum_b count_b * (log p_b - log q_b).
4. Gumbel top-k resampling: keep the k docs with the largest
   log w + g, g standard Gumbel noise — sampling WITHOUT replacement
   proportional to w (the Gumbel-top-k trick the paper uses).

Scale shape (the whole point of DSIR — it's the cheap alternative to
training a classifier over 100 TB):
- Featurization is one explode + one (doc, bucket) map-side-combined
  count agg; the raw corpus is scanned ONCE for both q and the
  per-doc weights.
- The models are ``buckets`` rows each (10k) — broadcast joins, the
  corpus never shuffles on anything but (doc_id, bucket).
- Gumbel noise is salted-md5 (sampling.hash_bucket convention), NOT
  rand(): task retries resample identically, and a SQL oracle can
  replay the draw bit-for-bit.

Reference corpus parity: the reference engine has no data-selection
surface; this lives in the training-pipeline tier of SURVEY.md §2
next to quality scoring and temperature mixing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hbase_1_3_0_spark.pipeline.lm import word_tokens

__all__ = [
    "hashed_ngram_counts",
    "bucket_model",
    "dsir_log_weights",
    "dsir_resample",
]


def _bucket(gram: Column, buckets: int) -> Column:
    """Hash a gram into [0, buckets) — md5-prefix so DuckDB replays it."""
    return F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast("long") % buckets


def hashed_ngram_counts(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 4096,
) -> DataFrame:
    """(doc_id, bucket, cnt): hashed unigram+bigram counts per doc.

    One projection builds both gram arrays (bigrams via zip_with over
    the token array and its tail — no second tokenize pass), one
    explode, one count agg. Nothing leaves the JVM.
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"), word_tokens(F.col(text_col)).alias("_w")
    )
    bigrams = F.when(
        F.size("_w") >= 2,
        F.zip_with(
            F.slice("_w", 1, F.size("_w") - 1),
            F.slice("_w", 2, F.size("_w") - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = toks.select(
        "doc_id", F.explode(F.concat(F.col("_w"), bigrams)).alias("gram")
    )
    return grams.groupBy(
        "doc_id", _bucket(F.col("gram"), buckets).alias("bucket")
    ).agg(F.count(F.lit(1)).alias("cnt"))


def bucket_model(
    feature_counts: DataFrame, *, buckets: int = 4096, alpha: float = 1.0
) -> DataFrame:
    """(bucket, logp, total): add-alpha-smoothed bucket log-probs.

    Only OCCUPIED buckets get a row (the model broadcasts at <=
    ``buckets`` rows); absent buckets carry the implied smoothing floor
    log(alpha / (total + alpha*buckets)). ``total`` — the corpus gram
    count the denominator needs — rides along as a constant column so
    consumers can rebuild the floor exactly without re-aggregating the
    corpus.
    """
    per_bucket = feature_counts.groupBy("bucket").agg(F.sum("cnt").alias("c"))
    total = per_bucket.agg(F.sum("c").alias("total"))
    return per_bucket.crossJoin(F.broadcast(total)).select(
        "bucket",
        F.log((F.col("c") + alpha) / (F.col("total") + alpha * buckets)).alias(
            "logp"
        ),
        "total",
    )


def dsir_log_weights(
    raw_features: DataFrame,
    target_model: DataFrame,
    raw_model: DataFrame,
    *,
    buckets: int = 4096,
    alpha: float = 1.0,
) -> DataFrame:
    """(doc_id, log_w): per-raw-doc importance log-weights.

    ``*_model`` are :func:`bucket_model` outputs. A bucket a model
    never saw contributes the smoothing floor
    log(alpha / (total + alpha*buckets)), rebuilt exactly from the
    model's ``total`` column (one 1-row broadcast per model). The raw
    corpus features shuffle once (they were already keyed by doc in
    :func:`hashed_ngram_counts`); both model joins broadcast.
    """
    t = target_model.select(F.col("bucket"), F.col("logp").alias("_lp_t"))
    q = raw_model.select(F.col("bucket"), F.col("logp").alias("_lp_q"))

    def _floor(model: DataFrame, alias: str) -> DataFrame:
        return model.select("total").limit(1).select(
            F.log(F.lit(alpha) / (F.col("total") + alpha * buckets)).alias(alias)
        )

    joined = (
        raw_features.join(F.broadcast(t), "bucket", "left")
        .join(F.broadcast(q), "bucket", "left")
        .crossJoin(F.broadcast(_floor(target_model, "_fl_t")))
        .crossJoin(F.broadcast(_floor(raw_model, "_fl_q")))
    )
    floor_t = F.col("_fl_t")
    floor_q = F.col("_fl_q")
    return joined.groupBy("doc_id").agg(
        F.sum(
            F.col("cnt")
            * (
                F.coalesce(F.col("_lp_t"), floor_t)
                - F.coalesce(F.col("_lp_q"), floor_q)
            )
        ).alias("log_w")
    )


def dsir_resample(
    log_weights: DataFrame, k: int, *, seed: str = "dsir1"
) -> DataFrame:
    """Gumbel top-k: (doc_id, log_w, score) of the k selected docs.

    score = log_w + Gumbel(0,1) with the Gumbel drawn from the doc's
    salted md5 — u = (h32 + 0.5) / 2^32, strictly inside (0, 1) so
    neither log blows up; g = -ln(-ln u). Deterministic across retries
    and engines (h32+0.5 and the 2^-32 scale are both exact in
    float64). Top-k is a single ORDER BY ... LIMIT k — Spark plans
    TakeOrderedAndProject (per-partition top-k + a k-row driver
    merge), no global sort.
    """
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(seed), F.col("doc_id").cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    u = (h + 0.5) / F.lit(float(2**32))
    g = -F.log(-F.log(u))
    return (
        log_weights.select("doc_id", "log_w", (F.col("log_w") + g).alias("score"))
        .orderBy(F.desc("score"), "doc_id")
        .limit(k)
    )
