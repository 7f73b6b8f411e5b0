"""N-gram-profile language identification (Cavnar & Trenkle 1994,
"N-Gram-Based Text Categorization" — the public rank-profile method).

Training builds one top-K character-trigram RANK PROFILE per labeled
language; classification ranks each document's own trigrams the same
way and scores every candidate language by the out-of-place distance
(sum over the document's grams of |doc_rank - profile_rank|, with a
max penalty of K for grams absent from the profile); the predicted
language is the argmin. Deterministic end to end: rank ties break on
(count DESC, gram ASC), distance ties on language ASC — so the whole
pipeline is DuckDB-oracle-able, unlike dictionary-marker heuristics.

Scale shape: profiles are tiny (languages x K rows) and BROADCAST both
times they are joined; the document side pays one (doc, gram) hash
aggregation plus one doc-keyed window for its own top-K ranking — the
doc id is the natural partition key, and the per-language fan-out is
bounded by the (small, known) language count. No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _norm(text: Column) -> Column:
    """Lowercase, collapse non-alnum runs to single spaces, trim —
    identical in Spark and DuckDB."""
    return F.trim(
        F.regexp_replace(F.lower(text), "[^a-z0-9]+", " ")
    )


def char_ngrams(text: Column, n: int = 3) -> Column:
    """All character n-grams (with spaces, per the paper); empty for
    strings shorter than n."""
    t = _norm(text)
    return F.when(
        F.length(t) >= n,
        F.transform(
            F.sequence(F.lit(1), F.length(t) - F.lit(n - 1)),
            lambda i: F.substring(t, i, n),
        ),
    ).otherwise(F.array().cast("array<string>"))


def train_profiles(
    df: DataFrame,
    text_col: str = "text",
    label_col: str = "lang",
    *,
    n: int = 3,
    top_k: int = 40,
) -> DataFrame:
    """Per-language top-``top_k`` trigram rank profile:
    ``(lang, gram, rank)`` with rank 1 = most frequent."""
    counts = (
        df.select(
            F.col(label_col).alias("lang"),
            F.explode(char_ngrams(F.col(text_col), n)).alias("gram"),
        )
        .groupBy("lang", "gram")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("_c"), F.asc("gram"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select("lang", "gram", "rank")
    )


def classify(
    df: DataFrame,
    profiles: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    n: int = 3,
    top_k: int = 40,
) -> DataFrame:
    """Predict a language per document: ``(id, predicted, dist)`` where
    ``dist`` is the winning out-of-place distance. ``top_k`` must match
    the value the profiles were trained with (it is also the
    missing-gram penalty).

    EVERY input document gets exactly one output row: a doc whose
    normalized text is shorter than ``n`` (zero n-grams) cannot be
    scored and comes back as ``predicted='und'`` with a null ``dist``
    (ISO 639-2's undetermined code) rather than silently vanishing —
    downstream joins must never lose documents."""
    doc_counts = (
        df.select(
            F.col(id_col),
            F.explode(char_ngrams(F.col(text_col), n)).alias("gram"),
        )
        .groupBy(id_col, "gram")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("_c"), F.asc("gram"))
    doc_grams = (
        doc_counts.withColumn("_dr", F.row_number().over(w))
        .where(F.col("_dr") <= top_k)
        .select(id_col, "gram", "_dr")
    )
    langs = profiles.select("lang").distinct()
    scored = (
        doc_grams.crossJoin(F.broadcast(langs))
        .join(
            F.broadcast(
                profiles.select(
                    "lang", "gram", F.col("rank").alias("_pr")
                )
            ),
            ["lang", "gram"],
            "left",
        )
        .groupBy(id_col, "lang")
        .agg(
            F.sum(
                F.when(F.col("_pr").isNull(), F.lit(top_k)).otherwise(
                    F.abs(F.col("_dr") - F.col("_pr"))
                )
            ).alias("dist")
        )
    )
    best = Window.partitionBy(id_col).orderBy(
        F.asc("dist"), F.asc("lang")
    )
    winners = (
        scored.withColumn("_rn", F.row_number().over(best))
        .where(F.col("_rn") == 1)
        .select(
            F.col(id_col),
            F.col("lang").alias("predicted"),
            F.col("dist").cast("long").alias("dist"),
        )
    )
    # gram-less docs (normalized text shorter than n — exactly the
    # docs char_ngrams returns nothing for) never reach the scorer.
    # "Gram-less" is a ROW-LOCAL predicate, so the 'und' completion is
    # a union of a second filtered projection of df — NOT a join back
    # onto the ids (a corpus x corpus outer join would sort-merge at
    # scale). coalesce(.., 0) keeps NULL-text docs in the und branch.
    und = df.where(
        F.coalesce(F.length(_norm(F.col(text_col))), F.lit(0)) < n
    ).select(
        F.col(id_col),
        F.lit("und").alias("predicted"),
        F.lit(None).cast("long").alias("dist"),
    )
    return winners.unionByName(und)
