"""Train/eval decontamination: word n-gram overlap between two corpora.

The standard LLM-pipeline contamination check (GPT-3 appendix C / PaLM-style
13-gram overlap): an eval document is contaminated when too many of its word
n-grams also appear anywhere in the training corpus.

Scale shape (100 TB corpus, small-ish probe set):
- The corpus side is reduced to a DISTINCT n-gram inverted index — one
  hash aggregation; duplicated grams collapse before the join.
- The join key is by default the ``xxhash64`` of the gram, not the gram
  string, so the shuffle carries 8 bytes per gram instead of ~50
  (``hash_grams=False`` keeps raw strings for oracle-checkable runs).
- The probe side joins left; per-probe stats are one more hash aggregation
  keyed by the probe id. No windows, no Python, no driver-side state.
- Skew: a stop-gram ("of the same ...") appears in nearly every corpus
  document, but the DISTINCT index stores it once, so there is no hot key
  on the build side; AQE handles residual probe-side skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _norm_tokens(text: Column) -> Column:
    """Lowercase, collapse non-alnum runs to single spaces, split — the
    same normalization the dedup fingerprint uses, reproducible in any SQL
    engine (lower + regexp_replace + split on one space)."""
    return F.split(
        F.trim(F.regexp_replace(F.lower(text), "[^a-z0-9]+", " ")), " "
    )


def word_ngrams(text: Column, n: int) -> Column:
    """Array of space-joined word n-grams; empty when the document has
    fewer than ``n`` tokens."""
    toks = _norm_tokens(text)
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - n + 1),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def ngram_index(
    df: DataFrame,
    *,
    text_col: str = "text",
    n: int = 5,
    hash_grams: bool = True,
) -> DataFrame:
    """DISTINCT n-gram inverted index of a corpus — the build side of the
    contamination join. One explode + one hash-distinct."""
    grams = df.select(
        F.explode(word_ngrams(F.col(text_col), n)).alias("gram")
    )
    if hash_grams:
        grams = grams.select(F.xxhash64("gram").alias("gram"))
    return grams.distinct()


def ngram_contamination(
    corpus: DataFrame,
    probes: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    threshold: float = 0.1,
    hash_grams: bool = True,
) -> DataFrame:
    """Per-probe-document contamination stats against ``corpus``.

    Returns ``(id_col, n_grams, n_hit, contamination, contaminated)`` where
    ``contamination = distinct probe grams found in corpus / distinct probe
    grams`` and ``contaminated = contamination > threshold``. Documents with
    fewer than ``n`` tokens report 0 grams and are never contaminated.
    """
    index = ngram_index(corpus, text_col=text_col, n=n, hash_grams=hash_grams)
    pg = probes.select(
        F.col(id_col),
        F.explode_outer(word_ngrams(F.col(text_col), n)).alias("_g"),
    )
    key = F.xxhash64("_g") if hash_grams else F.col("_g")
    pg = pg.withColumn("gram", F.when(F.col("_g").isNotNull(), key))
    hit = pg.join(
        index.withColumn("_in_corpus", F.lit(True)), "gram", "left"
    )
    stats = hit.groupBy(id_col).agg(
        F.count_distinct(F.col("gram")).alias("n_grams"),
        F.count_distinct(
            F.when(F.col("_in_corpus"), F.col("gram"))
        ).alias("n_hit"),
    )
    contamination = F.when(
        F.col("n_grams") > 0, F.col("n_hit") / F.col("n_grams")
    ).otherwise(F.lit(0.0))
    return stats.select(
        id_col,
        "n_grams",
        "n_hit",
        F.round(contamination, 6).alias("contamination"),
        (contamination > threshold).alias("contaminated"),
    )


def embedding_contamination(
    corpus: DataFrame,
    probes: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.8,
    exclude_self: bool = False,
) -> DataFrame:
    """Embedding-space decontamination — the semantic twin of
    :func:`ngram_contamination`: flags corpus vectors whose cosine
    against ANY probe (eval-set) vector reaches ``threshold``, catching
    paraphrased eval leakage that exact n-gram overlap misses. Returns
    ``(id, eval_id, sim)`` — the best-matching probe per contaminated
    corpus vector (ties on the 6-dp-rounded similarity break on probe
    id, so the output is engine-portable and oracle-checkable).

    ``exclude_self`` suppresses corpus/probe pairs with EQUAL ids. It
    defaults to False because probes are normally an independent eval
    set whose id space is unrelated to the corpus — there, an id
    collision is a coincidence and dropping the pair would silently
    hide a genuine contamination hit. Set it to True only when the
    probes are drawn FROM the corpus and share its id space (as
    q_embedding_decontaminate does), where the self-pair is a
    tautological sim=1.0 match.

    Scale shape: the probe side is an EVAL SET — small by definition —
    and broadcasts; the corpus is never shuffled (one narrow pass +
    a per-vector window over its above-threshold hits only). For probe
    sets too large to broadcast, go through the LSH/IVF candidate
    paths in pipeline/similarity.py instead."""
    from pyspark.sql import Window

    from hbase_1_3_0_spark.pipeline.similarity import cosine

    p = probes.select(
        F.col(id_col).alias("_pid"), F.col(vec_col).alias("_pv")
    )
    c = corpus.select(F.col(id_col), F.col(vec_col).alias("_cv"))
    scored = c.crossJoin(F.broadcast(p))
    if exclude_self:
        scored = scored.where(F.col(id_col) != F.col("_pid"))
    scored = (
        scored
        .select(
            F.col(id_col),
            F.col("_pid"),
            F.round(cosine(F.col("_cv"), F.col("_pv")), 6).alias("sim"),
        )
        .where(F.col("sim") >= F.lit(float(threshold)))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("sim"), F.asc("_pid"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(F.col(id_col), F.col("_pid").alias("eval_id"), "sim")
    )
