"""Corpus language-model scoring: the perplexity-filter quality signal.

CCNet-style curation scores each document against a small LM and drops
the high-perplexity tail (boilerplate, gibberish, non-language). Shipping
KenLM is out of scope for a Spark-native engine; this implements the
same *shape* with an in-corpus add-one-smoothed unigram model:

    bits_per_word(doc) = avg over tokens of -log2((c_w + 1) / (N + V))

where c_w is the corpus count of the token (0 for OOV), N the corpus
token total and V the model vocabulary size. High bits-per-word = the
document is unlike the corpus = the perplexity-filter drop candidate.

Scale shape: token counting is one hash aggregation; the model is the
top-``vocab_size`` rows of it (TakeOrderedAndProject, no global sort) —
a bounded, broadcastable table, which is what makes scoring at 100 TB a
broadcast hash join per token instead of a vocabulary-sized shuffle.
The corpus-total pass is a 1-row aggregate attached by broadcast
crossJoin (same pattern as aggregations.py's grand-total). Everything
is JVM Column expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Word tokenizer shared with the oracle: lowercased latin/digit runs
#: (apostrophes kept so contractions stay one token).
TOKEN_PATTERN = "[a-z0-9']+"


def word_tokens(text: Column) -> Column:
    return F.regexp_extract_all(F.lower(text), F.lit(TOKEN_PATTERN), 0)


def unigram_counts(
    df: DataFrame, *, text_col: str = "text", vocab_size: int | None = None
) -> DataFrame:
    """Corpus unigram counts (word, c); ``vocab_size`` keeps the most
    frequent words (ties broken by word) — REQUIRED at scale so the
    model broadcasts."""
    toks = df.select(F.explode(word_tokens(F.col(text_col))).alias("word"))
    return _counts_from_tokens(toks, vocab_size)


def _counts_from_tokens(
    toks: DataFrame, vocab_size: int | None
) -> DataFrame:
    counts = toks.groupBy("word").agg(F.count(F.lit(1)).alias("c"))
    if vocab_size is not None:
        counts = counts.orderBy(F.col("c").desc(), F.col("word")).limit(
            vocab_size
        )
    return counts


def perplexity_proxy(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int | None = None,
) -> DataFrame:
    """Per-document (id, n_words, oov_rate, bits_per_word) under the
    in-corpus add-one unigram LM. ``N`` counts every corpus token
    (including ones outside the capped vocabulary), so capping changes
    only which words score as OOV, not the mass normalization.

    EVERY input document gets a row: zero-token docs (empty /
    non-latin — exactly the perplexity-filter drop candidates) emit
    ``n_words=0`` with NULL oov_rate/bits_per_word instead of vanishing
    at the explode, so a thresholding consumer can't let them bypass
    the filter by absence."""
    toks = df.select(
        F.col(id_col), F.explode(word_tokens(F.col(text_col))).alias("word")
    )
    # derive the model from the SAME tokenized frame — tokenizing the
    # corpus once, not once for scoring and again for counting
    vocab = _counts_from_tokens(toks.select("word"), vocab_size)
    totals = toks.agg(F.count(F.lit(1)).alias("_n")).crossJoin(
        vocab.agg(F.count(F.lit(1)).alias("_v"))
    )
    scored = (
        toks.join(F.broadcast(vocab), "word", "left")
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "_bits",
            -F.log2(
                (F.coalesce(F.col("c"), F.lit(0)) + 1)
                / (F.col("_n") + F.col("_v"))
            ),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_words"),
        F.round(
            F.avg(F.when(F.col("c").isNull(), 1.0).otherwise(0.0)), 6
        ).alias("oov_rate"),
        F.round(F.avg("_bits"), 6).alias("bits_per_word"),
    )
    return _reattach_empty_docs(df, per_doc, id_col)


def _reattach_empty_docs(
    df: DataFrame, per_doc: DataFrame, id_col: str
) -> DataFrame:
    """Left-join per-doc scores back onto the full id set so zero-token
    documents surface as ``n_words=0`` rows (NULL score columns) rather
    than silently missing. One extra join keyed on the doc id — the
    scores frame is already shuffled on that key, so this is cheap."""
    score_cols = [c for c in per_doc.columns if c != id_col]
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .withColumn("n_words", F.coalesce(F.col("n_words"), F.lit(0)))
        .select(id_col, *score_cols)
    )


def bigram_perplexity(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int | None = None,
    lam: float = 0.75,
) -> DataFrame:
    """Interpolated-bigram upgrade of :func:`perplexity_proxy` — one step
    closer to the CCNet KenLM signal:

        p(w_i | w_{i-1}) = lam * p_bi(w_i | w_{i-1}) + (1-lam) * p_uni(w_i)

    with add-one-smoothed unigrams and raw maximum-likelihood bigrams
    over the (capped) vocabulary; a document's first token scores pure
    unigram. Bigrams are counted only where BOTH words are in-vocab
    (standard practice), so the bigram table is bounded by the corpus's
    in-vocab pair diversity — at 100 TB the cap is what keeps the
    (prev, word) join key-space sane; the unigram model still
    broadcasts. Plan shape: one tokenize+posexplode pass, one per-doc
    window (lag) shuffle keyed on the doc, two hash aggs, one shuffle
    join on (prev, word), one per-doc agg."""
    from pyspark.sql.window import Window

    toks = df.select(
        F.col(id_col),
        F.posexplode(word_tokens(F.col(text_col))).alias("pos", "word"),
    )
    vocab = _counts_from_tokens(toks.select("word"), vocab_size)
    totals = toks.agg(F.count(F.lit(1)).alias("_n")).crossJoin(
        vocab.agg(F.count(F.lit(1)).alias("_v"))
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    seq = toks.withColumn("prev", F.lag("word").over(w))
    in_vocab = vocab.select("word")
    pairs = (
        seq.where(F.col("prev").isNotNull())
        .join(in_vocab, "word", "left_semi")
        .join(
            in_vocab.withColumnRenamed("word", "prev"), "prev", "left_semi"
        )
        .groupBy("prev", "word")
        .agg(F.count(F.lit(1)).alias("cb"))
    )
    scored = (
        seq.join(F.broadcast(vocab), "word", "left")
        .join(
            F.broadcast(
                vocab.select(
                    F.col("word").alias("prev"), F.col("c").alias("cv")
                )
            ),
            "prev",
            "left",
        )
        .join(pairs, ["prev", "word"], "left")
        .crossJoin(F.broadcast(totals))
    )
    p_uni = (F.coalesce(F.col("c"), F.lit(0)) + 1) / (
        F.col("_n") + F.col("_v")
    )
    p_bi = F.when(
        F.col("cv").isNotNull() & F.col("cb").isNotNull(),
        F.col("cb") / F.col("cv"),
    ).otherwise(F.lit(0.0))
    p = F.when(F.col("prev").isNull(), p_uni).otherwise(
        F.lit(lam) * p_bi + F.lit(1.0 - lam) * p_uni
    )
    per_doc = scored.withColumn("_bits", -F.log2(p)).groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_words"),
        F.round(F.avg("_bits"), 6).alias("bits_per_word"),
    )
    # zero-token docs get n_words=0 rows (see perplexity_proxy)
    return _reattach_empty_docs(df, per_doc, id_col)


def trigram_perplexity(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int | None = None,
    discount: float = 0.75,
) -> DataFrame:
    """Trigram LM with interpolated Kneser-Ney smoothing — the shape of
    the CCNet perplexity signal (a KenLM n-gram model with modified KN;
    this is textbook single-discount KN, d=0.75 binary-exact).

    Backoff chain (all counts over in-vocab n-gram TYPES, which is what
    bounds every model table by the capped vocabulary's pair/triple
    diversity at 100 TB):

    - continuation unigram  p1(w) = (N1+(.w) + 1) / (|bigram types| + V + 1)
      (add-one floor so OOV tokens keep finite bits)
    - KN bigram   p2(w|v) = max(N1+(.vw) - d, 0)/N1+(.v.)
                           + d * N1+(v.)/N1+(.v.) * p1(w);  p1 if v unseen
    - KN trigram  p3(w|u,v) = max(c(uvw) - d, 0)/c(uv)
                           + d * N1+(uv.)/c(uv) * p2(w|v);  p2 if (u,v) unseen

    Token at position 0 scores p1, position 1 scores p2, the rest p3.

    Plan shape: one tokenize+posexplode pass, one per-doc window (two
    lags, one shuffle keyed on the doc), hash aggs for the type tables
    (trigram types, their (u,v)/(v)/(v,w) rollups, continuation
    unigrams), then scoring joins — per-word tables broadcast; the
    trigram/bigram-keyed joins shuffle on bounded in-vocab key spaces
    exactly like bigram_perplexity's pairs join. Zero-token docs get
    ``n_words=0`` rows."""
    from pyspark.sql.window import Window

    d = float(discount)
    toks = df.select(
        F.col(id_col),
        F.posexplode(word_tokens(F.col(text_col))).alias("pos", "word"),
    )
    vocab = _counts_from_tokens(toks.select("word"), vocab_size)
    in_vocab = vocab.select("word")
    totals = toks.agg(F.count(F.lit(1)).alias("_n")).crossJoin(
        vocab.agg(F.count(F.lit(1)).alias("_v"))
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    seq = toks.withColumn("prev", F.lag("word").over(w)).withColumn(
        "prev2", F.lag("word", 2).over(w)
    )

    # n-gram TYPE tables over in-vocab words only
    big_types = (
        seq.where(F.col("prev").isNotNull())
        .join(in_vocab, "word", "left_semi")
        .join(in_vocab.withColumnRenamed("word", "prev"), "prev", "left_semi")
        .select("prev", "word")
        .distinct()
    )
    tri = (
        seq.where(F.col("prev2").isNotNull())
        .join(in_vocab, "word", "left_semi")
        .join(in_vocab.withColumnRenamed("word", "prev"), "prev", "left_semi")
        .join(
            in_vocab.withColumnRenamed("word", "prev2"), "prev2", "left_semi"
        )
        .groupBy("prev2", "prev", "word")
        .agg(F.count(F.lit(1)).alias("c3"))
    )
    # c(uv) + N1+(uv.) — the trigram denominators, keyed (u,v)
    ctx3 = tri.groupBy("prev2", "prev").agg(
        F.sum("c3").alias("c2"), F.count(F.lit(1)).alias("n1pa2")
    )
    # N1+(.vw) — distinct left-contexts of the bigram, keyed (v,w)
    cont2 = tri.groupBy("prev", "word").agg(
        F.countDistinct("prev2").alias("cont2")
    )
    # N1+(.v.) + N1+(v.) — the bigram-level denominators, keyed (v)
    ctx2 = tri.groupBy("prev").agg(
        F.count(F.lit(1)).alias("ctx2"),
        F.countDistinct("word").alias("n1pa1"),
    )
    # N1+(.w) + |bigram types| — continuation unigrams
    cont1 = big_types.groupBy("word").agg(
        F.countDistinct("prev").alias("cont1")
    )
    btypes = big_types.agg(F.count(F.lit(1)).alias("_bt"))

    scored = (
        seq.join(F.broadcast(cont1), "word", "left")
        .join(F.broadcast(ctx2), "prev", "left")
        .join(cont2, ["prev", "word"], "left")
        .join(ctx3, ["prev2", "prev"], "left")
        .join(tri, ["prev2", "prev", "word"], "left")
        .crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(btypes))
    )
    p1 = (F.coalesce(F.col("cont1"), F.lit(0)) + 1) / (
        F.col("_bt") + F.col("_v") + 1
    )
    p2 = F.when(
        F.col("ctx2").isNotNull(),
        F.greatest(F.coalesce(F.col("cont2"), F.lit(0)) - F.lit(d), F.lit(0.0))
        / F.col("ctx2")
        + F.lit(d) * F.col("n1pa1") / F.col("ctx2") * p1,
    ).otherwise(p1)
    p3 = F.when(
        F.col("c2").isNotNull(),
        F.greatest(F.coalesce(F.col("c3"), F.lit(0)) - F.lit(d), F.lit(0.0))
        / F.col("c2")
        + F.lit(d) * F.col("n1pa2") / F.col("c2") * p2,
    ).otherwise(p2)
    p = (
        F.when(F.col("prev").isNull(), p1)
        .when(F.col("prev2").isNull(), p2)
        .otherwise(p3)
    )
    per_doc = scored.withColumn("_bits", -F.log2(p)).groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_words"),
        F.round(F.avg("_bits"), 6).alias("bits_per_word"),
    )
    return _reattach_empty_docs(df, per_doc, id_col)
