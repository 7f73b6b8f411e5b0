"""Byte-pair-encoding tokenizer training — Spark-first (Sennrich,
Haddow & Birch 2016, ACL; the public BPE-for-NMT algorithm).

The 100 TB shape mirrors how every real BPE trainer works: merges are
learned from the WORD-FREQUENCY table, not the raw corpus, so the
corpus is scanned exactly ONCE (one explode + one map-side-combinable
hash aggregation -> ``(word, cnt)``, vocab-bounded). Every merge
iteration then runs on that small table: one pair-count aggregation,
one 1-row argmax ``collect`` (the only driver state: the winning pair),
and one narrow array-fold rewrite of the symbol arrays. Iterations
``localCheckpoint`` the word table — without it, iteration *i* would
re-derive merges 1..i-1 inside its own job (the multi-consumer-lineage
lesson from the LM token tables), turning O(N) work into O(N^2).

No Python UDFs anywhere: symbol rewrites are ``F.aggregate`` folds and
pair extraction is ``F.transform`` over index sequences, all inside
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WORD_RE = "[a-z0-9]+"
EOW = "</w>"  # end-of-word marker, per the paper


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """``(word, cnt)`` — the only corpus-width pass in BPE training."""
    return (
        df.select(
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col(text_col)), F.lit(WORD_RE), 0
                )
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _initial_symbols(word: Column) -> Column:
    """chars + the end-of-word marker, e.g. 'low' -> [l, o, w, </w>]."""
    return F.concat(
        F.transform(
            F.sequence(F.lit(1), F.length(word)),
            lambda i: F.substring(word, i, 1),
        ),
        F.array(F.lit(EOW)),
    )


def _adjacent_pairs(syms: Column) -> Column:
    """All adjacent symbol pairs (overlapping, per the paper's counting
    convention); empty for arrays shorter than 2."""
    return F.when(
        F.size(syms) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(syms) - 1),
            lambda i: F.struct(
                F.element_at(syms, i).alias("a"),
                F.element_at(syms, i + 1).alias("b"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))


def _apply_merge(syms: Column, left: str, right: str) -> Column:
    """Left-to-right non-overlapping replacement of the adjacent pair
    (left, right) with the concatenated symbol — one ``F.aggregate``
    fold: append each symbol, or fuse it into the previous one when the
    pair matches. Because the fused symbol differs from ``left``
    (``right`` is non-empty), a fused position can't re-trigger, which
    is exactly the left-to-right scan semantics ('aaa' under (a,a) ->
    [aa, a])."""
    merged = left + right
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    *,
    num_merges: int = 20,
    min_count: int = 2,
    words: DataFrame | None = None,
) -> DataFrame:
    """Learn ``num_merges`` BPE merges from the corpus. Returns the
    merge table ``(rank, left, right, pair_count)`` in learned order —
    deterministic: the argmax tie-breaks on (count DESC, left ASC,
    right ASC). Stops early when the best remaining pair occurs fewer
    than ``min_count`` times.

    Driver state is one (left, right, count) row per iteration; the
    distributed word table is rewritten per merge and eagerly
    localCheckpoint'd (see module docstring for why). ``words`` accepts
    a precomputed :func:`word_counts` table so composed callers (e.g.
    :func:`bpe_vocab`) pay the corpus scan exactly once."""
    from hbase_1_3_0_spark.plans.checkpoints import (
        releasable_local_checkpoint,
    )

    spark = df.sparkSession
    wc = (words if words is not None else word_counts(df, text_col)).where(
        F.length("word") > 0
    )
    ckpt = releasable_local_checkpoint(
        wc.select(_initial_symbols(F.col("word")).alias("syms"), "cnt")
    )
    words = ckpt.df
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(num_merges):
        best = (
            words.select(F.explode(_adjacent_pairs(F.col("syms"))).alias("p"),
                         "cnt")
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.desc("c"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not best or best[0].c < min_count:
            break
        left, right, cnt = best[0].a, best[0].b, int(best[0].c)
        merges.append((rank, left, right, cnt))
        prev = ckpt
        ckpt = releasable_local_checkpoint(
            words.select(
                _apply_merge(F.col("syms"), left, right).alias("syms"),
                "cnt",
            )
        )
        words = ckpt.df
        # the new checkpoint has materialized; the superseded one is
        # dead — free its blocks instead of accreting num_merges copies
        # of the word table in block-manager storage (plain
        # DataFrame.unpersist is a no-op for local checkpoints)
        prev.release()
    ckpt.release()
    return spark.createDataFrame(
        merges, "rank int, left string, right string, pair_count long"
    )


def bpe_segment(
    words: DataFrame,
    merges: list[tuple[str, str]],
    word_col: str = "word",
    *,
    checkpoint_every: int = 8,
) -> DataFrame:
    """Segment each (distinct) word under a learned merge list, applied
    in rank order. Adds a ``tokens array<string>`` column. Encoding
    runs on the VOCABULARY, never the corpus — join the result back to
    corpus rows by word. Merge applications chain as nested fold
    expressions; every ``checkpoint_every`` merges the table is
    localCheckpoint'd to keep codegen'd expression depth bounded."""
    out = words.withColumn("tokens", _initial_symbols(F.col(word_col)))
    for i, (left, right) in enumerate(merges):
        out = out.withColumn(
            "tokens", _apply_merge(F.col("tokens"), left, right)
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < len(merges):
            out = out.localCheckpoint()
    return out


def bpe_vocab(
    df: DataFrame,
    text_col: str = "text",
    *,
    num_merges: int = 20,
    min_count: int = 2,
) -> DataFrame:
    """Composed train + segment: the corpus's subword vocabulary under
    freshly learned merges — ``(token, n_words, total)`` where
    ``n_words`` counts distinct words containing the token and
    ``total`` is the corpus-weighted occurrence count (a token
    appearing twice in one word counts twice per word instance).

    The word-count table is materialized ONCE (localCheckpoint) and
    shared by training and segmentation — one corpus scan total."""
    wc = (
        word_counts(df, text_col)
        .where(F.length("word") > 0)
        .localCheckpoint()
    )
    merges = [
        (r.left, r.right)
        for r in bpe_train(
            df, text_col, num_merges=num_merges, min_count=min_count,
            words=wc,
        ).orderBy("rank").collect()
    ]
    seg = bpe_segment(wc, merges)
    return (
        seg.select("word", F.explode("tokens").alias("token"), "cnt")
        .groupBy("token")
        .agg(
            F.count_distinct("word").alias("n_words"),
            F.sum("cnt").alias("total"),
        )
    )
