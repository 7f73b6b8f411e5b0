"""Exact repeated-substring dedup — the Lee et al. 2022 span-level pass
("Deduplicating Training Data Makes Language Models Better"): training
corpora contain long VERBATIM spans repeated across otherwise-distinct
documents (licenses, boilerplate, templated passages); document-level
dedup never sees them, and models memorize them. The reference method
builds a single-node suffix array; the Spark-native equivalent here is
rolling window digests:

1. every k-char window of every doc hashes to an 8-byte-ish digest
   (md5 prefix) — one posexplode pass, digests not text on the wire;
2. a window whose digest occurs >= min_count times corpus-wide is a
   repeated window; the globally FIRST occurrence (min (doc_id, pos))
   of each digest is the retained copy (the all-but-one-copy policy);
3. per doc, its non-winner repeated windows merge into maximal
   intervals (classic SQL gaps-and-islands: running-max of span ends);
   a repeated span of length L >= k yields L-k+1 repeated windows, so
   stride-1 merging recovers the full span exactly;
4. the doc's clean text is the concatenation of the complement
   segments (kept intervals -> substrings -> ordered join).

Scale shape: the window table is ~1 row per text byte — the same cost
class as the MinHash shingle explode, shuffled once on the digest (a
32-hex key, never text). At 100 TB run the standard two-phase variant:
a first pass keeps only digests with corpus DF >= min_count (hash-agg +
broadcast-able hot set) so the second pass explodes windows only for
docs that hit the hot set. Everything is JVM Column expressions; the
text surgery is an ordered array_join, no Python on the data path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def window_digests(
    df: DataFrame,
    *,
    k: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per (doc, pos, digest) for every k-char window (1-based
    pos, stride 1). Docs shorter than k emit nothing — they cannot
    contain a length-k repeated span."""
    t = F.col(text_col)
    # the length guard matters: sequence(1, 0) DESCENDS in Spark, so an
    # unguarded short doc would emit phantom pos-0/pos-1 windows whose
    # identical digests self-collide into a fake repeated span
    digests = F.when(
        F.length(t) >= k,
        F.transform(
            F.sequence(F.lit(1), F.length(t) - k + 1),
            lambda i: F.md5(F.substring(t, i, k)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        df.select(
            F.col(id_col).alias("_id"),
            F.posexplode(digests).alias("_p0", "digest"),
        )
        .select("_id", (F.col("_p0") + 1).alias("pos"), "digest")
    )


def repeated_spans(
    df: DataFrame,
    *,
    k: int = 50,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Maximal repeated intervals per doc, EXCLUDING each repeated
    window's globally-first occurrence: (doc_id, start, end) with
    1-based inclusive-exclusive [start, end) character bounds."""
    win = window_digests(df, k=k, text_col=text_col, id_col=id_col)
    # winner per digest = min (doc, pos); count filters the hot set
    grouped = win.groupBy("digest").agg(
        F.count(F.lit(1)).alias("_n"),
        F.min(F.struct(F.col("_id"), F.col("pos"))).alias("_first"),
    )
    hot = grouped.where(F.col("_n") >= min_count)
    cut = (
        win.join(hot, "digest")
        .where(
            ~(
                (F.col("_id") == F.col("_first._id"))
                & (F.col("pos") == F.col("_first.pos"))
            )
        )
        .select(
            "_id",
            F.col("pos").alias("_s"),
            (F.col("pos") + k).alias("_e"),
        )
    )
    # gaps-and-islands interval merge: a window starting at or before
    # the running max end extends the current island
    w = Window.partitionBy("_id").orderBy("_s")
    prev_max = F.max("_e").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = cut.withColumn(
        "_grp",
        F.sum(
            F.when(
                prev_max.isNull() | (F.col("_s") > prev_max), 1
            ).otherwise(0)
        ).over(w),
    )
    return (
        islands.groupBy("_id", "_grp")
        .agg(F.min("_s").alias("start"), F.max("_e").alias("end"))
        .select(F.col("_id").alias(id_col), "start", "end")
    )


def remove_repeated_spans(
    df: DataFrame,
    *,
    k: int = 50,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The surgery: every doc keeps its text minus its repeated spans
    (first occurrences corpus-wide are retained). Output:
    (id, clean_text, n_cut_chars) — every input doc gets a row. The
    rebuild is JVM-side: kept segments as ordered (start, substring)
    structs, array_sort + array_join."""
    spans = repeated_spans(
        df, k=k, min_count=min_count, text_col=text_col, id_col=id_col
    )
    t = F.col(text_col)
    # complement segments: [prev_end, next_start) around sorted spans
    w = Window.partitionBy(id_col).orderBy("start")
    seg = (
        df.select(id_col, text_col)
        .join(spans, id_col)
        .withColumn("_prev_end", F.lag("end").over(w))
        .withColumn("_kept_from", F.coalesce(F.col("_prev_end"), F.lit(1)))
    )
    kept_mid = seg.select(
        id_col,
        F.struct(
            F.col("_kept_from").alias("s"),
            F.substring(
                t, F.col("_kept_from"), F.col("start") - F.col("_kept_from")
            ).alias("seg"),
        ).alias("_seg"),
        (F.col("end") - F.col("start")).alias("_cut"),
    )
    tails = (
        df.select(id_col, text_col)
        .join(spans, id_col)
        .groupBy(id_col)
        .agg(F.max("end").alias("_last_end"))
        .join(df.select(id_col, text_col), id_col)
        .select(
            id_col,
            F.struct(
                F.col("_last_end").alias("s"),
                F.substring(t, F.col("_last_end"), F.lit(1 << 28)).alias(
                    "seg"
                ),
            ).alias("_seg"),
            F.lit(0).alias("_cut"),
        )
    )
    rebuilt = (
        kept_mid.unionByName(tails)
        .groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("_seg")), lambda x: x["seg"]
                ),
                "",
            ).alias("clean_text"),
            F.sum("_cut").alias("n_cut_chars"),
        )
    )
    return (
        df.select(id_col, t.alias("_orig"))
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("clean_text"), F.col("_orig")).alias(
                "clean_text"
            ),
            F.coalesce(F.col("n_cut_chars"), F.lit(0)).cast("long").alias(
                "n_cut_chars"
            ),
        )
    )
