"""Text analysis for training-data pipelines — all JVM-side Column exprs.

Language-ID (stopword-marker heuristic), quality scoring (length / punct /
stopword ratios), token counting (word regex), and document fingerprinting
(md5 over alnum-normalized text — portable across engines, so dedup decisions
are oracle-checkable). No Python UDFs anywhere: at 100 TB these run inside
whole-stage codegen straight over the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from hbase_1_3_0_spark.pipeline.parallelism import fan_out_small_scan

WORD_RE = "[A-Za-z0-9]+"

# tiny high-frequency marker sets per language (public stopword lists)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "that", "with"],
    "de": ["der", "die", "und", "das", "nicht", "ist", "ein"],
    "fr": ["le", "la", "les", "et", "est", "une", "que"],
    "es": ["el", "los", "las", "es", "una", "que", "por"],
}

STOPWORDS_EN = LANG_MARKERS["en"] + ["a", "in", "it", "for", "on", "as", "are"]


def token_count(text: Column) -> Column:
    """Whitespace/punctuation-agnostic word-token count (BPE-ish regex)."""
    return F.size(F.regexp_extract_all(text, F.lit(WORD_RE), 0))


def char_count(text: Column) -> Column:
    return F.length(text)


def punct_ratio(text: Column) -> Column:
    """Fraction of non-space characters that are not alphanumeric."""
    nonspace = F.length(F.regexp_replace(text, r"\s", ""))
    alnum = F.length(F.regexp_replace(text, "[^A-Za-z0-9]", ""))
    return F.when(nonspace > 0, (nonspace - alnum) / nonspace).otherwise(F.lit(0.0))


def _marker_hits(text_lower: Column, words: list[str]) -> Column:
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(text_lower, F.lit(pat), 0))


def stopword_ratio(text: Column) -> Column:
    toks = token_count(text)
    hits = _marker_hits(F.lower(text), STOPWORDS_EN)
    return F.when(toks > 0, hits / toks).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """[0,1] heuristic: length in a sane band, low punctuation noise,
    reasonable stopword density (the classic Gopher-style cheap filters)."""
    toks = token_count(text)
    len_ok = F.when((toks >= 10) & (toks <= 100000), F.lit(1.0)).otherwise(F.lit(0.0))
    punct_ok = F.when(punct_ratio(text) < 0.3, F.lit(1.0)).otherwise(F.lit(0.0))
    stop_ok = F.when(stopword_ratio(text) > 0.05, F.lit(1.0)).otherwise(F.lit(0.0))
    return (len_ok + punct_ok + stop_ok) / 3.0


def lang_id(text: Column) -> Column:
    """Stopword-marker argmax across the marker sets; 'und' (undetermined)
    when nothing matches."""
    lowered = F.lower(text)
    scores = [(lang, _marker_hits(lowered, ws)) for lang, ws in LANG_MARKERS.items()]
    best = F.greatest(*[s for _, s in scores])
    out = F.lit("und")
    # reverse order => earlier languages win ties (deterministic)
    for lang, s in reversed(scores):
        out = F.when((best > 0) & (s == best), F.lit(lang)).otherwise(out)
    return out


def fingerprint(text: Column) -> Column:
    """Content fingerprint: md5 of the lowercased alnum-only text. Stable
    across engines (DuckDB md5 produces identical digests), so fingerprint
    dedup is oracle-checkable."""
    return F.md5(F.regexp_replace(F.lower(text), "[^a-z0-9]", ""))


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    k: int = 8,
    w: int = 4,
    robust: bool = False,
) -> DataFrame:
    """Winnowed LOCAL fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    algorithm): hash every character ``k``-gram of the alnum-normalized
    text, slide a window of ``w`` consecutive gram hashes, and select
    each window's minimum hash (ties -> the RIGHTMOST minimum, per the
    paper); the distinct selected (position, hash) pairs are the
    document's fingerprints.

    ``robust=True`` applies the paper's ROBUST winnowing rule (§4 /
    Fig. 6): on a tie for the window minimum, re-select the PREVIOUS
    window's selection when it is one of the minima (no new
    fingerprint), else take the rightmost minimum. On low-entropy /
    repetitive text (where equal gram hashes abound) this records far
    fewer fingerprints for the same match guarantee; on tie-free text
    it selects exactly the standard positions. The sequential
    left-to-right dependence is per-document state, expressed as ONE
    ``aggregate`` fold over the window sequence — still a zero-shuffle
    pure-array projection, O(len * w) per doc. Unlike the whole-doc :func:`fingerprint`,
    these survive insertions, deletions, and reordering — any shared
    substring of length >= k + w - 1 is guaranteed to contribute at
    least one shared fingerprint, which is what makes them the overlap/
    plagiarism-detection primitive.

    Gram hashes are the first 8 hex chars of md5 (portable: DuckDB
    computes the identical string, and hex-string MIN equals numeric
    MIN), so selection decisions are oracle-checkable. Output:
    one row per fingerprint — (id, pos, fp) with ``pos`` the 1-based
    gram position in the normalized text. Docs whose normalized text is
    shorter than ``k`` emit no rows; docs with fewer than ``w`` grams
    winnow over the single short window.

    Scale shape: entirely per-row array expressions (transform/slice/
    array_min over a sequence) plus one posexplode — ZERO shuffles, no
    UDFs, O(len * w) JVM work per doc inside whole-stage codegen. The
    density guarantee bounds output at ~2/(w+1) fingerprints per
    character — so PICK w FOR THE CORPUS SCALE: the (k=8, w=4) defaults
    are the paper's plagiarism-detection shape (~0.4 fp/char — the fp
    table is a multiple of corpus bytes, fine for targeted overlap
    checks); for whole-corpus fingerprinting use the dedup-literature
    shape (e.g. k=25, w=40: guarantee length k+w-1=64, density < 5%,
    fp table a small fraction of corpus bytes)."""
    if k < 1 or w < 1:
        raise ValueError(f"k and w must be >= 1, got k={k} w={w}")
    norm = F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]", "")
    m = F.length(norm) - F.lit(k - 1)  # number of k-grams
    # MATERIALIZE the gram-hash array before windowing: referenced
    # inline, Catalyst re-evaluates the whole transform (m md5 calls)
    # for every slice() of every window — O(m^2) digests per doc
    # (measured ~90s for 50 docs); as a stored column each slice is an
    # O(w) array copy and the md5 pass runs once, O(m*w) total.
    # fan_out: the winnow fold is the heaviest per-row projection in the
    # pipeline (O(len*w) array work per doc, no shuffle until the tiny
    # fingerprint explode), so an under-partitioned corpus serializes it
    # (r14 measured: 17.7s single-task -> 1.6s fanned out, sf0.1)
    grams = fan_out_small_scan(df).where(m >= 1).select(
        F.col(id_col),
        F.transform(
            F.sequence(F.lit(1), m),
            lambda i: F.substring(F.md5(F.substring(norm, i, k)), 1, 8),
        ).alias("_hs"),
    )
    # windows j = 1 .. max(m - w + 1, 1); a short doc (m < w) winnows
    # its single truncated window
    hs = F.col("_hs")
    wlen = F.least(F.lit(w), F.size(hs))
    windows = F.sequence(
        F.lit(1), F.greatest(F.size(hs) - F.lit(w - 1), F.lit(1))
    )

    def _rightmost_min(j):
        # rightmost index of the min within the window slice:
        # wlen + 1 - (first index of min in the REVERSED slice)
        return (
            j
            + wlen
            - F.array_position(
                F.reverse(F.slice(hs, j, wlen)),
                F.array_min(F.slice(hs, j, wlen)),
            )
        )

    if robust:
        # fold over windows carrying (recorded fps, previous selection):
        # keep the previous selection whenever it still sits in the
        # window holding the minimal value
        def _step(acc, j):
            v = F.array_min(F.slice(hs, j, wlen))
            prev = acc["prev"]
            # F.get is 0-based and NULL-safe out of bounds (prev=0
            # start state must not trip ANSI element_at)
            prev_holds_min = (
                (prev >= j)
                & (prev <= j + wlen - 1)
                & (F.get(hs, (prev - 1).cast("int")) == v)
            )
            p = _rightmost_min(j)
            return F.when(prev_holds_min, acc).otherwise(
                F.struct(
                    F.concat(
                        acc["sel"],
                        F.array(F.struct(p.alias("pos"), v.alias("fp"))),
                    ).alias("sel"),
                    p.alias("prev"),
                )
            )

        init = F.struct(
            F.array()
            .cast("array<struct<pos:bigint,fp:string>>")
            .alias("sel"),
            F.lit(0).cast("bigint").alias("prev"),
        )
        sel = F.array_distinct(F.aggregate(windows, init, _step)["sel"])
    else:
        sel = F.array_distinct(
            F.transform(
                windows,
                lambda j: F.struct(
                    _rightmost_min(j).alias("pos"),
                    F.array_min(F.slice(hs, j, wlen)).alias("fp"),
                ),
            )
        )
    return (
        grams.select(F.col(id_col), F.explode(sel).alias("_s"))
        .select(F.col(id_col), F.col("_s.pos").alias("pos"),
                F.col("_s.fp").alias("fp"))
    )


def winnow_overlap(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    k: int = 8,
    w: int = 4,
    min_shared: int = 2,
    max_df: int = 50,
    robust: bool = False,
) -> DataFrame:
    """Document pairs sharing >= ``min_shared`` distinct winnowed
    fingerprint hashes — the copied-passage detector :func:`fingerprint`
    (whole-doc) structurally cannot express. ``robust=True`` selects
    fingerprints with the paper's robust tie rule (fewer (pos, fp) rows
    on repetitive text — see :func:`winnow_fingerprints`). Because both
    tie rules always select SOME occurrence of each window's minimum
    hash, the distinct fp VALUE set per document is identical in either
    mode, and pairing runs on distinct values — so ``robust=True``
    changes NOTHING about the output pairs (property-tested); it only
    shrinks the fingerprint table feeding the distinct, a pure perf
    knob for low-entropy corpora. Fingerprints appearing in
    more than ``max_df`` documents are dropped before pairing (the
    standard hot-shingle cap: boilerplate fps pair everything with
    everything; dropping them bounds each fp's pair fan-out at
    max_df^2 instead of corpus^2 — same posture as the MinHash star
    linkage in pipeline/dedup.py).

    One fp-keyed aggregation + one self-join on fp + one pair-keyed
    aggregation; emits (a, b, shared) with a < b. The distinct
    (doc, fp) table is localCheckpoint'd: it has THREE consumers (the
    df-cap aggregation and both sides of the pair self-join), and an
    uncheckpointed multi-consumer explode prefix re-runs the whole
    corpus winnowing pass per branch (plan-audited: 18 exchanges with
    ~3 corpus passes down to one winnow pass checkpointed)."""
    fps = (
        winnow_fingerprints(df, text_col, id_col, k=k, w=w, robust=robust)
        .select(F.col(id_col).alias("_id"), "fp")
        .distinct()
        .localCheckpoint()
    )
    ok = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("_df"))
        .where(F.col("_df") <= max_df)
        .select("fp")
    )
    pruned = fps.join(ok, "fp")
    pairs = (
        pruned.alias("x")
        .join(pruned.alias("y"), "fp")
        .where(F.col("x._id") < F.col("y._id"))
        .groupBy(
            F.col("x._id").alias("a"), F.col("y._id").alias("b")
        )
        .agg(F.count(F.lit(1)).alias("shared"))
        .where(F.col("shared") >= min_shared)
    )
    return pairs


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Repetition-based quality signals (the Gopher repetition filters):
    duplicate-line fraction and most-frequent-word fraction. Boilerplate and
    spam score high on both; real prose scores low.

    dup_line_frac is pure array exprs per row (no shuffle at all);
    top_word_frac is one explode + one hash aggregation keyed on the doc id
    — the same key the corpus is naturally partitioned by, and counts
    combine map-side. Both stay whole-stage-codegen."""
    t = F.col(text_col)
    lines = F.filter(F.split(t, "\n"), lambda x: F.length(F.trim(x)) > 0)
    n_lines = F.size(lines)
    dup_line_frac = F.when(
        n_lines > 0,
        (n_lines - F.size(F.array_distinct(lines))) / n_lines,
    ).otherwise(F.lit(0.0))
    per_doc = df.select(
        F.col(id_col), n_lines.alias("n_lines"),
        F.round(dup_line_frac, 6).alias("dup_line_frac"),
    )
    words = df.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.lower(t), F.lit(WORD_RE), 0)
        ).alias("_w"),
    )
    word_counts = words.groupBy(id_col, "_w").agg(
        F.count(F.lit(1)).alias("_c")
    )
    top = word_counts.groupBy(id_col).agg(
        F.round(F.max("_c") / F.sum("_c"), 6).alias("top_word_frac"),
        F.sum("_c").alias("n_words"),
    )
    return per_doc.join(top, id_col, "left").select(
        id_col,
        "n_lines",
        "dup_line_frac",
        F.coalesce("top_word_frac", F.lit(0.0)).alias("top_word_frac"),
        F.coalesce("n_words", F.lit(0)).alias("n_words"),
    )


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    *,
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 12.0,
    max_punct_ratio: float = 0.3,
    min_stopword_hits: int = 2,
    max_bullet_frac: float = 0.9,
) -> DataFrame:
    """Gopher-style rule-based document filter (Rae et al. 2021 §A.1.1):
    per-rule boolean verdicts plus the combined ``keep`` flag, so a pipeline
    can both drop documents and report WHY each one was dropped.

    Rules: token count in band, mean word length in band, punctuation-noise
    ratio, minimum stopword evidence, and bullet-line fraction (list-heavy
    boilerplate). All pure JVM Column exprs over one scan — no shuffle, no
    Python; at 100 TB this is a single codegen'd projection."""
    t = F.col(text_col)
    toks = token_count(t)
    alnum_chars = F.length(F.regexp_replace(t, "[^A-Za-z0-9]", ""))
    mean_wl = F.when(toks > 0, alnum_chars / toks).otherwise(F.lit(0.0))
    stop_hits = _marker_hits(F.lower(t), STOPWORDS_EN)
    lines = F.filter(F.split(t, "\n"), lambda x: F.length(F.trim(x)) > 0)
    bullet = F.size(
        F.filter(lines, lambda x: F.trim(x).rlike("^[-*•]"))
    )
    bullet_frac = F.when(
        F.size(lines) > 0, bullet / F.size(lines)
    ).otherwise(F.lit(0.0))
    out = df.withColumns(
        {
            "n_tokens": toks.cast("long"),
            "mean_word_len": F.round(mean_wl, 6),
            "rule_len": (toks >= min_tokens) & (toks <= max_tokens),
            "rule_word_len": (mean_wl >= min_mean_word_len)
            & (mean_wl <= max_mean_word_len),
            "rule_punct": punct_ratio(t) < max_punct_ratio,
            "rule_stopwords": stop_hits >= min_stopword_hits,
            "rule_bullets": bullet_frac <= max_bullet_frac,
        }
    )
    return out.withColumn(
        "keep",
        F.col("rule_len")
        & F.col("rule_word_len")
        & F.col("rule_punct")
        & F.col("rule_stopwords")
        & F.col("rule_bullets"),
    )


# PII patterns chosen to behave identically under Java regex (Spark) and
# RE2 (DuckDB oracle): character classes + bounded quantifiers, no
# backreferences or lookaround.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"
PII_IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def pii_redact(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Regex PII scrubbing (emails, NANP-style phone numbers, IPv4
    addresses) with per-kind match counts — the standard pre-training
    redaction pass. Order matters: IPs are counted before phone masking can
    alter digit runs; replacement is innermost-first (email, phone, ip) on
    disjoint pattern families so the passes compose deterministically.

    Pure JVM ``regexp_replace``/``regexp_extract_all`` — codegen'd, no
    Python, no shuffle."""
    t = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(t, F.lit(PII_EMAIL_RE), 0))
    n_phones = F.size(F.regexp_extract_all(t, F.lit(PII_PHONE_RE), 0))
    n_ips = F.size(F.regexp_extract_all(t, F.lit(PII_IP_RE), 0))
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, PII_EMAIL_RE, "<EMAIL>"),
            PII_PHONE_RE,
            "<PHONE>",
        ),
        PII_IP_RE,
        "<IP>",
    )
    return df.withColumns(
        {
            "n_emails": n_emails.cast("long"),
            "n_phones": n_phones.cast("long"),
            "n_ips": n_ips.cast("long"),
            "redacted": redacted,
        }
    )


def vocab_topk(
    df: DataFrame,
    *,
    text_col: str = "text",
    k: int = 100,
) -> DataFrame:
    """Corpus vocabulary: the k most frequent lowercased word tokens with
    deterministic tie-breaks (count desc, word asc) — the tokenizer-
    training / corpus-inspection primitive.

    One explode + one hash aggregation; the global top-k plans as
    TakeOrderedAndProject (per-partition heaps merged at the driver, no
    global sort of the vocabulary)."""
    words = df.select(
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_RE), 0)
        ).alias("word")
    )
    counts = words.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        counts.orderBy(F.col("cnt").desc(), F.col("word").asc())
        .limit(k)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.col("cnt").desc(), F.col("word").asc())
            ),
        )
    )


def boilerplate_lines(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 3,
) -> DataFrame:
    """Lines appearing in >= ``min_docs`` distinct documents — the
    CCNet/Dolma-style boilerplate set (nav bars, cookie banners, license
    headers). One explode + one hash aggregation keyed on the line; blank
    lines never count."""
    lines = df.select(
        F.col(id_col).alias("_id"),
        F.explode(F.split(F.col(text_col), "\n")).alias("line"),
    )
    return (
        lines.where(F.length(F.trim(F.col("line"))) > 0)
        .groupBy("line")
        .agg(F.count_distinct(F.col("_id")).alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
    )


def remove_boilerplate(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 3,
) -> DataFrame:
    """Strip corpus-frequent lines from every document, preserving the
    remaining line order. Returns (id, text) with the cleaned text;
    documents whose every line was boilerplate drop out.

    Scale shape: the boilerplate set is tiny relative to the corpus
    (bounded by distinct repeated lines), so the anti-join broadcasts
    under AQE; reassembly is one groupBy(doc) with an ObjectHashAggregate
    collect_list — order restored from the captured line position, no
    global sort."""
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )
    boiler = boilerplate_lines(
        df, text_col=text_col, id_col=id_col, min_docs=min_docs
    )
    kept = lines.join(boiler.select("line"), "line", "left_anti")
    ordered = F.array_sort(F.collect_list(F.struct("pos", "line")))
    return kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(ordered, lambda s: s.getField("line")), "\n"
        ).alias(text_col)
    )


def corpus_stats(
    df: DataFrame,
    *,
    strata_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-stratum corpus health report — the dataset-card numbers every
    corpus build publishes: document/token/char volume and the exact-dup
    rate (1 - distinct fingerprints / docs).

    One hash aggregation keyed on the stratum; countDistinct rewrites to
    a two-level partial agg (distinct on (stratum, fp) first), so no
    stratum ever materializes its full fingerprint set on one node."""
    t = F.col(text_col)
    return (
        df.groupBy(strata_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_count(t)).alias("n_tokens"),
            F.sum(char_count(t)).alias("n_chars"),
            F.countDistinct(fingerprint(t)).alias("n_unique"),
        )
        .select(
            strata_col,
            "n_docs",
            "n_tokens",
            "n_chars",
            "n_unique",
            F.round(
                F.lit(1.0) - F.col("n_unique") / F.col("n_docs"), 6
            ).alias("dup_rate"),
        )
    )


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    # per-row projections only; fan out an under-partitioned corpus so
    # the regex/token work uses the session's cores (results per-row
    # identical; see pipeline.parallelism)
    return fan_out_small_scan(df).withColumns(
        {
            "n_tokens": token_count(t),
            "n_chars_computed": char_count(t),
            "punct_ratio": F.round(punct_ratio(t), 6),
            "stopword_ratio": F.round(stopword_ratio(t), 6),
            "quality": F.round(quality_score(t), 6),
            "lang_guess": lang_id(t),
            "fingerprint": fingerprint(t),
        }
    )


#: Pretokenizer pieces: letter runs, digit runs, and single
#: non-alphanumeric non-space characters — the portable core of the
#: GPT-2-style pretokenization split (contraction/lookahead rules
#: dropped so any engine reproduces it with one regex).
PRETOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def tokenizer_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Tokenizer-coverage / fertility metrics per document — the cheap
    proxies for "how expensive is this text to tokenize": pretokenizer
    piece count, UTF-8 bytes per piece (fertility — high values flag
    text a subword vocab will shatter), ASCII ratio, and the UTF-8
    byte/char expansion factor. Pure JVM regex/length expressions."""
    t = F.col(text_col)
    pieces = F.size(F.regexp_extract_all(t, F.lit(PRETOKEN_RE), 0))
    n_bytes = F.octet_length(t)
    n_chars = F.length(t)
    ascii_chars = F.length(F.regexp_replace(t, "[^\\x00-\\x7F]", ""))
    return df.select(
        "doc_id",
        pieces.alias("n_pretokens"),
        F.round(
            F.when(pieces > 0, n_bytes / pieces).otherwise(F.lit(0.0)), 6
        ).alias("bytes_per_token"),
        F.round(
            F.when(n_chars > 0, ascii_chars / n_chars).otherwise(F.lit(1.0)), 6
        ).alias("ascii_ratio"),
        F.round(
            F.when(n_chars > 0, n_bytes / n_chars).otherwise(F.lit(1.0)), 6
        ).alias("utf8_expansion"),
    )


# characters the scrub removes wholesale: C0 controls except \t\n (and \r,
# which the line-ending rewrite handles first), DEL, and the zero-width
# family (ZWSP/ZWNJ/ZWJ/BOM) that breaks tokenizers and dedup fingerprints
_SCRUB_CLASS = (
    "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F"
    "\\u200B\\u200C\\u200D\\uFEFF]"
)


def scrub_text(text: Column) -> Column:
    """Deterministic pre-tokenization scrub, pure JVM regex (stays in
    whole-stage codegen): (1) line endings normalize to ``\\n``
    (``\\r\\n`` and lone ``\\r``), (2) C0 controls (except tab/newline),
    DEL, and zero-width characters are removed, (3) runs of horizontal
    whitespace collapse to one space. Mirrored 1:1 by the DuckDB oracle
    (same three regex rewrites), so scrubbed fingerprints stay
    engine-portable."""
    t = F.regexp_replace(text, "\\r\\n?", "\n")
    t = F.regexp_replace(t, _SCRUB_CLASS, "")
    return F.regexp_replace(t, "[ \\t]+", " ")


def normalize_text(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    form: str = "NFC",
    scrub: bool = True,
) -> DataFrame:
    """Unicode normalization for corpus hygiene: the same text encoded
    composed vs decomposed ('é' vs 'e'+U+0301) tokenizes differently and
    defeats exact dedup, so curation pipelines canonicalize (NFC is the
    standard; NFKC additionally folds compatibility forms — wider net,
    lossier). Output: ``(id, norm_text)``.

    The :func:`scrub_text` pass runs first as JVM regex; the
    normalization itself is a per-codepoint table transform the JVM
    expression language doesn't expose, so it runs as an Arrow-batched
    ``mapInPandas`` over stdlib ``unicodedata`` — the same justified-
    Python shape as the JPEG marker walk (variable-width, table-driven,
    library-backed), never a row-at-a-time UDF."""
    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"form must be NFC/NFD/NFKC/NFKD, got {form!r}")
    src = (
        df.withColumn(text_col, scrub_text(F.col(text_col)))
        if scrub
        else df
    )
    src = src.select(id_col, text_col)
    id_type = {f.name: f.dataType.simpleString() for f in df.schema}[id_col]
    out_schema = f"{id_col} {id_type}, norm_text string"

    def run(batches):
        import unicodedata

        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "norm_text": [
                        None
                        if t is None
                        else unicodedata.normalize(form, t)
                        for t in pdf[text_col]
                    ],
                }
            )

    return src.mapInPandas(run, out_schema)


GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The full Gopher quality-rule battery (Rae et al. 2021, "Scaling
    Language Models: ... Gopher", Appendix A — the public standard for
    corpus quality filtering), as pure Column expressions over one scan:

    - ``n_words`` in [50, 100000]
    - ``mean_word_len`` in [3, 10]
    - ``symbol_word_ratio`` (# and ellipsis per word) <= 0.1
    - ``bullet_line_frac`` (lines starting -, *) <= 0.9
    - ``ellipsis_line_frac`` (lines ending ... or U+2026) <= 0.3
    - ``alpha_word_frac`` (words containing a letter) >= 0.8
    - ``stop_hits`` (distinct Gopher stopwords present) >= 2

    Emits every signal (ratios 6-dp rounded, NULL-safe for empty docs)
    plus ``pass_gopher``. Zero shuffles, no UDFs, engine-portable
    expressions — the whole battery is one codegen'd projection, so at
    100 TB it rides the same scan as any other per-doc map.
    """
    t = F.col(text_col)
    words = F.regexp_extract_all(t, F.lit(WORD_RE), 0)
    n_words = F.size(words)
    word_chars = F.aggregate(
        F.transform(words, F.length),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    mean_word_len = F.when(
        n_words > 0, F.round(word_chars / n_words, 6)
    )
    n_hash = F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
    n_ellipsis = (
        (F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit("")))) / 3
        + F.length(t) - F.length(F.replace(t, F.lit("…"), F.lit("")))
    )
    symbol_word_ratio = F.when(
        n_words > 0, F.round((n_hash + n_ellipsis) / n_words, 6)
    )
    lines = F.filter(F.split(t, "\n"), lambda x: F.length(F.trim(x)) > 0)
    n_lines = F.size(lines)
    bullet_lines = F.size(
        F.filter(
            lines,
            lambda x: F.ltrim(x).startswith("-") | F.ltrim(x).startswith("*"),
        )
    )
    ellipsis_lines = F.size(
        F.filter(
            lines,
            lambda x: F.rtrim(x).endswith("...")
            | F.rtrim(x).endswith("…"),
        )
    )
    bullet_line_frac = F.when(
        n_lines > 0, F.round(bullet_lines / n_lines, 6)
    )
    ellipsis_line_frac = F.when(
        n_lines > 0, F.round(ellipsis_lines / n_lines, 6)
    )
    alpha_words = F.size(
        F.filter(words, lambda x: x.rlike("[A-Za-z]"))
    )
    alpha_word_frac = F.when(
        n_words > 0, F.round(alpha_words / n_words, 6)
    )
    lowered = F.transform(words, F.lower)
    stop_hits = None
    for sw in GOPHER_STOPWORDS:
        hit = F.array_contains(lowered, sw).cast("int")
        stop_hits = hit if stop_hits is None else stop_hits + hit
    passes = (
        n_words.between(50, 100000)
        & mean_word_len.between(3.0, 10.0)
        & (symbol_word_ratio <= 0.1)
        & (bullet_line_frac.isNull() | (bullet_line_frac <= 0.9))
        & (ellipsis_line_frac.isNull() | (ellipsis_line_frac <= 0.3))
        & (alpha_word_frac >= 0.8)
        & (stop_hits >= 2)
    )
    return df.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        symbol_word_ratio.alias("symbol_word_ratio"),
        bullet_line_frac.alias("bullet_line_frac"),
        ellipsis_line_frac.alias("ellipsis_line_frac"),
        alpha_word_frac.alias("alpha_word_frac"),
        stop_hits.cast("long").alias("stop_hits"),
        F.coalesce(passes, F.lit(False)).alias("pass_gopher"),
    )


def c4_clean(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The C4 line- and page-level cleaning rules (Raffel et al. 2020,
    "Exploring the Limits of Transfer Learning" §2.2 — the public
    Common-Crawl recipe), as one shuffle-free projection:

    line level — a line survives iff it ends in terminal punctuation
    (``.``, ``!``, ``?`` or a closing quote) after right-trim, has at
    least 3 words, and does not mention javascript (case-insensitive);
    page level — the document survives iff its surviving text contains
    at least 5 sentence terminators, the original text has no curly
    brace, and no 'lorem ipsum' (case-insensitive).

    Emits every input doc with the cleaned text, per-doc counts, and
    the ``kept`` flag — callers filter on it; keeping rejects visible
    makes the filter auditable. Pure array/string expressions riding
    the scan: the 100 TB cost is the corpus read itself."""
    t = F.col(text_col)
    lines = F.split(t, "\n")
    word_n = lambda x: F.size(  # noqa: E731
        F.regexp_extract_all(x, F.lit(WORD_RE), 0)
    )
    keep_line = lambda x: (  # noqa: E731
        F.rtrim(x).rlike('[.!?"]$')
        & (word_n(x) >= 3)
        & ~F.lower(x).contains("javascript")
    )
    kept_lines = F.filter(lines, keep_line)
    cleaned = F.array_join(kept_lines, "\n")
    n_sentences = F.size(
        F.regexp_extract_all(cleaned, F.lit("[.!?]"), 0)
    )
    kept = (
        (n_sentences >= 5)
        & ~t.contains("{")
        & ~F.lower(t).contains("lorem ipsum")
    )
    return df.select(
        F.col(id_col),
        cleaned.alias("clean_text"),
        F.size(F.filter(lines, lambda x: F.length(F.trim(x)) > 0))
        .cast("long").alias("n_lines"),
        F.size(kept_lines).cast("long").alias("n_lines_kept"),
        n_sentences.cast("long").alias("n_sentences"),
        F.coalesce(kept, F.lit(False)).alias("kept"),
    )


def gopher_repetition(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5, 6, 7, 8, 9, 10),
    coverage: str = "positions",
) -> DataFrame:
    """The duplicate-n-gram half of the Gopher rules (Rae et al. 2021
    Appendix A): per document,

    - ``top_{n}gram_frac`` (n in ``top_ns``) — characters attributed to
      the MOST FREQUENT word n-gram (occurrences x the gram's summed
      token lengths) over total token characters; 0 when no n-gram
      repeats (a once-occurring "top" gram is noise, per the public
      reimplementations); ties break on the lexicographically smallest
      gram, so the stat is deterministic.
    - ``dup_{n}gram_frac`` (n in ``dup_ns``) — characters of token
      POSITIONS covered by at least one occurrence of any DUPLICATED
      n-gram (count >= 2), counted once per position, over total token
      characters — the coverage semantics, not the naive sum that
      double-counts overlaps.

    Words are ``WORD_RE`` tokens of the lowercased text; character
    counts are token characters (separators excluded) so both engines
    agree exactly. Docs with fewer than n tokens report 0 for that n.

    Plan shape: ONE posexplode of the token array feeds a single
    (doc, n, gram) counting shuffle for every n at once; coverage
    re-explodes only DUPLICATED occurrences (<= n rows per occurrence —
    linear with a small constant, because duplicated grams are the
    minority in clean corpora). The token table is localCheckpoint'd:
    five consumers would otherwise re-run the corpus scan per branch.

    ``coverage="islands"`` swaps the per-position explode for a
    gaps-and-islands interval union: duplicated occurrence intervals
    merge via a running-max window, and covered CHARS come from a
    per-doc prefix-sum of token lengths probed at island endpoints (two
    (doc, pos) equi-joins — no explode, no range join, no distinct over
    positions). Identical output (property-tested); choose it for
    PATHOLOGICAL corpora where most grams are duplicated and the
    position explode would multiply the token table by ~n."""
    toks = (
        df.select(
            F.col(id_col),
            F.posexplode(
                F.expr(
                    f"regexp_extract_all(lower({text_col}), "
                    f"'[a-z0-9]+', 0)"
                )
            ).alias("pos", "w"),
        )
        .withColumn("wlen", F.length("w"))
        .localCheckpoint()
    )
    totals = toks.groupBy(id_col).agg(
        F.sum("wlen").alias("_total"), F.count(F.lit(1)).alias("_m")
    )
    all_ns = sorted(set(top_ns) | set(dup_ns))
    # gram rows for every n in one pass over the token table: gram at
    # pos p spans tokens p..p+n-1 (built with leads; NULL lead => no
    # full gram at p)
    max_n = max(all_ns)
    w_doc = Window.partitionBy(id_col).orderBy("pos")
    lead_cols = [F.col("w").alias("_w0")] + [
        F.lead("w", i).over(w_doc).alias(f"_w{i}") for i in range(1, max_n)
    ]
    lead_lens = [F.col("wlen").alias("_l0")] + [
        F.lead("wlen", i).over(w_doc).alias(f"_l{i}")
        for i in range(1, max_n)
    ]
    seq = toks.select(F.col(id_col), "pos", *lead_cols, *lead_lens)
    # ALL n-gram rows from one projection (explode an array over n) —
    # a 9-way union would re-run the lead-window subtree per branch
    # (plan-audited: 42 exchanges as a union, one window pass this way)
    per_n = [
        F.when(
            F.col(f"_w{n-1}").isNotNull(),
            F.struct(
                F.lit(n).alias("n"),
                F.concat_ws(
                    " ", *[F.col(f"_w{i}") for i in range(n)]
                ).alias("gram"),
                sum(
                    [F.col(f"_l{i}") for i in range(1, n)],
                    F.col("_l0"),
                ).alias("glen"),
            ),
        )
        for n in all_ns
    ]
    grams = (
        seq.select(
            F.col(id_col), "pos",
            F.explode(
                F.filter(F.array(*per_n), lambda x: x.isNotNull())
            ).alias("_g"),
        )
        .select(
            F.col(id_col), F.col("_g.n").alias("n"), "pos",
            F.col("_g.gram").alias("gram"), F.col("_g.glen").alias("glen"),
        )
    )
    counts = grams.groupBy(id_col, "n", "gram").agg(
        F.count(F.lit(1)).alias("_c"), F.first("glen").alias("glen")
    )
    # top-gram char fraction for small n
    w_top = Window.partitionBy(id_col, "n").orderBy(
        F.desc("_c"), F.asc("gram")
    )
    top = (
        counts.where(F.col("n").isin(*top_ns))
        .withColumn("_rn", F.row_number().over(w_top))
        .where((F.col("_rn") == 1) & (F.col("_c") >= 2))
        .select(
            F.col(id_col), "n",
            (F.col("_c") * F.col("glen")).alias("_chars"),
        )
    )
    # duplicated-gram position coverage for large n
    if coverage not in ("positions", "islands"):
        raise ValueError(f"coverage must be positions|islands: {coverage}")
    occ = grams.where(F.col("n").isin(*dup_ns)).join(
        counts.where(F.col("_c") >= 2).select(id_col, "n", "gram"),
        [id_col, "n", "gram"],
    )
    if coverage == "positions":
        dup_occ = (
            occ.select(
                F.col(id_col), "n",
                F.explode(
                    F.sequence(F.col("pos"), F.col("pos") + F.col("n") - 1)
                ).alias("_q"),
            )
            .distinct()
        )
        cov = (
            dup_occ.join(
                toks.select(
                    F.col(id_col), F.col("pos").alias("_q"), "wlen"
                ),
                [id_col, "_q"],
            )
            .groupBy(id_col, "n")
            .agg(F.sum("wlen").alias("_chars"))
        )
    else:
        # gaps-and-islands: merge overlapping occurrence intervals with
        # a running-max window, then chars per island from the per-doc
        # token-length prefix sum (probe endpoints by equality)
        w_occ = Window.partitionBy(id_col, "n").orderBy("pos")
        iv = occ.select(
            F.col(id_col), "n", "pos",
            (F.col("pos") + F.col("n") - 1).alias("_e"),
        )
        prev_max = F.max("_e").over(
            w_occ.rowsBetween(Window.unboundedPreceding, -1)
        )
        iv = iv.withColumn(
            "_new",
            F.when(
                prev_max.isNull() | (F.col("pos") > prev_max), 1
            ).otherwise(0),
        ).withColumn("_grp", F.sum("_new").over(w_occ))
        islands = iv.groupBy(id_col, "n", "_grp").agg(
            F.min("pos").alias("_s"), F.max("_e").alias("_ie")
        )
        w_tok = Window.partitionBy(id_col).orderBy("pos")
        cum = toks.select(
            F.col(id_col), "pos",
            F.sum("wlen").over(w_tok).alias("_cl"),
        )
        cov = (
            islands.join(
                cum.select(
                    F.col(id_col), F.col("pos").alias("_ie"),
                    F.col("_cl").alias("_cl_e"),
                ),
                [id_col, "_ie"],
            )
            .join(
                cum.select(
                    F.col(id_col), (F.col("pos") + 1).alias("_s"),
                    F.col("_cl").alias("_cl_s"),
                ),
                [id_col, "_s"],
                "left",
            )
            .groupBy(id_col, "n")
            .agg(
                F.sum(
                    F.col("_cl_e") - F.coalesce(F.col("_cl_s"), F.lit(0))
                ).alias("_chars")
            )
        )
    # one conditional aggregation instead of 9 per-metric joins
    merged = top.select(
        F.col(id_col), F.concat(F.lit("t"), F.col("n")).alias("_k"),
        "_chars",
    ).unionByName(
        cov.select(
            F.col(id_col), F.concat(F.lit("d"), F.col("n")).alias("_k"),
            "_chars",
        )
    )
    aggs = [
        F.max(F.when(F.col("_k") == f"t{n}", F.col("_chars"))).alias(
            f"_t{n}"
        )
        for n in top_ns
    ] + [
        F.max(F.when(F.col("_k") == f"d{n}", F.col("_chars"))).alias(
            f"_d{n}"
        )
        for n in dup_ns
    ]
    out = totals.join(merged.groupBy(id_col).agg(*aggs), id_col, "left")
    cols = [F.col(id_col)]
    for n in top_ns:
        cols.append(
            F.round(
                F.coalesce(F.col(f"_t{n}"), F.lit(0)) / F.col("_total"), 6
            ).alias(f"top_{n}gram_frac")
        )
    for n in dup_ns:
        cols.append(
            F.round(
                F.coalesce(F.col(f"_d{n}"), F.lit(0)) / F.col("_total"), 6
            ).alias(f"dup_{n}gram_frac")
        )
    return out.where(F.col("_total") > 0).select(*cols)
