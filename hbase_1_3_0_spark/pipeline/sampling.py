"""Deterministic sampling, dataset mixing, and sequence packing.

Training-data pipeline ops a 100 TB corpus build needs beyond dedup/
quality: (a) reproducible subsampling — per-stratum rates (dataset
mixing weights), train/eval splits — that give the SAME verdict for the
same document on every engine and every run, and (b) packing documents
into fixed-capacity context windows for training.

Scale shape:
- Sampling is a pure map: one md5 per row, a string compare against a
  precomputed hex threshold, zero shuffles, fully pushdown-friendly.
  No ``rand()`` anywhere — randomness from ``rand()`` is neither
  reproducible across retries (task re-execution resamples!) nor
  auditable. Salted content/id hashing is the standard trick (e.g.
  mod-sharding in CCNet/Dolma-style pipelines).
- The hex-threshold compare works because fixed-width lowercase hex is
  lexicographically order-isomorphic to the integer it encodes, so
  ``substr(md5(k),1,8) < '1999999a'`` selects a 10% Bernoulli sample
  identically in Spark, DuckDB, or any SQL engine — no float rounding,
  no bigint conversion differences.
- Packing shuffles once on the stratum key, then runs a single window
  cumulative sum within each stratum (sorted by id). Bin boundaries are
  pure arithmetic on the running token count — the "concatenate the
  corpus and cut every `capacity` tokens" scheme GPT-style training
  uses. One stratum = one sort partition; a pathologically hot stratum
  should be pre-salted by the caller (documented below).

Reference parity: the reference has no sampling surface (its
RandomRowFilter at RandomRowFilter.java:36 uses Random#nextFloat per
row — not reproducible across scans); this module is the
pipeline-grade replacement and is cited from SURVEY.md §2's
training-pipeline section.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "rate_to_hex",
    "hash_bucket",
    "stratified_sample",
    "exact_k_sample",
    "token_budget_sample",
    "train_eval_split",
    "pack_sequences",
    "temperature_mix_rates",
    "temperature_sample",
    "unimax_allocation",
]


def rate_to_hex(rate: float) -> str:
    """Map a rate in [0,1] to the 8-hex-digit threshold such that
    ``hash_bucket(k) < threshold`` keeps ~``rate`` of keys. Exact at
    1/2^32 granularity; monotone; '00000000' keeps nothing and
    'ffffffff'+ keeps everything ('g' sorts after every hex digit)."""
    if rate <= 0.0:
        return "00000000"
    if rate >= 1.0:
        return "g"  # > every 8-digit hex string
    return format(int(rate * 2**32), "08x")


def hash_bucket(key: Column, seed: str = "") -> Column:
    """First 8 hex digits of md5(seed || key) — a uniform draw in
    [0, 2^32) encoded as a fixed-width lowercase hex string. Compare
    against :func:`rate_to_hex` thresholds with plain ``<``."""
    return F.substring(F.md5(F.concat(F.lit(seed), key.cast("string"))), 1, 8)


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    *,
    strata_col: str = "source",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    seed: str = "mix1",
) -> DataFrame:
    """Deterministic per-stratum Bernoulli sampling — the dataset-mixing
    primitive (per-source weights -> per-source keep rates).

    Pure narrow map (no shuffle): each row is kept iff the salted md5 of
    its id falls under its stratum's threshold. Unlike
    ``DataFrame.sampleBy`` (per-task RNG), membership is a function of
    (seed, id) only — stable under task retries, incremental re-runs,
    and engine changes.
    """
    bucket = hash_bucket(F.col(id_col), seed)
    thr: Column = F.lit(rate_to_hex(default_rate))
    for stratum, rate in rates.items():
        thr = (
            F.when(F.col(strata_col) == stratum, F.lit(rate_to_hex(rate)))
            .otherwise(thr)
        )
    return df.where(bucket < thr)


def exact_k_sample(
    df: DataFrame,
    k: dict[str, int],
    *,
    strata_col: str = "source",
    id_col: str = "doc_id",
    default_k: int = 0,
    seed: str = "quota1",
) -> DataFrame:
    """Exact per-stratum quotas — keep EXACTLY ``k[stratum]`` rows (or
    all, if the stratum is smaller), chosen reproducibly.

    Bernoulli rates (:func:`stratified_sample`) can't hit exact counts;
    eval-set construction and per-source caps need quotas. Determinism
    comes from ranking each stratum by the salted md5 of the id (a
    seeded uniform shuffle that is a pure function of (seed, id)) and
    keeping the first k — the same k rows on every engine, every run,
    every retry. One shuffle on the stratum key + one window
    row_number; a stratum's rows sort within one partition, so quotas
    over pathologically hot strata should pre-filter with a Bernoulli
    pass first (rate ~= 2k/stratum_size) to bound the sorted set —
    the standard two-phase exact-sample trick at 100 TB."""
    from pyspark.sql.window import Window

    bucket = hash_bucket(F.col(id_col), seed)
    quota: Column = F.lit(default_k)
    for stratum, n in k.items():
        quota = F.when(
            F.col(strata_col) == stratum, F.lit(int(n))
        ).otherwise(quota)
    w = Window.partitionBy(strata_col).orderBy(bucket, F.col(id_col))
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= quota)
        .drop("_rk")
    )


def token_budget_sample(
    df: DataFrame,
    budgets: dict[str, int],
    *,
    strata_col: str = "source",
    id_col: str = "doc_id",
    token_col: Column | None = None,
    default_budget: int = 0,
    seed: str = "budget1",
) -> DataFrame:
    """Per-stratum TOKEN budgets — how training mixtures are actually
    specified ("2B tokens of source X, 500M of Y"), where doc-count
    quotas (:func:`exact_k_sample`) miss because documents vary in
    length by orders of magnitude.

    Greedy deterministic fill: each stratum's docs are ranked by the
    salted md5 of the id (a seeded uniform shuffle, reproducible across
    engines/retries) and kept while the tokens accumulated BEFORE the
    doc are still under the budget — so the doc that crosses the
    boundary is kept (the budget is a floor-crossing rule, not a hard
    ceiling; a budget of 1 keeps exactly one doc). Same plan shape as
    :func:`exact_k_sample`: one shuffle on the stratum key + one window
    cumulative sum; pre-filter pathologically hot strata with a
    Bernoulli pass (rate ~= 2·budget/stratum_tokens) to bound the
    sorted set — the two-phase trick at 100 TB.

    ``token_col`` defaults to the engine's standard whitespace-
    punctuation-agnostic word count (``text.token_count``) over a
    ``text`` column."""
    from pyspark.sql.window import Window

    from hbase_1_3_0_spark.pipeline.text import token_count

    tok = token_col if token_col is not None else token_count(F.col("text"))
    budget: Column = F.lit(int(default_budget))
    for stratum, b in budgets.items():
        budget = F.when(
            F.col(strata_col) == stratum, F.lit(int(b))
        ).otherwise(budget)
    bucket = hash_bucket(F.col(id_col), seed)
    w = (
        Window.partitionBy(strata_col)
        .orderBy(bucket, F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum(tok).over(w), F.lit(0).cast("long"))
    return (
        df.withColumn("_before", before)
        .where((F.col("_before") < budget))
        .drop("_before")
    )


def train_eval_split(
    df: DataFrame,
    *,
    eval_frac: float = 0.01,
    id_col: str = "doc_id",
    seed: str = "split1",
) -> DataFrame:
    """Tag every row with a reproducible ``split`` column ('train' /
    'eval'). Complementary by construction — each row lands in exactly
    one split; filtering either side is a pushdown-friendly predicate."""
    is_eval = hash_bucket(F.col(id_col), seed) < F.lit(rate_to_hex(eval_frac))
    return df.withColumn(
        "split", F.when(is_eval, F.lit("eval")).otherwise(F.lit("train"))
    )


def pack_sequences(
    df: DataFrame,
    *,
    capacity: int = 2048,
    token_col: Column | None = None,
    strata_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Concat-and-chunk sequence packing: within each stratum, documents
    are laid out in id order on a single token tape; the tape is cut
    every ``capacity`` tokens. Emits per-document placement:

    - ``bin_id``   — index of the context window the document STARTS in
    - ``bin_off``  — token offset of the document within that window
    - ``n_tokens`` — the document's token count
    - ``spill``    — tokens that overflow into the next window(s)

    One shuffle (hash on the stratum), one in-partition sort, one
    running sum — Spark plans this as a single Window over the stratum
    partitioning; there is no global sort. At 100 TB the unit of
    packing is the stratum/shard: callers with one giant stratum should
    pre-shard it (e.g. ``F.pmod(F.xxhash64(id), n_shards)`` as the
    stratum) — same placement law, bounded partition size.
    """
    from pyspark.sql.window import Window

    toks = token_col if token_col is not None else F.size(
        F.regexp_extract_all(F.col("text"), F.lit("[A-Za-z0-9]+"), 0)
    )
    w = (
        Window.partitionBy(strata_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df.withColumn("n_tokens", toks.cast("long"))
    cum = F.sum("n_tokens").over(w)
    # integer `div`, not `/`: long/long division in Spark yields double,
    # which loses precision past 2^53 cumulative tokens — real territory
    # for a 100 TB tape — and could misplace documents into bins
    out = out.withColumn("_start", (cum - F.col("n_tokens")).cast("long"))
    return out.select(
        strata_col,
        id_col,
        "n_tokens",
        F.expr(f"_start div {int(capacity)}L").alias("bin_id"),
        (F.col("_start") % capacity).cast("long").alias("bin_off"),
        F.greatest(
            F.lit(0).cast("long"),
            ((F.col("_start") % capacity) + F.col("n_tokens")) - capacity,
        ).alias("spill"),
    )


def temperature_mix_rates(
    df: DataFrame,
    *,
    alpha: float = 0.5,
    target_frac: float = 0.5,
    strata_col: str = "source",
    weight_col: Column | None = None,
) -> DataFrame:
    """Temperature-based source mixing (the multilingual/multi-source LM
    weighting: sample source i with probability proportional to
    ``share_i ** alpha``). Returns per-source (n, mix_weight, keep_rate)
    where ``keep_rate`` is the Bernoulli rate that realizes the tempered
    mixture at an expected overall volume of ``target_frac`` of the
    corpus — feed it to :func:`stratified_sample`. ``alpha < 1`` lifts
    small sources, ``alpha = 1`` is proportional (rate = target_frac
    everywhere), ``alpha = 0`` is uniform-over-sources. Rates cap at 1:
    a tiny source cannot be oversampled without replacement, so the
    realized mixture flattens at the cap (the standard caveat).

    One hash agg + a broadcast 1-row totals join; ``weight_col`` weights
    rows (e.g. token counts) instead of counting documents."""
    w = weight_col if weight_col is not None else F.lit(1)
    per = df.groupBy(strata_col).agg(F.sum(w).alias("n"))
    tempered = per.withColumn("_t", F.pow(F.col("n"), F.lit(float(alpha))))
    totals = tempered.agg(
        F.sum("n").alias("_total_n"), F.sum("_t").alias("_total_t")
    )
    out = tempered.crossJoin(F.broadcast(totals))
    mix = F.col("_t") / F.col("_total_t")
    rate = F.least(
        F.lit(1.0),
        F.lit(float(target_frac)) * F.col("_total_n") * mix / F.col("n"),
    )
    return out.select(
        strata_col,
        "n",
        F.round(mix, 6).alias("mix_weight"),
        F.round(rate, 6).alias("keep_rate"),
    )


def temperature_sample(
    df: DataFrame,
    *,
    alpha: float = 0.5,
    target_frac: float = 0.5,
    strata_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "mix1",
) -> DataFrame:
    """Apply :func:`temperature_mix_rates` as a deterministic stratified
    sample. The per-source rate table is tiny (one row per source) and
    collects to the driver to become broadcast-literal thresholds —
    the data pass stays a zero-shuffle narrow map."""
    rates = {
        r[strata_col]: r["keep_rate"]
        for r in temperature_mix_rates(
            df, alpha=alpha, target_frac=target_frac, strata_col=strata_col
        ).collect()
    }
    return stratified_sample(
        df, rates, strata_col=strata_col, id_col=id_col, seed=seed
    )


def pack_bins_ffd(
    df: DataFrame,
    *,
    capacity: int = 512,
    token_col: Column | None = None,
    id_col: str = "doc_id",
    num_groups: int = 32,
) -> DataFrame:
    """Bin packing WITHOUT splitting documents (the SFT-style
    complement of :func:`pack_sequences`, which cuts the token tape):
    each document lands whole in exactly one bin of ``capacity``
    tokens, assigned first-fit-decreasing. Documents longer than
    ``capacity`` get a dedicated bin flagged ``oversize`` (the caller
    truncates or re-chunks those).

    Exact FFD is inherently sequential, so it runs per GROUP: documents
    hash into ``num_groups`` deterministic groups — ``pmod(id,
    num_groups)`` for integral ids, ``pmod(xxhash64(id), num_groups)``
    for any other id type (both engine-portable and reproducible under
    retries) — each group sorts (tokens DESC, id ASC) and packs
    sequentially inside one Arrow-batched ``applyInPandas`` task. This is the justified-Python
    tier: a greedy sequential scan has no Column-expression form. Bin
    ids are (group, bin) pairs; packing quality is within-group FFD
    (the classic 11/9 OPT + 6/9 bound per group). At 100 TB pick
    ``num_groups`` ~ cluster parallelism: groups are independent,
    single-pass, and each task holds only its group's (id, n_tokens)
    pairs — not the text.

    Emits ``(id, n_tokens, grp, bin, oversize)``."""
    import pandas as pd

    toks = token_col if token_col is not None else F.size(
        F.regexp_extract_all(F.col("text"), F.lit("[A-Za-z0-9]+"), 0)
    )
    # group key: ids need not be numeric — integral ids keep the direct
    # pmod (stable vs prior rounds); everything else routes through
    # xxhash64 so string/binary doc ids work instead of raising
    id_type = df.schema[id_col].dataType.simpleString()
    integral = id_type in ("tinyint", "smallint", "int", "bigint")
    grp_src = F.col(id_col) if integral else F.xxhash64(F.col(id_col))
    slim = df.select(
        F.col(id_col).alias("_id"),
        toks.cast("long").alias("n_tokens"),
        F.pmod(grp_src, F.lit(num_groups)).cast("int").alias("grp"),
    )

    cap = int(capacity)

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_tokens", "_id"], ascending=[False, True]
        ).reset_index(drop=True)
        bins: list[int] = []  # remaining capacity per bin
        assigned = []
        oversize = []
        for t in pdf["n_tokens"]:
            t = int(t)
            if t > cap:
                bins.append(-1)  # dedicated, never reused
                assigned.append(len(bins) - 1)
                oversize.append(True)
                continue
            for b, rem in enumerate(bins):
                if rem >= t:
                    bins[b] = rem - t
                    assigned.append(b)
                    break
            else:
                bins.append(cap - t)
                assigned.append(len(bins) - 1)
            oversize.append(False)
        pdf["bin"] = pd.Series(assigned, dtype="int64")
        pdf["oversize"] = pd.Series(oversize, dtype="bool")
        return pdf

    out_schema = (
        f"_id {id_type}, n_tokens long, grp int, bin long, "
        "oversize boolean"
    )
    return (
        slim.groupBy("grp")
        .applyInPandas(pack, out_schema)
        .select(
            F.col("_id").alias(id_col), "n_tokens", "grp", "bin",
            "oversize",
        )
    )


def unimax_allocation(
    df: DataFrame,
    *,
    total_budget: float,
    max_epochs: float = 1.0,
    strata_col: str = "lang",
    weight_col: Column | None = None,
) -> DataFrame:
    """UniMax budget allocation (Chung et al., ICLR 2023 "UniMax:
    Fairer and More Effective Language Sampling for Large-Scale
    Multilingual Pretraining"): spread ``total_budget`` units
    (characters/tokens) as UNIFORMLY as possible across languages,
    never exceeding ``max_epochs`` passes over any language's corpus —
    the budget-constrained water-filling the paper's greedy loop
    computes (Algorithm 1: repeatedly give every remaining language the
    uniform share of the remaining budget, capping the ones whose
    entire corpus x epoch budget is smaller and removing them).

    The greedy loop has a one-pass closed form: with per-language caps
    ``u_i = n_i * max_epochs`` sorted ascending, language i is capped
    iff ``u_i * (langs_remaining) <= budget_remaining`` — the predicate
    is monotone along the sort, so the capped set is a prefix and the
    uncapped suffix splits what is left evenly. One #langs-row window
    pass, no loop (same metadata posture as temperature_mix_rates; the
    allocation then drives token_budget_sample / stratified_sample per
    language).

    Returns per-language (n, cap, alloc, epochs, capped), floats
    rounded to 6dp. If the budget exceeds the total corpus x epoch
    budget, every language caps and the surplus is unallocated (the
    paper's N-epoch ceiling)."""
    from pyspark.sql.window import Window

    w = weight_col if weight_col is not None else F.lit(1)
    per = df.groupBy(strata_col).agg(F.sum(w).cast("double").alias("n"))
    caps = per.withColumn("cap", F.col("n") * F.lit(float(max_epochs)))

    wo = Window.orderBy(F.col("cap").asc(), F.col(strata_col).asc())
    wall = Window.partitionBy()
    b = F.lit(float(total_budget))
    ranked = caps.select(
        "*",
        F.row_number().over(wo).alias("_i"),
        F.coalesce(
            F.sum("cap").over(wo.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0.0),
        ).alias("_prefix"),
        F.count(F.lit(1)).over(wall).alias("_n"),
    ).withColumn(
        "capped",
        (F.col("cap") * (F.col("_n") - F.col("_i") + 1))
        <= (b - F.col("_prefix")),
    )
    ranked = ranked.select(
        "*",
        F.sum(F.col("capped").cast("int")).over(wall).alias("_k"),
        F.sum(F.when(F.col("capped"), F.col("cap")).otherwise(0.0))
        .over(wall)
        .alias("_capsum"),
    )
    share = (b - F.col("_capsum")) / (F.col("_n") - F.col("_k"))
    alloc = F.when(F.col("capped"), F.col("cap")).otherwise(share)
    return ranked.select(
        strata_col,
        "n",
        F.round("cap", 6).alias("cap"),
        F.round(alloc, 6).alias("alloc"),
        F.round(alloc / F.col("n"), 6).alias("epochs"),
        "capped",
    )


def cluster_balanced_sample(
    df: DataFrame,
    centroids: list[list[float]],
    *,
    k_per_cluster: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: str = "quota1",
) -> DataFrame:
    """Cluster-balanced corpus sampling: assign every vector to its
    nearest centroid and keep EXACTLY ``k_per_cluster`` rows per
    cluster — the diversity-balancing step of cluster-based data
    curation (the SemDeDup/D4 family: without it, the corpus's dominant
    modes swamp the training mixture; `pipeline/dedup.py semdedup`
    handles the intra-cluster dedup half).

    Engine-portable by construction, unlike the trained-k-means paths
    (`similarity.ivf_assign` with `kmeans_centroids`, rows-only at the
    oracle): callers pass DETERMINISTIC centroids (e.g. the embeddings
    of the k smallest ids), similarities round to 6dp before the argmax
    (the `cosine_topk` convention — raw float argmax drifts across
    engines), ties break to the LARGER centroid index, and the per-
    cluster quota is the seeded-md5 exact-k rule (`exact_k_sample`),
    a pure function of (seed, id).

    Scale shape: centroids ride as ONE literal-matrix expression (the
    `_lit_matrix` posture — tree size grows with the model, not the
    data), assignment is a narrow projection on the corpus scan, and
    the only shuffle is the cluster-keyed exact-k window. Returns
    (id, cluster_id) plus the input columns."""
    from hbase_1_3_0_spark.pipeline.similarity import _dot, _lit_matrix

    sims = F.transform(
        _lit_matrix(centroids),
        lambda c, i: F.struct(
            F.round(_dot(F.col(vec_col), c), 6).alias("s"), i.alias("l")
        ),
    )
    assigned = df.withColumn("cluster_id", F.array_max(sims)["l"])
    return exact_k_sample(
        assigned,
        {},
        strata_col="cluster_id",
        id_col=id_col,
        default_k=k_per_cluster,
        seed=seed,
    )
