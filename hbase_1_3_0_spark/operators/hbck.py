"""HBaseFsck (hbck) region-chain integrity checks as one DataFrame pass.

Reference semantics (hbase-1.3.0, HBaseFsck.java:2972
``checkRegionChain`` over RegionSplitCalculator.java:137
``calcCoverage``):

- The table's split-point set is every region start AND end key; an
  empty end key is the +infinity sentinel (RegionSplitCalculator.java
  :101 specialEndKey — the null key sorts LAST, :83). Backwards
  regions (start > non-empty end) never enter the chain
  (:114 ``add`` rejects them).
- Coverage at split key s (the calcCoverage multimap) = regions with
  start <= s < end (end empty = +inf), PLUS every region at its own
  start key (:146 ``starts.put`` — this is how a degenerate [x, x)
  region still appears at x).
- Errors, walked split key by split key (error codes at
  HBaseFsck.java:3856):
  * FIRST_REGION_STARTKEY_NOT_EMPTY — the lowest split key is not ''
    (:2679): every region starting there is reported.
  * DEGENERATE_REGION — start == end, end non-empty (:2694).
  * DUPE_STARTKEYS — two regions covering s share a start key
    (:2702).
  * OVERLAP_IN_REGION_CHAIN — two regions covering s with different
    start keys (:2712). Like the reference's per-split-key n² loop, a
    pair is reported at every split key both cover (deduped — the
    reference's two one-region DUPE reports collapse to one
    two-region row here).
  * HOLE_IN_REGION_CHAIN — coverage 0 at s and a higher split exists
    (:2720). The +inf sentinel never opens a hole (higher() of the
    top key is nothing). NOTE divergence: the reference also reports
    one hole for a table with NO regions at all (:2987); a
    row-per-region DataFrame cannot carry a zero-region table, so
    that case is out of scope here.
  * LAST_REGION_ENDKEY_NOT_EMPTY — NO region has an empty end key
    (:2687: prevKey survives the walk exactly when the +inf sentinel
    never terminated it).

Scale shape — the reference's walk is per-split-key with an n² pair
loop it itself calls "dumb ... but this shouldn't happen often"; the
DataFrame version keeps that wager explicit:

1. Coverage counting is a SWEEP, not a join: +1/-1 events at region
   boundaries, three per-table running sums over the distinct split
   keys (degenerate regions count at their start key but exit before
   the next key, mirroring ``starts.put``). Linear in regions, one
   window per table partition.
2. Region PAIRS only materialize at split keys whose coverage count
   is already >= 2 — the problem set, which is the error surface
   itself. A healthy 10^6-region table does zero pair work.

Output: (table_name, error_code, split_key, region_a, region_b) —
region_* are start||'|'||end labels, canonically ordered in a pair;
slots the reference doesn't populate are NULL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["region_chain_check", "ERROR_CODES"]

ERROR_CODES = (
    "FIRST_REGION_STARTKEY_NOT_EMPTY",
    "LAST_REGION_ENDKEY_NOT_EMPTY",
    "DEGENERATE_REGION",
    "DUPE_STARTKEYS",
    "OVERLAP_IN_REGION_CHAIN",
    "HOLE_IN_REGION_CHAIN",
)


def region_chain_check(
    regions: DataFrame,
    *,
    table_col: str = "table_name",
    start_col: str = "start_key",
    end_col: str = "end_key",
) -> DataFrame:
    """Check every table's region chain; see module docstring.

    ``regions``: one row per region with STRING keys; '' (or NULL,
    coerced to '') is the empty key on either side. Tables with no
    error rows are healthy — hbck's exit-0 case.
    """
    r = regions.select(
        F.col(table_col).alias("t"),
        F.coalesce(F.col(start_col), F.lit("")).alias("s"),
        F.coalesce(F.col(end_col), F.lit("")).alias("e"),
    )
    # backwards edges never enter the chain (add() rejects them)
    r = r.where((F.col("e") == "") | (F.col("s") <= F.col("e")))
    r = r.select(
        "t",
        "s",
        "e",
        F.concat(F.col("s"), F.lit("|"), F.col("e")).alias("rg"),
        ((F.col("e") != "") & (F.col("s") == F.col("e"))).alias("degen"),
    )
    # the six error branches below each re-derive this region table;
    # materialize it ONCE (metadata-scale) so the plan carries ~20
    # exchanges instead of ~110 re-computed subtree copies
    r = r.localCheckpoint()

    # ---- sweep: coverage count at every split key ----
    # per-key event tallies; the +inf sentinel stays implicit
    ev = (
        r.groupBy("t", F.col("s").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_in"))
        .join(
            r.where((F.col("e") != "") & ~F.col("degen"))
            .groupBy("t", F.col("e").alias("k"))
            .agg(F.count(F.lit(1)).alias("n_out")),
            ["t", "k"],
            "full",
        )
        .join(
            r.where(F.col("degen"))
            .groupBy("t", F.col("e").alias("k"))
            .agg(F.count(F.lit(1)).alias("n_out_degen")),
            ["t", "k"],
            "full",
        )
        .select(
            "t",
            "k",
            F.coalesce("n_in", F.lit(0)).alias("n_in"),
            F.coalesce("n_out", F.lit(0)).alias("n_out"),
            F.coalesce("n_out_degen", F.lit(0)).alias("n_out_degen"),
        )
    )
    wk = Window.partitionBy("t").orderBy("k")
    # normal region [s,e): in AT s, out AT e (e not covered);
    # degenerate [x,x): in AT x, out strictly AFTER x (starts.put)
    cover = ev.select(
        "t",
        "k",
        (
            F.sum("n_in").over(wk)
            - F.sum("n_out").over(wk)
            - (F.sum("n_out_degen").over(wk) - F.col("n_out_degen"))
        ).alias("cnt"),
        F.lead("k").over(wk).alias("_next"),
        F.row_number().over(wk).alias("_idx"),
    )

    def _err(code, split_key, ra, rb):
        return [
            F.col("t").alias("table_name"),
            F.lit(code).alias("error_code"),
            split_key.alias("split_key"),
            ra.alias("region_a"),
            rb.alias("region_b"),
        ]

    null_s = F.lit(None).cast("string")

    # FIRST: lowest split key not '' -> every region starting there
    first_key = cover.where(F.col("_idx") == 1).select(
        "t", F.col("k").alias("_min")
    )
    first_err = (
        r.join(first_key, "t")
        .where((F.col("_min") != "") & (F.col("s") == F.col("_min")))
        .select(
            *_err(
                "FIRST_REGION_STARTKEY_NOT_EMPTY", F.col("s"), F.col("rg"), null_s
            )
        )
    )

    # LAST: no +inf sentinel -> reported once with the highest split
    last_err = (
        r.groupBy("t")
        .agg(
            F.max(F.when(F.col("e") == "", 1).otherwise(0)).alias("_inf"),
            F.greatest(F.max("s"), F.max("e")).alias("_max"),
        )
        .where(F.col("_inf") == 0)
        .select(
            *_err("LAST_REGION_ENDKEY_NOT_EMPTY", F.col("_max"), null_s, null_s)
        )
    )

    # DEGENERATE: start == end, end non-empty
    degen = r.where(F.col("degen")).select(
        *_err("DEGENERATE_REGION", F.col("s"), F.col("rg"), null_s)
    )

    # HOLE: zero coverage with a higher split after it
    holes = cover.where(
        (F.col("cnt") == 0) & F.col("_next").isNotNull()
    ).select(*_err("HOLE_IN_REGION_CHAIN", F.col("k"), null_s, null_s))

    # DUPE / OVERLAP: pairs materialize ONLY at problem keys
    # (coverage >= 2); covers(k) mirrors the calcCoverage multimap —
    # the half-open interval plus the region's own start key. EXACT
    # duplicate regions (same span twice — distinct HbckInfos in the
    # reference, e.g. two regionIds over one range) pair with
    # themselves, carried here as a multiplicity on the deduped span.
    rdist = r.groupBy("t", "s", "e", "rg").agg(
        F.count(F.lit(1)).alias("mult")
    )
    problem = cover.where(F.col("cnt") >= 2).select("t", "k")
    pcov = problem.join(rdist, "t").where(
        (F.col("s") == F.col("k"))
        | (
            (F.col("s") <= F.col("k"))
            & ((F.col("e") == "") | (F.col("k") < F.col("e")))
        )
    )
    a = pcov.select(
        "t", "k", F.col("s").alias("sa"), F.col("rg").alias("ra"), "mult"
    )
    b = pcov.select("t", "k", F.col("s").alias("sb"), F.col("rg").alias("rb"))
    pairs = a.join(b, ["t", "k"]).where(
        (F.col("ra") < F.col("rb"))
        | ((F.col("ra") == F.col("rb")) & (F.col("mult") >= 2))
    )
    dupes = pairs.where(F.col("sa") == F.col("sb")).select(
        *_err("DUPE_STARTKEYS", F.col("k"), F.col("ra"), F.col("rb"))
    )
    overlaps = pairs.where(F.col("sa") != F.col("sb")).select(
        *_err("OVERLAP_IN_REGION_CHAIN", F.col("k"), F.col("ra"), F.col("rb"))
    )

    return (
        first_err.unionByName(last_err)
        .unionByName(degen)
        .unionByName(dupes)
        .unionByName(overlaps)
        .unionByName(holes)
        .distinct()
    )
