"""SimpleRegionNormalizer: split/merge planning over region sizes.

Reference semantics (SimpleRegionNormalizer.java:104
``computePlanForTable``, hbase-1.3.0):

- Tables with fewer than MIN_REGION_COUNT=3 regions are skipped (:117).
- avg = total size / region count (:137).
- Walk regions in key order (:156): a region larger than 2×avg gets a
  SPLIT plan (:162); otherwise, if it plus its RIGHT neighbor sum to
  under avg, the pair gets a MERGE plan and the neighbor is consumed —
  the walk continues after it (:172-177, candidateIdx skips the
  consumed region). The last region alone never starts a merge (:166).
- Plans are sorted splits-first, stable (:79 planComparator +
  Collections.sort — splits in region order, then merges in region
  order).

The greedy consume rule is the only non-relational part, and it
linearizes exactly: define merge-eligibility e(i) = NOT split(i) AND
size(i) + size(i+1) < avg. Within each maximal run of consecutive
e-true regions, the walk merges the 1st, 3rd, 5th... (odd ranks) —
the even-rank regions are consumed. Proof: the region before a run
cannot itself be a merge start (e is false there by maximality), so
every run is entered at its first region, and each merge advances two.
That makes the whole plan ONE pass of window functions — a
gaps-and-islands computation, no driver loop, no UDF: per-table avg
(one agg), lead() for the neighbor size, an island id from the
eligibility flag, and a rank parity. Scale: thousands of tables ×
thousands of regions is still a tiny metadata DataFrame; everything
partitions by table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["normalization_plan", "MIN_REGION_COUNT"]

#: SimpleRegionNormalizer.java:66
MIN_REGION_COUNT = 3


def normalization_plan(
    region_sizes: DataFrame,
    *,
    table_col: str = "table_name",
    region_col: str = "region",
    size_col: str = "size_mb",
    split_enabled: bool = True,
    merge_enabled: bool = True,
    min_region_count: int = MIN_REGION_COUNT,
) -> DataFrame:
    """Compute normalization plans for every table at once.

    ``region_sizes``: one row per region — (table, region ordinal in
    key order, size). Returns (table_name, plan_seq, plan_type,
    region_a, region_b, size_a, size_b): SPLIT plans carry region_b =
    NULL (SplitNormalizationPlan passes a null split point at :168);
    plan_seq numbers splits first then merges, each in region order —
    the stable splits-first sort of :79.
    """
    t, r, s = F.col(table_col), F.col(region_col), F.col(size_col)
    w = Window.partitionBy(table_col)
    wo = w.orderBy(region_col)

    base = region_sizes.select(
        t.alias("table_name"),
        r.alias("region"),
        s.cast("double").alias("size"),
        F.count(F.lit(1)).over(w).alias("_n"),
        F.avg(s).over(w).alias("_avg"),
        F.lead(s.cast("double")).over(wo).alias("_next_size"),
        F.lead(r).over(wo).alias("_next_region"),
        F.row_number().over(wo).alias("_idx"),
    ).where(F.col("_n") >= min_region_count)

    flagged = base.select(
        "*",
        (F.col("size") > 2 * F.col("_avg")).alias("_is_split"),
        (
            ~(F.col("size") > 2 * F.col("_avg"))
            & F.col("_next_size").isNotNull()
            & (F.col("size") + F.col("_next_size") < F.col("_avg"))
        ).alias("_elig"),
    )

    splits = (
        flagged.where(F.lit(split_enabled) & F.col("_is_split")).select(
            "table_name",
            F.lit("SPLIT").alias("plan_type"),
            F.col("region").alias("region_a"),
            F.lit(None).cast(flagged.schema["region"].dataType).alias("region_b"),
            F.col("size").alias("size_a"),
            F.lit(None).cast("double").alias("size_b"),
            F.col("_idx").alias("_ord"),
            F.lit(0).alias("_prio"),
        )
        if split_enabled
        else None
    )

    # islands of consecutive eligible regions; merge starts are the
    # odd ranks within each island (the greedy walk enters every island
    # at its head and advances two per merge)
    elig = flagged.where(F.lit(merge_enabled) & F.col("_elig"))
    wi = Window.partitionBy("table_name").orderBy("_idx")
    merges = (
        elig.select("*", (F.col("_idx") - F.row_number().over(wi)).alias("_isl"))
        .select(
            "*",
            F.row_number()
            .over(Window.partitionBy("table_name", "_isl").orderBy("_idx"))
            .alias("_rk"),
        )
        .where(F.col("_rk") % 2 == 1)
        .select(
            "table_name",
            F.lit("MERGE").alias("plan_type"),
            F.col("region").alias("region_a"),
            F.col("_next_region").alias("region_b"),
            F.col("size").alias("size_a"),
            F.col("_next_size").alias("size_b"),
            F.col("_idx").alias("_ord"),
            F.lit(1).alias("_prio"),
        )
        if merge_enabled
        else None
    )

    if splits is None and merges is None:
        raise ValueError("split_enabled and merge_enabled are both False")
    plans = splits.unionByName(merges) if splits is not None and merges is not None else (splits or merges)

    ws = Window.partitionBy("table_name").orderBy("_prio", "_ord")
    return plans.select(
        "table_name",
        F.row_number().over(ws).alias("plan_seq"),
        "plan_type",
        "region_a",
        "region_b",
        "size_a",
        "size_b",
    )
