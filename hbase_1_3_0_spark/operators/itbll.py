"""IntegrationTestBigLinkedList analog — the reference's flagship
at-scale correctness harness (hbase-it/src/test/java/org/apache/hadoop/
hbase/test/IntegrationTestBigLinkedList.java).

The reference job has two query-shaped halves:

* **Generator** (:253) writes circular linked lists: each node row
  stores a ``prev`` pointer to the preceding node
  (COLUMN_PREV, :206); the first node of a wrap is first persisted
  with ``prev = NO_KEY`` and re-persisted once the wrap completes,
  closing the circle (:481 ``persist(output, -1, prev, first, null)``).
* **Verify** (:997) is one map-reduce self-join: the mapper emits
  ``(row, DEF)`` for every scanned node plus ``(prev, row)`` for every
  non-empty prev pointer (VerifyMapper.map :1019-1037 — an empty prev
  is "not set", no reference emitted); the reducer (:1121-1196) then
  classifies every key:

  ==============  =============================================
  REFERENCED      defined and referenced at least once
  UNREFERENCED    defined, zero references
  UNDEFINED       not defined but referenced — data LOSS
  EXTRAREFERENCES references beyond the first on a defined node
  ==============  =============================================

  "REFERENCED and UNREFERENCED are ok, any UNDEFINED counts are bad"
  (:176-178).

Spark-first shape: generation is ONE window pass partitioned by list id
(lag for the chain, an unordered max for the circle close — a single
shuffle on the list id); verification is ONE aggregation of references
plus ONE full-outer join on the node key — the exact shuffle the
reference's reduce phase pays, with AQE free to broadcast whichever
side is small after kills.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

REFERENCED = "REFERENCED"
UNREFERENCED = "UNREFERENCED"
UNDEFINED = "UNDEFINED"


def generate_chains(
    keys: DataFrame, key_col: str = "key", *, n_lists: int = 25
) -> DataFrame:
    """Lay circular linked lists over a key set (Generator analog).

    Keys are dealt into ``n_lists`` lists by ``key % n_lists``; within a
    list (ascending key order) every node's ``prev`` points to the
    preceding node and the first node points to the last — the closed
    circle the reference's Generator produces once the wrap's final
    ``persist`` lands (IntegrationTestBigLinkedList.java:465-491).

    Returns ``(key, list_id, prev)``. One shuffle (the window partition
    on list_id); at cluster scale each list is independent, so skew is
    bounded by the largest list, not the corpus.
    """
    k = F.col(key_col)
    g = (k % F.lit(n_lists)).alias("list_id")
    w = Window.partitionBy("list_id").orderBy("key")
    wg = Window.partitionBy("list_id")
    return (
        keys.select(k.alias("key"), g)
        .withColumn(
            "prev",
            F.coalesce(F.lag("key").over(w), F.max("key").over(wg)),
        )
    )


def verify_chains(
    nodes: DataFrame,
    key_col: str = "key",
    prev_col: str = "prev",
) -> DataFrame:
    """Classify every key of a (key, prev) node table (Verify analog).

    ``prev`` NULL means "not set" — no reference is emitted for it,
    mirroring VerifyMapper's empty-prev branch (:1031-1036). Node keys
    are assumed unique (the reference's reducer carries a TODO for the
    multi-def case, :1143). Returns ``(key, status, nrefs)`` where
    status follows VerifyReducer (:1121-1196) and ``nrefs`` exposes the
    EXTRAREFERENCES count (nrefs - 1 on a defined, referenced node).
    """
    defs = nodes.select(F.col(key_col).alias("key")).withColumn(
        "_defined", F.lit(True)
    )
    refs = (
        nodes.where(F.col(prev_col).isNotNull())
        .groupBy(F.col(prev_col).alias("key"))
        .agg(F.count("*").alias("nrefs"))
    )
    joined = defs.join(refs, "key", "full_outer")
    defined = F.coalesce(F.col("_defined"), F.lit(False))
    nrefs = F.coalesce(F.col("nrefs"), F.lit(0).cast("long"))
    status = (
        F.when(defined & (nrefs > 0), F.lit(REFERENCED))
        .when(defined, F.lit(UNREFERENCED))
        .otherwise(F.lit(UNDEFINED))
    )
    return joined.select(
        "key", status.alias("status"), nrefs.alias("nrefs")
    )


def verify_counts(verdicts: DataFrame) -> DataFrame:
    """Roll the per-key verdicts up to the reference's counter set
    (Counts enum :1045): one row per status plus the EXTRAREFERENCES
    total (sum of references beyond the first on defined nodes)."""
    extra = F.sum(
        F.when(
            (F.col("status") == REFERENCED) & (F.col("nrefs") > 1),
            F.col("nrefs") - 1,
        ).otherwise(F.lit(0))
    )
    return verdicts.groupBy("status").agg(
        F.count("*").alias("n"),
        extra.cast("long").alias("extra_references"),
    )
