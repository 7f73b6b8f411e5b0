"""Batch analytics jobs — the MapReduce surface re-expressed (SURVEY.md §2.4).

Each reference job collapses to a short declarative pipeline; region-count
parallelism (TableInputFormat: one split per region, TableInputFormat.java:49)
is replaced by Spark's file-split parallelism over the range-partitioned
parquet cell log.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hbase_1_3_0_spark.cells import CELL_COLUMNS, CELL_SCHEMA, TYPE_PUT
from hbase_1_3_0_spark.operators.read_view import read_view
from hbase_1_3_0_spark.sources import kv_encoder, writer


def row_counter(
    cells: DataFrame,
    *,
    start_row: bytes | None = None,
    stop_row: bytes | None = None,
) -> DataFrame:
    """RowCounter (RowCounter.java:44): count distinct visible rows; uses the
    FirstKeyOnly idea (:153) — here countDistinct, partial-aggregated."""
    df = cells
    if start_row is not None:
        df = df.where(F.col("row") >= F.lit(start_row))
    if stop_row is not None:
        df = df.where(F.col("row") < F.lit(stop_row))
    visible = read_view(df, max_versions=1)
    return visible.select(F.countDistinct("row").alias("rows"))


def cell_counter(cells: DataFrame) -> DataFrame:
    """CellCounter (CellCounter.java:72, counters at :142-172): per
    (family, qualifier) cell + version counts over the raw log."""
    return (
        cells.where(F.col("type") == TYPE_PUT)
        .groupBy("family", F.decode(F.col("qualifier"), "UTF-8").alias("qualifier"))
        .agg(
            F.count(F.lit(1)).alias("cells"),
            F.countDistinct("row").alias("rows"),
            F.countDistinct("row", "ts").alias("versions"),
        )
    )


def export_table(
    cells: DataFrame,
    path: str | Path,
    *,
    max_versions: int = 1,
    time_range: tuple[int, int] | None = None,
    raw: bool = False,
) -> None:
    """Export (Export.java:52): dump visible cells (versions/timerange args)
    as range-partitioned parquet."""
    out = read_view(cells, max_versions=max_versions, time_range=time_range, raw=raw)
    writer.write_cells(out, path)


def import_table(spark: SparkSession, path: str | Path) -> DataFrame:
    """Import (Import.java:85): read an export back as a cell log."""
    return writer.read_cells(spark, path)


def import_tsv(
    spark: SparkSession,
    path: str | Path,
    columns: list[str],
    *,
    family: str = "d",
    sep: str = "\t",
    ts: int = kv_encoder.DEFAULT_TS,
) -> DataFrame:
    """ImportTsv (ImportTsv.java:79): parse TSV/CSV into Put cells.

    ``columns`` mirrors the -Dimporttsv.columns spec: entries are qualifier
    names, with 'HBASE_ROW_KEY' marking the row-key column (composite keys:
    repeat HBASE_ROW_KEY for each key part)."""
    names = [
        f"_k{i}" if c == "HBASE_ROW_KEY" else c for i, c in enumerate(columns)
    ]
    schema = T.StructType([T.StructField(n, T.StringType()) for n in names])
    df = spark.read.csv(str(path), sep=sep, schema=schema)
    key_cols = [n for n in names if n.startswith("_k")]
    value_cols = [n for n in names if not n.startswith("_k")]
    return kv_encoder.table_to_cells(
        df, key_cols, value_cols, family=family, ts=ts
    )


def copy_table(
    cells: DataFrame,
    *,
    start_row: bytes | None = None,
    stop_row: bytes | None = None,
    time_range: tuple[int, int] | None = None,
    rename_family: dict[str, str] | None = None,
) -> DataFrame:
    """CopyTable (CopyTable.java:55): range/timerange slice with optional CF
    rename — read -> transform -> (caller writes)."""
    df = cells
    if start_row is not None:
        df = df.where(F.col("row") >= F.lit(start_row))
    if stop_row is not None:
        df = df.where(F.col("row") < F.lit(stop_row))
    if time_range is not None:
        df = df.where(
            (F.col("ts") >= time_range[0]) & (F.col("ts") < time_range[1])
        )
    if rename_family:
        mapping = F.create_map(
            *[x for k, v in rename_family.items() for x in (F.lit(k), F.lit(v))]
        )
        df = df.withColumn(
            "family", F.coalesce(mapping[F.col("family")], F.col("family"))
        )
    return df.select(*CELL_COLUMNS)


def hash_table(cells: DataFrame, *, num_buckets: int = 1024) -> DataFrame:
    """HashTable (HashTable.java:64): partition-wise content hashes.

    Buckets rows by key hash and xors cell hashes within the bucket — an
    order-independent bucket digest (xxhash64 per cell; commutative combine),
    so two tables can be diffed by comparing ~num_buckets rows instead of
    the full data."""
    visible = read_view(cells, max_versions=1)
    cell_hash = F.xxhash64("row", "family", "qualifier", "ts", "value")
    bucket = F.pmod(F.xxhash64("row"), F.lit(num_buckets))
    # xor-fold via sum of (hash mod large prime) is not collision-safe enough;
    # use bit_xor aggregate (order-independent, exact)
    return (
        visible.select(bucket.alias("bucket"), cell_hash.alias("h"))
        .groupBy("bucket")
        .agg(F.bit_xor("h").alias("digest"), F.count(F.lit(1)).alias("cells"))
    )


def sync_table(
    source: DataFrame,
    target: DataFrame,
    *,
    hash_prefilter: bool = False,
    num_buckets: int = 1024,
) -> DataFrame:
    """SyncTable (SyncTable.java:56): compute the mutation stream that makes
    ``target`` identical to ``source`` — a distributed diff/merge.

    Full-outer join of the two read views on (row,family,qualifier):
    source-only or value/ts-mismatched -> put; target-only -> delete_column.

    ``hash_prefilter=True`` is the reference's actual two-phase algorithm
    (HashTable then sync only differing ranges, SyncTable.java:56): compare
    per-bucket digests first and full-outer-join ONLY rows of differing
    buckets. Worth it when diffs are sparse/localized (the steady-state
    replication-repair case at 100 TB: most buckets match, the big join
    shrinks to the diff neighborhoods); for dense diffs the direct join
    does strictly less work, hence the default."""
    if hash_prefilter:
        hs = hash_table(source, num_buckets=num_buckets)
        ht = hash_table(target, num_buckets=num_buckets)
        changed = (
            hs.withColumnRenamed("digest", "s_d")
            .withColumnRenamed("cells", "s_c")
            .join(
                ht.withColumnRenamed("digest", "t_d").withColumnRenamed(
                    "cells", "t_c"
                ),
                "bucket",
                "full_outer",
            )
            .where(
                F.col("s_d").isNull()
                | F.col("t_d").isNull()
                | (F.col("s_d") != F.col("t_d"))
                | (F.col("s_c") != F.col("t_c"))
            )
            .select("bucket")
        )
        bucket = F.pmod(F.xxhash64("row"), F.lit(num_buckets))
        source = source.withColumn("_bk", bucket).join(
            F.broadcast(changed.withColumnRenamed("bucket", "_bk")),
            "_bk",
            "left_semi",
        ).drop("_bk")
        target = target.withColumn("_bk", bucket).join(
            F.broadcast(changed.withColumnRenamed("bucket", "_bk")),
            "_bk",
            "left_semi",
        ).drop("_bk")
    s = read_view(source, max_versions=1).select(
        "row", "family", "qualifier",
        F.col("ts").alias("s_ts"), F.col("value").alias("s_value"),
    )
    t = read_view(target, max_versions=1).select(
        "row", "family", "qualifier",
        F.col("ts").alias("t_ts"), F.col("value").alias("t_value"),
    )
    joined = s.join(t, ["row", "family", "qualifier"], "full_outer")
    return (
        joined.where(
            F.col("s_value").isNull()
            | F.col("t_value").isNull()
            | (F.col("s_value") != F.col("t_value"))
        )
        .select(
            "row",
            "family",
            "qualifier",
            F.when(F.col("s_value").isNull(), F.lit("delete_column"))
            .otherwise(F.lit("put"))
            .alias("op"),
            F.col("s_value").alias("value"),
            F.coalesce(F.col("s_ts"), F.col("t_ts")).alias("ts"),
        )
    )


def grouping_table_map(cells: DataFrame, qualifiers: list[bytes]) -> DataFrame:
    """GroupingTableMapper (GroupingTableMapper.java:42): key each row by the
    concatenation of selected column values -> groupBy-ready key column."""
    visible = read_view(cells, max_versions=1)
    q = F.col("qualifier")
    per_row = visible.groupBy("row").agg(
        *[
            F.max(F.when(q == F.lit(qq), F.col("value"))).alias(f"_g{i}")
            for i, qq in enumerate(qualifiers)
        ]
    )
    return per_row.select(
        "row",
        F.concat_ws(
            " ", *[F.decode(F.col(f"_g{i}"), "UTF-8") for i in range(len(qualifiers))]
        ).alias("group_key"),
    )


def compact(
    cells: DataFrame,
    *,
    max_versions: int = 1,
    min_versions: int = 0,
    ttl_seconds: int | None = None,
    keep_deleted_cells: str = "FALSE",
    now_ms: int | None = None,
) -> DataFrame:
    """Major compaction: rewrite the log keeping only visible cells — drops
    tombstones, masked/over-version/expired cells. Shares the read-view code
    exactly as the reference shares ScanQueryMatcher in non-user-scan mode
    (StoreScanner.java:268-271; SURVEY.md §2.5)."""
    from hbase_1_3_0_spark.cells import TTL_FOREVER

    return read_view(
        cells,
        max_versions=max_versions,
        min_versions=min_versions,
        ttl_seconds=ttl_seconds if ttl_seconds is not None else TTL_FOREVER,
        keep_deleted_cells=keep_deleted_cells,
        now_ms=now_ms,
    )
