"""Wide (relational) tables <-> cell log, entirely JVM-side.

This is the fixture path of FIXTURES.md §F2: each TPC-H-ish parquet table gets
a deterministic cell-log encoding (`<name>_kv`) — ``row`` = order-preserving
composite key of the primary key, one Put cell per column with
``qualifier = column name`` and ``value =`` the canonical UTF-8 rendering
(decodable with a plain cast; see functions/codecs.py). It doubles as the
``ImportTsv``-style ingest mapping (ImportTsv.java:79: column spec with
``HBASE_ROW_KEY``) for any relational source.

Both directions are pure Column expressions (explode / conditional agg):
no Python UDFs, so encode+decode of a 100 TB table stays inside
whole-stage codegen. The decode direction uses a single hash aggregation
(groupBy row + max(when(qualifier==c))) rather than ``pivot`` — one shuffle,
map-side combined.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hbase_1_3_0_spark.cells import CELL_COLUMNS, TYPE_PUT
from hbase_1_3_0_spark.functions import codecs

DEFAULT_TS = 1_000_000


def row_key_for(df: DataFrame, key_cols: list[str]) -> Column:
    """Order-preserving binary row key from the primary-key columns."""
    segments = []
    for c in key_cols:
        dt = df.schema[c].dataType
        if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
            segments.append(codecs.key_segment_num(F.col(c)))
        else:
            segments.append(F.col(c).cast(T.StringType()))
    return codecs.ordered_key(*segments)


def table_to_cells(
    df: DataFrame,
    key_cols: list[str],
    value_cols: list[str] | None = None,
    *,
    family: str = "d",
    ts: int | Column = DEFAULT_TS,
    seq: int | Column = 0,
) -> DataFrame:
    """Melt a wide table into Put cells (one cell per column per row)."""
    if value_cols is None:
        value_cols = list(df.columns)
    ts_col = ts if isinstance(ts, Column) else F.lit(ts).cast(T.LongType())
    seq_col = seq if isinstance(seq, Column) else F.lit(seq).cast(T.LongType())
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("q"),
                codecs.encode_value(F.col(c)).alias("v"),
            )
            for c in value_cols
        ]
    )
    return (
        df.select(
            row_key_for(df, key_cols).alias("row"),
            ts_col.alias("ts"),
            seq_col.alias("seq"),
            F.explode(entries).alias("e"),
        )
        .select(
            "row",
            F.lit(family).alias("family"),
            F.encode(F.col("e.q"), "UTF-8").alias("qualifier"),
            "ts",
            F.lit(TYPE_PUT).alias("type"),
            F.col("e.v").alias("value"),
            "seq",
        )
        .select(*CELL_COLUMNS)
    )


def cells_to_result_map(cells: DataFrame) -> DataFrame:
    """The dynamic-schema Result layout (Result.getMap, Result.java:681):
    one row per row key with
    ``result: map<family, map<qualifier, array<struct<ts, value>>>>``,
    version arrays newest-first (the NavigableMap descending ts order).

    For qualifiers unknown ahead of time — the wide pivot
    (:func:`cells_to_table`) needs a declared column list; this doesn't.
    Two hash aggregations keyed on prefixes of the natural (row, family,
    qualifier) clustering; no windows, no Python."""
    # sort on (ts, seq) so same-ts duplicates tie-break on sequence id —
    # the mvcc ordering the reference and read_view use — then project the
    # seq away; sorting struct(ts, value) would tie-break on value bytes
    per_col = cells.groupBy("row", "family", "qualifier").agg(
        F.transform(
            F.reverse(
                F.array_sort(F.collect_list(F.struct("ts", "seq", "value")))
            ),
            lambda s: F.struct(
                s.getField("ts").alias("ts"),
                s.getField("value").alias("value"),
            ),
        ).alias("_versions")
    )
    # no array_sort at the map levels: structs holding maps/arrays are not
    # orderable, and map semantics don't depend on entry order
    per_family = per_col.groupBy("row", "family").agg(
        F.map_from_entries(
            F.collect_list(F.struct("qualifier", "_versions"))
        ).alias("_qmap")
    )
    return per_family.groupBy("row").agg(
        F.map_from_entries(
            F.collect_list(F.struct("family", "_qmap"))
        ).alias("result")
    )


def cells_to_table(
    cells: DataFrame,
    columns: dict[str, T.DataType | str],
    *,
    family: str | None = None,
) -> DataFrame:
    """Re-assemble visible cells into a wide typed row (Result.getMap analog,
    Result.java:681 — but pivoted to a fixed schema).

    ``columns`` maps column name -> Spark type. Missing cells yield NULL.
    One hash aggregation; no pivot metadata pass.
    """
    src = cells
    if family is not None:
        src = src.where(F.col("family") == family)
    q = F.decode(F.col("qualifier"), "UTF-8")
    aggs = [
        F.max(
            F.when(q == c, codecs.decode_value(F.col("value"), dt))
        ).alias(c)
        for c, dt in columns.items()
    ]
    return src.groupBy("row").agg(*aggs)
