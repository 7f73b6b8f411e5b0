"""KV-encodings of the driver's TPC-H-ish tables (FIXTURES.md §F2).

One function: ``kv_cells(spark, sf_dir, name)`` -> the deterministic cell log
for ``<name>_kv``. Keys are order-preserving composites of the primary key;
``lineitem`` in the synthetic data has duplicate (l_orderkey, l_linenumber)
pairs, so its key gets a deterministic per-group ordinal third segment
(row_number over the duplicate group ordered by the remaining columns —
small partitions, no global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hbase_1_3_0_spark.sources.kv_encoder import table_to_cells

TABLE_KEYS: dict[str, list[str]] = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey", "l_linenumber", "_uniq"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.parquet carries TIMESTAMP(NANOS), which Spark's parquet
        # reader rejects; read as long nanos and truncate to micros. Integer
        # division, NOT /1000.0: epoch nanos (~1.7e18) exceed double's 2^53
        # integer precision, so float division rounds the microsecond.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def kv_cells(
    spark: SparkSession, sf_dir: str, name: str, *, family: str = "d"
) -> DataFrame:
    df = load_table(spark, sf_dir, name)
    key_cols = TABLE_KEYS[name]
    value_cols = list(df.columns)
    if name == "lineitem":
        others = [c for c in df.columns if c not in ("l_orderkey", "l_linenumber")]
        w = Window.partitionBy("l_orderkey", "l_linenumber").orderBy(
            *[F.col(c) for c in others]
        )
        df = df.withColumn("_uniq", F.row_number().over(w).cast("long"))
    return table_to_cells(df, key_cols, value_cols, family=family)
