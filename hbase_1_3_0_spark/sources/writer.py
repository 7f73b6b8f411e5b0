"""Cell-log writer: the bulk-load physical layout.

Reference: HFileOutputFormat2 + LoadIncrementalHFiles bulk load
(HFileOutputFormat2.java:93, LoadIncrementalHFiles.java:114) total-order
partitions and sorts cells before writing; Spark's
``repartitionByRange('row')`` IS total-order partitioning
(SimpleTotalOrderPartitioner analog), and ``sortWithinPartitions`` gives
each file the KVComparator order so parquet min/max stats on ``row``/``ts``
reproduce HFile key-range + timerange pruning (StoreFile.passesKeyRangeFilter
:1478, TimeRangeTracker.java:46). Parquet bloom filter on ``row`` = the ROW
bloom (StoreFile.passesGeneralBloomFilter:1378).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hbase_1_3_0_spark.cells import CELL_SCHEMA


def write_cells(
    cells: DataFrame,
    path: str | Path,
    *,
    num_partitions: int | None = None,
    mode: str = "overwrite",
) -> None:
    df = cells
    if num_partitions:
        df = df.repartitionByRange(num_partitions, "row")
    else:
        df = df.repartitionByRange("row")
    df = df.sortWithinPartitions(
        F.col("row").asc(),
        F.col("family").asc(),
        F.col("qualifier").asc(),
        F.col("ts").desc(),
        F.col("seq").desc(),
    )
    (
        df.write.mode(mode)
        .option("parquet.bloom.filter.enabled#row", "true")
        .option("parquet.bloom.filter.expected.ndv#row", "1000000")
        .parquet(str(path))
    )


def read_cells(spark: SparkSession, path: str | Path) -> DataFrame:
    return spark.read.schema(CELL_SCHEMA).parquet(str(path))
