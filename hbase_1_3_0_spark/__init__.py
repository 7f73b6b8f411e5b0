"""hbase_1_3_0_spark — a PySpark-native analytics engine with the query surface
of Apache HBase 1.3.0 (reference: Zzzzzb1995/hbase-1.3.0, read-only at
/root/reference).

This is NOT a port of the Java region-server engine. The storage truth is a
single narrow "cell log" DataFrame (see `cells.CELL_SCHEMA`); every reference
operator — Get/Scan with the full filter algebra, the four tombstone kinds,
maxVersions/TTL read-view semantics, Increment/Append/checkAndMutate RMW,
the coprocessor aggregation surface, and the MapReduce-analog batch jobs —
is a declarative DataFrame transformation over it, so Catalyst supplies
predicate pushdown, partition pruning, and whole-stage codegen for free.

Scale design (100 TB target):
- cell logs are range-partitioned by ``row`` and sorted
  ``(row, family, qualifier, ts desc)`` within files, so row-range scans prune
  partitions/row-groups exactly like HBase region + HFile-index pruning
  (SURVEY.md §4).
- the read view has a groupBy/`max_by` fast path for max_versions=1 (map-side
  partial aggregation, no window sort) and a single window pass otherwise.
- delete-marker resolution joins are left to AQE, which broadcasts the (tiny)
  marker side at runtime.
"""

from hbase_1_3_0_spark.catalog import Catalog, TableMeta
from hbase_1_3_0_spark.cells import (
    CELL_SCHEMA,
    TYPE_DELETE_COLUMN,
    TYPE_DELETE_FAMILY,
    TYPE_DELETE_FAMILY_VERSION,
    TYPE_DELETE_VERSION,
    TYPE_PUT,
)
from hbase_1_3_0_spark.engine import Engine
from hbase_1_3_0_spark.table import Table

__all__ = [
    "CELL_SCHEMA",
    "Catalog",
    "Engine",
    "Table",
    "TableMeta",
    "TYPE_PUT",
    "TYPE_DELETE_VERSION",
    "TYPE_DELETE_FAMILY_VERSION",
    "TYPE_DELETE_COLUMN",
    "TYPE_DELETE_FAMILY",
]

__version__ = "0.1.0"
