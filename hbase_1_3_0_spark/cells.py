"""The Cell: the atomic unit of the engine.

Reference: the versioned KV quintuple ``(row, family, qualifier, ts, type) ->
value`` (hbase-common/.../Cell.java:70, KeyValue.java:84). Cells sort by
``(row asc, family asc, qualifier asc, ts DESC, type desc)``
(KeyValue.java KVComparator, compareRows at KeyValue.java:2110-2123); ``seq``
is the MVCC sequence-id analog (Cell.java:169) used as the tie-break for equal
timestamps within a batch.

Cell type codes mirror KeyValue.Type (KeyValue.java:226-235). Four distinct
tombstone kinds exist; their masking semantics are implemented declaratively
in :mod:`hbase_1_3_0_spark.operators.read_view`.
"""

from __future__ import annotations

from pyspark.sql import types as T

# KeyValue.Type codes (KeyValue.java:226-235)
TYPE_MINIMUM = 0
TYPE_PUT = 4
TYPE_DELETE_VERSION = 8  # Delete: masks exactly one (row,family,qualifier,ts)
TYPE_DELETE_FAMILY_VERSION = 10  # masks all columns of the family at one exact ts
TYPE_DELETE_COLUMN = 12  # masks all versions of one column with ts <= marker ts
TYPE_DELETE_FAMILY = 14  # masks all cells of the family with ts <= marker ts
TYPE_MAXIMUM = 255

DELETE_TYPES = (
    TYPE_DELETE_VERSION,
    TYPE_DELETE_FAMILY_VERSION,
    TYPE_DELETE_COLUMN,
    TYPE_DELETE_FAMILY,
)

# Timestamp sentinels (HConstants.java:528,538)
LATEST_TIMESTAMP = (1 << 63) - 1  # Long.MAX_VALUE
OLDEST_TIMESTAMP = -(1 << 63)

# TTL sentinel: HColumnDescriptor default TTL = FOREVER (HConstants.java:564)
TTL_FOREVER = 2**31 - 1

#: The cell-log schema — the storage truth for every table (SURVEY.md §7).
#: ``row`` and ``qualifier`` are binary (HBase keys are arbitrary byte[]);
#: Spark's BinaryType comparison is unsigned-lexicographic, the same order as
#: Bytes.compareTo (Bytes.java:1240), so range predicates translate directly.
CELL_SCHEMA = T.StructType(
    [
        T.StructField("row", T.BinaryType(), False),
        T.StructField("family", T.StringType(), False),
        T.StructField("qualifier", T.BinaryType(), True),
        T.StructField("ts", T.LongType(), False),
        T.StructField("type", T.IntegerType(), False),
        T.StructField("value", T.BinaryType(), True),
        T.StructField("seq", T.LongType(), False),
    ]
)

CELL_COLUMNS = [f.name for f in CELL_SCHEMA.fields]
