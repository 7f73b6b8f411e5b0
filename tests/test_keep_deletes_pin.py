"""Round-11 pin of TestKeepDeletes.java's non-physical cases
(hbase-server/src/test/java/org/apache/hadoop/hbase/regionserver/,
978 LoC). Most of the suite pins COMPACTION marker-GC lifecycles
(flush/minor/major evolution — covered at the semantic level by
operators/jobs.compact's KDC branches and the r10 KDC time-travel
ports); pinned here are the scan-surface contracts:

* testRawScanWithColumns (:293) — raw + addColumn is rejected
  (StoreScanner.java:193, the ExplicitColumnTracker has no raw mode);
* testRawScan (:317) — raw scans return delete markers AND deleted
  rows, and honor the scan's timerange (markers outside it invisible);
* testWithoutKeepingDeletes (:239) — at KDC=FALSE a "past" timerange
  read does NOT see rows behind a newer delete marker.

A reference Delete(row, ts) with no specifics expands client-side to
one deleteFamily marker per family; the cell-log model writes those
markers explicitly.
"""

from __future__ import annotations

import pytest

from hbase_1_3_0_spark.catalog import FamilyMeta, TableMeta
from hbase_1_3_0_spark.cells import (
    CELL_SCHEMA,
    TYPE_DELETE_COLUMN,
    TYPE_DELETE_FAMILY,
    TYPE_DELETE_VERSION,
    TYPE_PUT,
)
from hbase_1_3_0_spark.table import Scan, Table

C0 = "c0"
T = [b"T%d" % i for i in range(7)]
ROW = b"T1-row"
MAXV = 2**31 - 1
TS = 10_000


def _table(spark, cells, kdc="TRUE"):
    return Table(
        TableMeta(
            name="t",
            families=(
                FamilyMeta(name=C0, max_versions=3, keep_deleted_cells=kdc),
            ),
        ),
        spark.createDataFrame(cells, CELL_SCHEMA),
        now_ms=100_000,
    )


def test_raw_scan_with_columns_rejected(spark):
    t = _table(spark, [(ROW, C0, b"q", TS, TYPE_PUT, T[1], 0)])
    with pytest.raises(ValueError, match="raw scan"):
        t.scan(raw=True, max_versions=MAXV, columns=((C0, b"q"),))
    # family selection stays allowed (the reference only rejects columns)
    assert t.scan(raw=True, max_versions=MAXV, families=(C0,)).count() == 1


def test_raw_scan_markers_and_timerange(spark):
    """testRawScan (:317), one-family form: puts at ts, ts+2, ts+4;
    deleteFamily@ts+1, deleteColumn(exact ts+2), deleteColumns@ts+3 —
    a raw scan sees all 6 cells; timerange [0,1) sees nothing (not even
    markers); [0, ts+2) sees the family marker + the ts put;
    [ts+3, ts+5) sees the ts+4 put + the deleteColumns marker."""
    q = b"q"
    cells = [
        (ROW, C0, q, TS, TYPE_PUT, T[1], 0),
        (ROW, C0, q, TS + 2, TYPE_PUT, T[2], 1),
        (ROW, C0, q, TS + 4, TYPE_PUT, T[3], 2),
        (ROW, C0, None, TS + 1, TYPE_DELETE_FAMILY, None, 3),
        (ROW, C0, q, TS + 2, TYPE_DELETE_VERSION, None, 4),
        (ROW, C0, q, TS + 3, TYPE_DELETE_COLUMN, None, 5),
    ]
    t = _table(spark, cells)

    def raw(tr=None):
        return sorted(
            (r["ts"], r["type"]) for r in
            t.scan(raw=True, max_versions=MAXV, time_range=tr).collect()
        )

    assert len(raw()) == 6
    assert raw((0, 1)) == []
    assert raw((0, TS + 2)) == [
        (TS, TYPE_PUT), (TS + 1, TYPE_DELETE_FAMILY),
    ]
    assert raw((TS + 3, TS + 5)) == [
        (TS + 3, TYPE_DELETE_COLUMN), (TS + 4, TYPE_PUT),
    ]


def test_without_keeping_deletes_past_read(spark):
    """testWithoutKeepingDeletes (:239): KDC=FALSE — a put at ts is
    visible to a [0, ts+1) read until a deleteColumn marker (written at
    ts+2, masking the exact put ts) hides it from the same past read."""
    cells = [(ROW, C0, b"q", TS, TYPE_PUT, T[1], 0)]
    t = _table(spark, cells, kdc="FALSE")
    assert t.scan(max_versions=MAXV, time_range=(0, TS + 1)).count() == 1

    cells.append((ROW, C0, b"q", TS, TYPE_DELETE_VERSION, None, 1))
    t = _table(spark, cells, kdc="FALSE")
    assert t.scan(max_versions=MAXV, time_range=(0, TS + 1)).count() == 0
