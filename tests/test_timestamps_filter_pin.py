"""Round-11 pin of TestTimestampsFilter.java (384 LoC,
hbase-server/src/test/java/org/apache/hadoop/hbase/client/) —
TimestampsFilter x VERSIONS=MAX x column selection x version deletes.

The reference loops a per-(row,col) Get over a 5x5 grid; the verdict is
identical per cell, so each loop collapses here to ONE scan asserting
the full expected multiset (same semantics, 75 fewer jobs). Flush
variants are storage-physical and collapse to single runs.
"""

from __future__ import annotations

from hbase_1_3_0_spark.catalog import FamilyMeta, TableMeta
from hbase_1_3_0_spark.cells import (
    CELL_SCHEMA,
    TYPE_DELETE_VERSION,
    TYPE_PUT,
)
from hbase_1_3_0_spark.filters import ast
from hbase_1_3_0_spark.table import Get, Scan, Table

FAM = "event_log"
MAXV = 2**31 - 1


def _row(i):
    return b"row:" + str(i).encode()


def _col(i):
    return b"column:" + str(i).encode()


def _val(ts):
    return b"value-version-" + str(ts).encode()


def _table(spark, cells):
    return Table(
        TableMeta(name="t",
                  families=(FamilyMeta(name=FAM, max_versions=MAXV),)),
        spark.createDataFrame(cells, CELL_SCHEMA),
        now_ms=10_000,
    )


def _grid(version_ranges, seq0=0):
    """putNVersions over the 5x5 grid for each (start, end) range."""
    cells = []
    seq = seq0
    for r in range(5):
        for c in range(5):
            for lo, hi in version_ranges:
                for ts in range(lo, hi + 1):
                    cells.append(
                        (_row(r), FAM, _col(c), ts, TYPE_PUT, _val(ts), seq)
                    )
                    seq += 1
    return cells


def _got(df):
    return sorted(
        (bytes(r["row"]), bytes(r["qualifier"]), r["ts"])
        for r in df.collect()
    )


def _exp_grid(ts_list):
    return sorted(
        (_row(r), _col(c), ts)
        for r in range(5) for c in range(5) for ts in ts_list
    )


def _ts_scan(t, versions):
    return t.scan(Scan(
        filter=ast.TimestampsFilter(versions), max_versions=MAXV
    ))


def test_timestamps_filter(spark):
    """testTimestampsFilter (:93) — versions 1..100 + 201..300 first
    (verifyInsertedValues:258), then 101..200 + 301..400 added."""
    t = _table(spark, _grid([(1, 100), (201, 300)]))
    # versions that exist
    assert _got(_ts_scan(t, [5, 300, 6, 80])) == _exp_grid([5, 6, 80, 300])
    # versions that do not exist (the 101..200 hole)
    assert _got(_ts_scan(t, [101, 102])) == []
    # mixed exist / not-exist
    assert _got(_ts_scan(t, [1, 300, 105, 70, 115])) == _exp_grid(
        [1, 70, 300]
    )

    # add the second wave (:119-126): now 1..400 everywhere
    t = _table(spark, _grid([(1, 100), (201, 300)])
               + _grid([(101, 200), (301, 400)], seq0=500_000))
    assert _got(_ts_scan(t, [505, 5, 105, 305, 205])) == _exp_grid(
        [5, 105, 205, 305]
    )
    # empty timestamp list -> nothing (:142-144)
    assert _got(_ts_scan(t, [])) == []
    # scan form (:149-166): rows 0..4, ts {6,106,306} -> 3 versions x 5
    # columns per row
    got = _got(t.scan(Scan(
        start_row=_row(0), stop_row=_row(4) + b"\x00",
        filter=ast.TimestampsFilter([6, 106, 306]), max_versions=MAXV,
    )))
    assert got == _exp_grid([6, 106, 306])


def test_multi_columns(spark):
    """testMultiColumns (:169): TimestampsFilter({3}) + addColumn
    (column2, column4) — one ts-3 cell per selected column."""
    cells = [
        (b"row", FAM, b"column0", 3, TYPE_PUT, b"value0-3", 0),
        (b"row", FAM, b"column1", 3, TYPE_PUT, b"value1-3", 1),
        (b"row", FAM, b"column2", 1, TYPE_PUT, b"value2-1", 2),
        (b"row", FAM, b"column2", 2, TYPE_PUT, b"value2-2", 3),
        (b"row", FAM, b"column2", 3, TYPE_PUT, b"value2-3", 4),
        (b"row", FAM, b"column3", 2, TYPE_PUT, b"value3-2", 5),
        (b"row", FAM, b"column4", 1, TYPE_PUT, b"value4-1", 6),
        (b"row", FAM, b"column4", 2, TYPE_PUT, b"value4-2", 7),
        (b"row", FAM, b"column4", 3, TYPE_PUT, b"value4-3", 8),
    ]
    t = _table(spark, cells)
    got = sorted(
        (bytes(r["qualifier"]), bytes(r["value"]))
        for r in t.get(Get(
            b"row",
            columns=((FAM, b"column2"), (FAM, b"column4")),
            max_versions=MAXV,
            filter=ast.TimestampsFilter([3]),
        )).collect()
    )
    assert got == [(b"column2", b"value2-3"), (b"column4", b"value4-3")]


def test_with_version_deletes(spark):
    """testWithVersionDeletes (:228): versions 1..5, exact-ts delete of
    4; TimestampsFilter({2,3,4,5}) returns {5,3,2}."""
    cells = [
        (_row(0), FAM, _col(0), ts, TYPE_PUT, _val(ts), ts)
        for ts in range(1, 6)
    ]
    cells.append((_row(0), FAM, _col(0), 4, TYPE_DELETE_VERSION, None, 100))
    t = _table(spark, cells)
    got = _got(t.get(Get(
        _row(0), columns=((FAM, _col(0)),), max_versions=MAXV,
        filter=ast.TimestampsFilter([2, 3, 4, 5]),
    )))
    assert got == [(_row(0), _col(0), ts) for ts in (2, 3, 5)]
