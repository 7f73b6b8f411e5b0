"""Round-11 pin of TestMultipleTimestamps.java (549 LoC,
hbase-server/src/test/java/org/apache/hadoop/hbase/client/) — the
timerange x maxVersions x tombstone interplay suite at
VERSIONS=Integer.MAX_VALUE.

The load-bearing semantic these cases pin: ``setMaxVersions(n)`` counts
versions among the TIMERANGE-SURVIVING cells (testReseeksWith
MultipleColumnMultipleTimestamp expects ts {3,2} at maxVersions=2 over
range [2,4) when newer out-of-range versions {4,5} exist — counting
before the range would return nothing), and the four delete kinds mask
before any of it. Flush/reseek/multi-file variants collapse to one
logical case each (storage layout is physical); the
flush-vs-memstore twin runs are a single run here.
"""

from __future__ import annotations

from hbase_1_3_0_spark.catalog import FamilyMeta, TableMeta
from hbase_1_3_0_spark.cells import (
    CELL_SCHEMA,
    TYPE_DELETE_COLUMN,
    TYPE_DELETE_FAMILY,
    TYPE_DELETE_VERSION,
    TYPE_PUT,
)
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


def _puts(rows, cols, versions, seq0=0):
    """The put() helper (:467): every (row, col, version) triple."""
    out = []
    seq = seq0
    for r in rows:
        for c in cols:
            for v in versions:
                out.append((_row(r), FAM, _col(c), v, TYPE_PUT, _val(v), seq))
                seq += 1
    return out


def _scan(t, rows, cols, versions, max_versions):
    """The scan() helper (:446): [row:min, row:(max+1)), addColumn per
    col, timerange [min(v), max(v)+1), setMaxVersions(n)."""
    return t.scan(Scan(
        start_row=_row(min(rows)),
        stop_row=_row(max(rows) + 1),
        columns=tuple((FAM, _col(c)) for c in cols),
        time_range=(min(versions), max(versions) + 1),
        max_versions=max_versions,
    ))


def _got(df):
    return sorted(
        (bytes(r["row"]), bytes(r["qualifier"]), r["ts"],
         bytes(r["value"]))
        for r in df.collect()
    )


def _exp(triples):
    return sorted(
        (_row(r), _col(c), ts, _val(ts)) for r, c, ts in triples
    )


def test_reseeks_with_one_column_multiple_timestamp(spark):
    """:83 — rows {1,3,5,7} x cols {1,3,5} x ts 1..5; scan rows {3,5},
    col 3, ts {3,4}, maxVersions=2 -> (3,3,4),(3,3,3),(5,3,4),(5,3,3)."""
    t = _table(spark, _puts([1, 3, 5, 7], [1, 3, 5], [1, 2, 3, 4, 5]))
    got = _got(_scan(t, [3, 5], [3], [3, 4], 2))
    assert got == _exp([(3, 3, 4), (3, 3, 3), (5, 3, 4), (5, 3, 3)])


def test_reseeks_with_multiple_column_one_timestamp(spark):
    """:124 — scan rows {3,5}, cols {3,4} (4 absent), ts {3},
    maxVersions=2 -> one cell per row at ts 3."""
    t = _table(spark, _puts([1, 3, 5, 7], [1, 3, 5], [1, 2, 3, 4, 5]))
    got = _got(_scan(t, [3, 5], [3, 4], [3], 2))
    assert got == _exp([(3, 3, 3), (5, 3, 3)])


def test_reseeks_with_multiple_column_multiple_timestamp(spark):
    """:164 — scan rows {5,7}, cols {3,4,5}, ts {2,3}, maxVersions=2:
    the 2 newest IN-RANGE versions (3,2) of cols 3 and 5 per row —
    version counting happens AFTER timerange filtering (newer
    out-of-range versions 4,5 do not consume the two slots)."""
    t = _table(spark, _puts([1, 3, 5, 7], [1, 3, 5], [1, 2, 3, 4, 5]))
    got = _got(_scan(t, [5, 7], [3, 4, 5], [2, 3], 2))
    assert got == _exp([
        (5, 3, 3), (5, 3, 2), (5, 5, 3), (5, 5, 2),
        (7, 3, 3), (7, 3, 2), (7, 5, 3), (7, 5, 2),
    ])


def test_reseeks_with_multiple_files(spark):
    """:219 — three put batches (the reference flushes between them to
    force multiple HFiles; storage layout is physical here), scan rows
    {3,5,7} -> range [row:3, row:8) which also admits row 6; cols
    {3,4,5}, ts {2,4}, maxVersions=5."""
    cells = _puts([1, 2, 3], [2, 5, 6], [1, 2, 5])
    cells += _puts([6, 7], [3, 6], [4, 5], seq0=1000)
    cells += _puts([2, 3, 5], [1, 2, 3], [4, 8], seq0=2000)
    t = _table(spark, cells)
    got = _got(_scan(t, [3, 5, 7], [3, 4, 5], [2, 4], 5))
    assert got == _exp([
        (3, 3, 4), (3, 5, 2),   # row 3: col3 ts4 (batch 3), col5 ts2
        (5, 3, 4),              # row 5: col3 ts4
        (6, 3, 4),              # row 6 sits inside [row:3, row:8)
        (7, 3, 4),
    ])


def _get_versions(t, row_idx, col_idx, versions):
    """getNVersions (:432): addColumn + setMaxVersions() + timerange
    [min, max+1)."""
    df = t.get(Get(
        _row(row_idx),
        columns=((FAM, _col(col_idx)),),
        max_versions=MAXV,
        time_range=(min(versions), max(versions) + 1),
    ))
    return _got(df)


def test_with_version_deletes(spark):
    """:288 — versions 1..5, exact-ts delete of version 4; get over
    [2,6) returns {5,3,2}."""
    cells = _puts([0], [0], [1, 2, 3, 4, 5])
    cells.append((_row(0), FAM, _col(0), 4, TYPE_DELETE_VERSION, None, 100))
    t = _table(spark, cells)
    assert _get_versions(t, 0, 0, [2, 3, 4, 5]) == _exp(
        [(0, 0, 5), (0, 0, 3), (0, 0, 2)]
    )


def test_with_multiple_version_deletes(spark):
    """:322 — deleteColumns(ts=4) masks everything at ts <= 4; get over
    [2,4) returns nothing."""
    cells = _puts([0], [0], [1, 2, 3, 4, 5])
    cells.append((_row(0), FAM, _col(0), 4, TYPE_DELETE_COLUMN, None, 100))
    t = _table(spark, cells)
    assert _get_versions(t, 0, 0, [2, 3]) == []


def test_with_column_deletes(spark):
    """:350 — deleteColumns() with no ts masks at the delete's server
    time (now > every put ts); get over [2,4) returns nothing."""
    cells = _puts([0], [0], [1, 2, 3, 4, 5])
    cells.append((_row(0), FAM, _col(0), 9_000, TYPE_DELETE_COLUMN,
                  None, 100))
    t = _table(spark, cells)
    assert _get_versions(t, 0, 0, [2, 3]) == []


def test_with_family_deletes(spark):
    """:376 — deleteFamily masks the whole family up to the marker ts."""
    cells = _puts([0], [0], [1, 2, 3, 4, 5])
    cells.append((_row(0), FAM, None, 9_000, TYPE_DELETE_FAMILY,
                  None, 100))
    t = _table(spark, cells)
    assert _get_versions(t, 0, 0, [2, 3]) == []
