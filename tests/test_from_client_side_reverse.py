"""Round-11 port of TestFromClientSide's reversed-scan family
(TestFromClientSide.java:5633-6045) — the reverse x filter x tombstone
interplay, timely after this round's reversed-semantics fixes
(InclusiveStopFilter direction, reversed flag threading):
testSuperSimpleWithReverseScan:5633, testFiltersWithReverseScan:5678,
testKeyOnlyFilterWithReverseScan:5718,
testSimpleMissingWithReverseScan:5759, testNullWithReverseScan:5824,
testDeletesWithReverseScan:5861. The multi-region variants
(:6046/:6103) assert the same visible results across region
boundaries — physical layout here, collapsed into these.

Reference puts at server-now are given explicit increasing timestamps
(the reference sequences them in real time)."""

from __future__ import annotations

from hbase_1_3_0_spark.catalog import FamilyMeta, TableMeta
from hbase_1_3_0_spark.cells import (
    CELL_SCHEMA,
    TYPE_DELETE_COLUMN,
    TYPE_DELETE_FAMILY,
    TYPE_DELETE_VERSION,
    TYPE_PUT,
)
from hbase_1_3_0_spark.filters import ast
from hbase_1_3_0_spark.table import Scan, Table

FAM = "testFamily"
Q = b"testQualifier"
VAL = b"testValue"
ROW = b"testRow"
MAXV = 2**31 - 1


def _table(spark, cells, families=(FAM,), max_versions=1):
    return Table(
        TableMeta(
            name="t",
            families=tuple(
                FamilyMeta(name=f, max_versions=max_versions)
                for f in families
            ),
        ),
        spark.createDataFrame(cells, CELL_SCHEMA),
        now_ms=10_000,
    )


def _rows_in_order(df):
    """Distinct row keys of a scan result in DESCENDING key order (the
    reversed client iteration order)."""
    return sorted({bytes(r["row"]) for r in df.collect()}, reverse=True)


def test_super_simple_with_reverse_scan(spark):
    """:5633 — reversed scan [high, low) over interleaved b11111/b22222
    keys: the first row is the largest b11111 key (8), and the b22222
    group is outside the range."""
    keys = [b"0-b11111-%019d" % i for i in (0, 2, 4, 6, 8)]
    keys += [b"0-b22222-%019d" % i for i in (1, 3, 5, 7, 9)]
    t = _table(spark, [(k, FAM, Q, 100, TYPE_PUT, VAL, i)
                       for i, k in enumerate(keys)])
    got = _rows_in_order(t.scan(
        reversed=True,
        start_row=b"0-b11111-9223372036854775807",
        stop_row=b"0-b11111-%019d" % 0,
    ))
    assert got[0] == b"0-b11111-%019d" % 8
    # stop row exclusive: key 0 excluded; only the b11111 group in range
    assert got == [b"0-b11111-%019d" % i for i in (8, 6, 4, 2)]


def test_filters_with_reverse_scan(spark):
    """:5678 — QualifierFilter(EQUAL, regex col[1-5]) on a reversed
    scan: rows 5..1 in descending order, one cell each."""
    rows = [ROW + str(i).encode() for i in range(10)]
    quals = [b"col%d-<d2v1>-<d3v2>" % i for i in range(10)]
    t = _table(spark, [
        (rows[i], FAM, quals[i], 100, TYPE_PUT, VAL, i) for i in range(10)
    ])
    df = t.scan(
        reversed=True, families=(FAM,),
        filter=ast.QualifierFilter(
            ast.CompareOp.EQUAL, ast.RegexStringComparator("col[1-5]")),
    )
    got = sorted(
        ((bytes(r["row"]), bytes(r["qualifier"])) for r in df.collect()),
        reverse=True,
    )
    assert got == [(rows[i], quals[i]) for i in (5, 4, 3, 2, 1)]


def test_key_only_filter_with_reverse_scan(spark):
    """:5718 — KeyOnlyFilter(lenAsVal=true) on a reversed scan: every
    cell's value is the 4-byte length of the original value."""
    rows = [ROW + str(i).encode() for i in range(10)]
    quals = [b"col%d-<d2v1>-<d3v2>" % i for i in range(10)]
    t = _table(spark, [
        (rows[i], FAM, quals[i], 100, TYPE_PUT, VAL, i) for i in range(10)
    ])
    got = t.scan(
        reversed=True, families=(FAM,),
        filter=ast.KeyOnlyFilter(len_as_val=True),
    ).collect()
    assert len(got) == 10
    for r in got:
        assert bytes(r["value"]) == len(VAL).to_bytes(4, "big")


def test_simple_missing_with_reverse_scan(spark):
    """:5759 — reversed scans over an empty table and around a single
    row: empty ranges return nothing; ranges containing the row return
    it; the empty-row probe below it returns nothing."""
    rows = [ROW + str(i).encode() for i in range(4)]
    empty = _table(spark, [])
    assert _rows_in_order(empty.scan(reversed=True)) == []
    assert _rows_in_order(empty.scan(reversed=True, start_row=rows[0])) == []
    assert _rows_in_order(
        empty.scan(reversed=True, start_row=rows[0], stop_row=rows[1])
    ) == []
    assert _rows_in_order(empty.scan(reversed=True, families=(FAM,))) == []
    assert _rows_in_order(
        empty.scan(reversed=True, columns=((FAM, Q),))
    ) == []

    t = _table(spark, [(rows[2], FAM, Q, 100, TYPE_PUT, VAL, 0)])
    assert _rows_in_order(t.scan(reversed=True)) == [rows[2]]
    # reversed [start=high, stop=low): rows[3] down to above rows[0]
    assert _rows_in_order(
        t.scan(reversed=True, start_row=rows[3], stop_row=rows[0])
    ) == [rows[2]]
    assert _rows_in_order(
        t.scan(reversed=True, start_row=rows[2], stop_row=rows[1])
    ) == [rows[2]]
    # start below the row: nothing at or under rows[1]
    assert _rows_in_order(t.scan(reversed=True, start_row=rows[1])) == []


def test_null_with_reverse_scan(spark):
    """:5824 — NULL-qualifier column readable on a reversed scan, then
    masked by deleteColumns(FAMILY, null); a NULL VALUE round-trips."""
    t = _table(spark, [(ROW, FAM, None, 100, TYPE_PUT, VAL, 0)])
    got = t.scan(reversed=True, columns=((FAM, None),)).collect()
    assert len(got) == 1 and bytes(got[0]["value"]) == VAL
    t2 = _table(spark, [
        (ROW, FAM, None, 100, TYPE_PUT, VAL, 0),
        (ROW, FAM, None, 200, TYPE_DELETE_COLUMN, None, 1),
    ])
    assert t2.scan(reversed=True, columns=((FAM, None),)).collect() == []
    # null VALUE (distinct from a deleted cell)
    t3 = _table(spark, [(ROW, FAM, Q, 100, TYPE_PUT, None, 0)])
    got = t3.scan(reversed=True, columns=((FAM, Q),)).collect()
    assert len(got) == 1 and got[0]["value"] is None


def test_deletes_with_reverse_scan(spark):
    """:5861 — the tombstone battery viewed through reversed scans at
    table maxVersions=3."""
    F0, F1, F2 = "testFamily0", "testFamily1", "testFamily2"
    fams = (F0, F1, F2)
    ts = [1000, 2000, 3000, 4000, 5000]
    V = [b"testValue" + str(i).encode() for i in range(5)]
    rows = [ROW + str(i).encode() for i in range(6)]

    def t_of(cells):
        return _table(spark, cells, families=fams, max_versions=3)

    def rscan(t, row, **kw):
        return t.scan(Scan(
            reversed=True, start_row=row, stop_inclusive=False, **kw
        ))

    def versions(df, fam, qual, row=ROW):
        """One row's column versions — the reference reads the FIRST
        Result of the reversed scanner (getSingleScanResult), i.e. the
        scan's start row; lower rows in range are not consulted."""
        out = {}
        for r in df.collect():
            if bytes(r["row"]) != row:
                continue
            q = r["qualifier"]
            if r["family"] != fam:
                continue
            if (q is None) != (qual is None):
                continue
            if qual is not None and bytes(q) != qual:
                continue
            out[r["ts"]] = bytes(r["value"])
        return out

    # stage 1: two versions, deleteFamily at ts0 -> only ts1 (:5869-5884)
    cells = [
        (ROW, F0, Q, ts[0], TYPE_PUT, V[0], 0),
        (ROW, F0, Q, ts[1], TYPE_PUT, V[1], 1),
        (ROW, F0, None, ts[0], TYPE_DELETE_FAMILY, None, 2),
    ]
    got = versions(
        rscan(t_of(cells), ROW, families=(F0,), max_versions=MAXV), F0, Q
    )
    assert got == {ts[1]: V[1]}

    # stage 2: add ts2..ts4 on Q and the NULL qualifier; delete Q's
    # LATEST version (ts4 exact) -> {ts1, ts2, ts3} (:5886-5906)
    cells += [
        (ROW, F0, Q, ts[4], TYPE_PUT, V[4], 3),
        (ROW, F0, Q, ts[2], TYPE_PUT, V[2], 4),
        (ROW, F0, Q, ts[3], TYPE_PUT, V[3], 5),
        (ROW, F0, None, ts[4], TYPE_PUT, V[4], 6),
        (ROW, F0, None, ts[2], TYPE_PUT, V[2], 7),
        (ROW, F0, None, ts[3], TYPE_PUT, V[3], 8),
        (ROW, F0, Q, ts[4], TYPE_DELETE_VERSION, None, 9),
    ]
    got = versions(
        rscan(t_of(cells), ROW, columns=((F0, Q),), max_versions=MAXV),
        F0, Q,
    )
    assert got == {ts[1]: V[1], ts[2]: V[2], ts[3]: V[3]}

    # stage 3 (HBASE-1847 + cleanup): delete the null-qualifier column's
    # latest version, then the whole null-qualifier column; re-put at
    # tombstoned timestamps stays invisible (:5908-5936)
    cells += [
        (ROW, F0, None, ts[4], TYPE_DELETE_VERSION, None, 10),
        (ROW, F0, None, ts[4], TYPE_DELETE_COLUMN, None, 11),
        (ROW, F0, Q, ts[0], TYPE_PUT, V[0], 12),
        (ROW, F0, Q, ts[4], TYPE_PUT, V[4], 13),
    ]
    df = rscan(t_of(cells), ROW, families=(F0,), max_versions=MAXV)
    assert versions(df, F0, Q) == {ts[1]: V[1], ts[2]: V[2], ts[3]: V[3]}
    assert versions(df, F0, None) == {}

    # stage 4: family-vs-column deletes across three rows (:5939-6005)
    for i, r in enumerate(rows[:3]):
        cells += [
            (r, F1, Q, ts[0], TYPE_PUT, V[0], 20 + 10 * i),
            (r, F1, Q, ts[1], TYPE_PUT, V[1], 21 + 10 * i),
            (r, F2, Q, ts[2], TYPE_PUT, V[2], 22 + 10 * i),
            (r, F2, Q, ts[3], TYPE_PUT, V[3], 23 + 10 * i),
        ]
    cells += [
        # rows[0]: drop family 2 entirely
        (rows[0], F2, None, 8000, TYPE_DELETE_FAMILY, None, 50),
        # rows[1]: deleteColumns f1/Q (all versions)
        (rows[1], F1, Q, 8000, TYPE_DELETE_COLUMN, None, 51),
        # rows[2]: deleteColumn(f1,Q) TWICE with no ts — the reference
        # resolves the Nth duplicate marker to the Nth-NEWEST version
        # (HRegion.prepareDeleteTimestamps:2744-2772 kvCount +
        # get.setMaxVersions(count)), so the pair kills ts1 AND ts0 —
        # plus latest f2/Q (ts3)
        (rows[2], F1, Q, ts[1], TYPE_DELETE_VERSION, None, 52),
        (rows[2], F1, Q, ts[0], TYPE_DELETE_VERSION, None, 53),
        (rows[2], F2, Q, ts[3], TYPE_DELETE_VERSION, None, 54),
    ]
    t = t_of(cells)
    df = rscan(t, rows[0], families=(F1, F2), max_versions=MAXV)
    assert versions(df, F1, Q, row=rows[0]) == {ts[0]: V[0], ts[1]: V[1]}
    assert versions(df, F2, Q, row=rows[0]) == {}
    df = rscan(t, rows[1], families=(F1, F2), max_versions=MAXV)
    assert versions(df, F1, Q, row=rows[1]) == {}
    assert versions(df, F2, Q, row=rows[1]) == {ts[2]: V[2], ts[3]: V[3]}
    df = rscan(t, rows[2], families=(F1, F2), max_versions=MAXV)
    # reference: rows[2] ends with exactly ONE cell — f2/Q at ts2; the
    # double latest-delete on f1/Q killed ts1, and... the reference's
    # second deleteColumn resolves the NEW latest (ts0), so f1 is empty
    assert versions(df, F2, Q, row=rows[2]) == {ts[2]: V[2]}
    assert versions(df, F1, Q, row=rows[2]) == {}

    # stage 5 (HBASE-1541): family delete BEFORE any put; later put is
    # visible; the reversed scan returns rows[4] then rows[3]
    cells += [
        (rows[3], F1, None, 8000, TYPE_DELETE_FAMILY, None, 60),
        (rows[3], F2, Q, 9000, TYPE_PUT, V[0], 61),
        (rows[4], F1, Q, 9000, TYPE_PUT, V[1], 62),
        (rows[4], F2, Q, 9000, TYPE_PUT, V[2], 63),
    ]
    t = t_of(cells)
    df = t.scan(Scan(reversed=True, start_row=rows[4],
                     families=(F1, F2), max_versions=MAXV))
    per_row = {}
    for r in df.collect():
        per_row.setdefault(bytes(r["row"]), []).append(
            (r["family"], bytes(r["value"]))
        )
    assert sorted(per_row[rows[4]]) == [(F1, V[1]), (F2, V[2])]
    assert per_row[rows[3]] == [(F2, V[0])]
