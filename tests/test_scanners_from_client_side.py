"""Round-11 pin of TestScannersFromClientSide.java (682 LoC,
hbase-server/src/test/java/org/apache/hadoop/hbase/client/) — scanner
parameter interplay: Scan.setBatch partial Results against a family
tombstone + multi-version column, and the per-CF rowOffset /
maxResultsPerColumnFamily battery COMPOSED with cell filters (the
reference applies the filter FIRST, then offset/limit per family —
TestScannersFromClientSide.java:484 testGetRowOffset's
ColumnRangeFilter case).

NOT PINNED (physical, no analog): testMaxResultSizeIsSetToDefault
(ClientScanner RPC cache sizing), testScanOnReopenedRegion (region
lifecycle), testSmallScan's setSmall/setMaxResultSize/setCaching
variants (pure transport hints — the visible contract, identical
counts forward and reversed, is covered by the offset/limit tests'
full-result assertions and the TestFilter reverse pins).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hbase_1_3_0_spark.catalog import FamilyMeta, TableMeta
from hbase_1_3_0_spark.cells import (
    CELL_SCHEMA,
    TYPE_DELETE_FAMILY,
    TYPE_PUT,
)
from hbase_1_3_0_spark.filters import ast
from hbase_1_3_0_spark.table import Get, Scan, Table

ROW = b"testRow"
FAMILY = "testFamily"
VALUE = b"testValue"


def _q(i):
    return b"testQualifier" + str(i).encode()


def _fam(i):
    return f"testFamily{i}"


def _table(spark, cells, families, max_versions=1):
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


def _kvs(df):
    return sorted(
        (bytes(r["row"]), r["family"], bytes(r["qualifier"]), r["ts"])
        for r in df.collect()
    )


def test_scan_batch(spark):
    """testScanBatch (:110): 8 columns at ts 0..7 plus an OLDER re-put of
    c6 at ts=2, then deleteFamily(ts=3) masking everything at ts <= 3 —
    visible set c4:4, c5:5, c6:6, c7:7 (the c6 ts=2 version dies under
    the family marker while its ts=6 version survives); setBatch(2)
    splits the row into two partial Results [c4,c5] / [c6,c7]."""
    cells = [
        (ROW, FAMILY, _q(i), i, TYPE_PUT, VALUE, i) for i in range(8)
    ]
    cells.append((ROW, FAMILY, _q(6), 2, TYPE_PUT, VALUE, 8))
    cells.append((ROW, FAMILY, None, 3, TYPE_DELETE_FAMILY, None, 9))
    t = _table(spark, cells, [FAMILY], max_versions=10)

    # without batch: the full visible row
    got = _kvs(t.scan(start_row=ROW, stop_row=ROW, stop_inclusive=True,
                      max_versions=2**31 - 1))
    assert got == [(ROW, FAMILY, _q(i), i) for i in range(4, 8)]

    # with batch=2: two partial Results in intra-row cell order
    batched = t.scan_batched(
        batch=2, start_row=ROW, stop_row=ROW, stop_inclusive=True,
        max_versions=2**31 - 1,
    )
    groups: dict[int, list] = {}
    for r in batched.collect():
        groups.setdefault(r["result_id"], []).append(
            (bytes(r["qualifier"]), r["ts"])
        )
    assert {k: sorted(v) for k, v in groups.items()} == {
        0: [(_q(4), 4), (_q(5), 5)],
        1: [(_q(6), 6), (_q(7), 7)],
    }


def _max_results_fixture(spark):
    """testGetMaxResults fixture (:314): CF0 carries q0..q9, CF1 q0..q9,
    CF2 q0..q19, all at ts=1 on one row."""
    cells = []
    seq = 0
    for i in range(10):
        cells.append((ROW, _fam(0), _q(i), 1, TYPE_PUT, VALUE, seq)); seq += 1
    for i in range(20):
        cells.append((ROW, _fam(2), _q(i), 1, TYPE_PUT, VALUE, seq)); seq += 1
    for i in range(10):
        cells.append((ROW, _fam(1), _q(i), 1, TYPE_PUT, VALUE, seq)); seq += 1
    return _table(spark, cells, [_fam(0), _fam(1), _fam(2)])


def _lex(qis):
    """Qualifiers for the given indices in LEXICOGRAPHIC byte order (the
    intra-CF paging order: testQualifier1 < testQualifier10 < ...2)."""
    return sorted(_q(i) for i in qis)


def test_get_max_results(spark):
    """testGetMaxResults (:314): per-CF LIMIT, alone and composed with
    ColumnRangeFilter / ColumnPrefixFilter (the limit counts cells the
    FILTER let through, in lexicographic qualifier order per family)."""
    t = _max_results_fixture(spark)

    # without maxResults: everything (only CF0 inserted at that point in
    # the reference; here assert the full 40-cell row instead)
    assert len(_kvs(t.get(Get(ROW)))) == 40

    # basic: first 2 of CF0 in lex order
    got = _kvs(
        t.scan(start_row=ROW, stop_row=ROW, stop_inclusive=True,
               families=(_fam(0),), max_results_per_cf=2)
    )
    assert got == [(ROW, _fam(0), q, 1) for q in _lex(range(10))[:2]]

    # limit 5 + ColumnRangeFilter [q2, q5]: the filter passes q2..q5
    # (4 cells, lex-contiguous single digits) and the limit doesn't bind
    got = _kvs(t.scan(
        start_row=ROW, stop_row=ROW, stop_inclusive=True,
        families=(_fam(0),), max_results_per_cf=5,
        filter=ast.ColumnRangeFilter(_q(2), True, _q(5), True),
    ))
    assert got == [(ROW, _fam(0), _q(i), 1) for i in (2, 3, 4, 5)]

    # multiple CFs, limit 12: CF1 returns all 10, CF2 its first 12 in
    # lex order (q0, q1, q10..q19)
    got = _kvs(t.scan(
        start_row=ROW, stop_row=ROW, stop_inclusive=True,
        families=(_fam(1), _fam(2)), max_results_per_cf=12,
    ))
    exp = [(ROW, _fam(1), q, 1) for q in _lex(range(10))]
    exp += [(ROW, _fam(2), q, 1) for q in _lex(range(20))[:12]]
    assert got == sorted(exp)

    # limit 3 + open-ended ColumnRangeFilter [q2, inf): per family the
    # first 3 passing cells in lex order. Lex order of q0..q9 is
    # q0,q1,q2,..; >= q2 leaves q2..q9 -> q2,q3,q4. For CF2 lex order
    # puts q2 after q10..q19, so >= q2 leaves only q2..q9 as well...
    # (byte-compare: b"testQualifier10" < b"testQualifier2") -> the
    # range filter [q2, None] admits q2..q9 only; first 3 = q2,q3,q4
    got = _kvs(t.scan(
        start_row=ROW, stop_row=ROW, stop_inclusive=True,
        max_results_per_cf=3,
        filter=ast.ColumnRangeFilter(_q(2), True, None, True),
    ))
    exp = [
        (ROW, _fam(c), _q(i), 1) for c in range(3) for i in (2, 3, 4)
    ]
    assert got == sorted(exp)

    # limit 7 + ColumnPrefixFilter(q1): prefix "testQualifier1" matches
    # q1 and q10..q19; CF0/CF1 have just q1, CF2 gets its first 7
    got = _kvs(t.scan(
        start_row=ROW, stop_row=ROW, stop_inclusive=True,
        max_results_per_cf=7,
        filter=ast.ColumnPrefixFilter(_q(1)),
    ))
    exp = [(ROW, _fam(0), _q(1), 1), (ROW, _fam(1), _q(1), 1)]
    exp += [
        (ROW, _fam(2), q, 1)
        for q in sorted([_q(1)] + [_q(i) for i in range(10, 20)])[:7]
    ]
    assert got == sorted(exp)


def test_scan_max_results(spark):
    """testScanMaxResults (:434): scan-level maxResultsPerColumnFamily=4
    over 2 rows x 3 CFs x 10 qualifiers — first 4 lex qualifiers per
    (row, family)."""
    rows = [b"testRow" + str(r).encode() for r in range(2)]
    cells = []
    seq = 0
    for row in rows:
        for c in range(3):
            for qi in range(10):
                cells.append(
                    (row, _fam(c), _q(qi), 1, TYPE_PUT, VALUE, seq)
                )
                seq += 1
    t = _table(spark, cells, [_fam(c) for c in range(3)])
    got = _kvs(t.scan(max_results_per_cf=4))
    exp = [
        (row, _fam(c), q, 1)
        for row in rows
        for c in range(3)
        for q in _lex(range(10))[:4]
    ]
    assert got == sorted(exp)


def test_get_row_offset(spark):
    """testGetRowOffset (:484): per-CF OFFSET, alone, past-the-end,
    composed with per-CF limit, composed with ColumnRangeFilter (offset
    skips cells the filter PASSED — q2..q5 minus one = q3,q4,q5), and
    multi-CF offset+limit."""
    t = _max_results_fixture(spark)

    def scan_row(**kw):
        return _kvs(t.scan(
            start_row=ROW, stop_row=ROW, stop_inclusive=True, **kw
        ))

    lex0 = _lex(range(10))
    # offset 2 on CF0: skip the first two lex qualifiers
    got = scan_row(families=(_fam(0),), row_offset_per_cf=2)
    assert got == [(ROW, _fam(0), q, 1) for q in lex0[2:]]

    # offset past the end: empty
    assert scan_row(families=(_fam(0),), row_offset_per_cf=20) == []

    # offset 4 + limit 5: lex positions 5..9
    got = scan_row(
        families=(_fam(0),), row_offset_per_cf=4, max_results_per_cf=5
    )
    assert got == [(ROW, _fam(0), q, 1) for q in lex0[4:9]]

    # offset 1 + ColumnRangeFilter [q2, q5]: filter first (q2..q5),
    # offset skips q2 -> q3, q4, q5
    got = scan_row(
        families=(_fam(0),), row_offset_per_cf=1,
        filter=ast.ColumnRangeFilter(_q(2), True, _q(5), True),
    )
    assert got == [(ROW, _fam(0), _q(i), 1) for i in (3, 4, 5)]

    # multi-CF offset 4 + limit 2: lex positions 5..6 per family
    got = scan_row(
        families=(_fam(1), _fam(2)), row_offset_per_cf=4,
        max_results_per_cf=2,
    )
    exp = [(ROW, _fam(1), q, 1) for q in lex0[4:6]]
    exp += [(ROW, _fam(2), q, 1) for q in _lex(range(20))[4:6]]
    assert got == sorted(exp)


def test_intra_row_pagination_scan_limit_and_offset(spark):
    """TestIntraRowPagination.java:50 testScanLimitAndOffset — scan-level
    rowOffsetPerColumnFamily=1 + maxResultsPerColumnFamily=3 over
    2 rows x 3 families x 10 qualifiers: lex positions 1..3 per
    (row, family)."""
    rows = [b"testRow" + str(r).encode() for r in range(2)]
    cells = []
    seq = 0
    for row in rows:
        for c in range(3):
            for qi in range(10):
                cells.append(
                    (row, _fam(c), _q(qi), 1, TYPE_PUT, VALUE, seq)
                )
                seq += 1
    t = _table(spark, cells, [_fam(c) for c in range(3)])
    got = _kvs(t.scan(row_offset_per_cf=1, max_results_per_cf=3))
    exp = [
        (row, _fam(c), q, 1)
        for row in rows
        for c in range(3)
        for q in _lex(range(10))[1:4]
    ]
    assert got == sorted(exp)
