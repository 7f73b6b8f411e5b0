"""Round-11 pin of TestFilter.java itself, method-for-method
(/root/reference/hbase-server/src/test/java/org/apache/hadoop/hbase/
filter/TestFilter.java, 2145 LoC — "Test filters at the HRegion
doorstep", the largest golden-behavior source in the filter dir;
VERDICT r10 next-round #1).

The shared fixture replays setUp() exactly (TestFilter.java:135-218)
as a cell log: first-half puts, second-half reverse-family puts, then
deleteColumns tombstones for qualifier index 1 everywhere and for ALL
columns of row index 1 in both groups — so every scan below also
exercises tombstone masking BEFORE the filter, the composition the
per-filter pinned classes never touch. Net visible state: 6 rows
(indices 0,2,3 of each group) x 2 families x 3 qualifiers = 6 cols/row
(numRows=6, colsPerRow=6).

verifyScan / verifyScanNoEarlyOut both assert (row count, keys per
row) of the visible result — the early-out distinction is a physical
scanner property with no analog here; verifyScanFull pins the exact
(row, family, qualifier, value) multiset.

NOT PINNED (no analog, documented): testRegionScannerReseek (drives
the RegionScanner.reseek physical API — Spark has no stateful scanner
cursor); tes94FilterRowCompatibility + SlowScanFilter (custom Java
Filter subclasses exercising the 0.94 protocol shim / RPC handler
sleeps).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hbase_1_3_0_spark.catalog import FamilyMeta, TableMeta
from hbase_1_3_0_spark.cells import (
    CELL_SCHEMA,
    TYPE_DELETE_COLUMN,
    TYPE_PUT,
)
from hbase_1_3_0_spark.filters import ast
from hbase_1_3_0_spark.table import Scan, Table

# ---------------------------------------------------------------------------
# fixture (TestFilter.java:75-218)
# ---------------------------------------------------------------------------

ROWS_ONE = [b"testRowOne-" + str(i).encode() for i in range(4)]
ROWS_TWO = [b"testRowTwo-" + str(i).encode() for i in range(4)]
FAM = ["testFamilyOne", "testFamilyTwo"]
Q_ONE = [b"testQualifierOne-" + str(i).encode() for i in range(4)]
Q_TWO = [b"testQualifierTwo-" + str(i).encode() for i in range(4)]
V = [b"testValueOne", b"testValueTwo"]

NUM_ROWS = 6  # 8 - the two fully-deleted index-1 rows
COLS_PER_ROW = 6  # 2 families x (4 - 1 deleted) qualifiers

T1, T2, T3, T4 = 1000, 2000, 3000, 4000


def _base_cells():
    """The setUp() mutation log (put ts T1/T2, deleteColumns at T3)."""
    cells = []
    seq = 0

    def put(row, fam, qual, val, ts):
        nonlocal seq
        seq += 1
        cells.append((row, fam, qual, ts, TYPE_PUT, val, seq))

    def del_col(row, fam, qual, ts):
        nonlocal seq
        seq += 1
        cells.append((row, fam, qual, ts, TYPE_DELETE_COLUMN, None, seq))

    # first half (:149-163)
    for row in ROWS_ONE:
        for q in Q_ONE:
            put(row, FAM[0], q, V[0], T1)
    for row in ROWS_TWO:
        for q in Q_TWO:
            put(row, FAM[1], q, V[1], T1)
    # second half, reverse families (:168-183)
    for row in ROWS_ONE:
        for q in Q_ONE:
            put(row, FAM[1], q, V[0], T2)
    for row in ROWS_TWO:
        for q in Q_TWO:
            put(row, FAM[0], q, V[1], T2)
    # delete qualifier index 1 from all rows and families (:186-197)
    for row in ROWS_ONE:
        del_col(row, FAM[0], Q_ONE[1], T3)
        del_col(row, FAM[1], Q_ONE[1], T3)
    for row in ROWS_TWO:
        del_col(row, FAM[0], Q_TWO[1], T3)
        del_col(row, FAM[1], Q_TWO[1], T3)
    # delete row index 1 of both groups, one column at a time (:200-212)
    for q in Q_ONE:
        del_col(ROWS_ONE[1], FAM[0], q, T3)
        del_col(ROWS_ONE[1], FAM[1], q, T3)
    for q in Q_TWO:
        del_col(ROWS_TWO[1], FAM[0], q, T3)
        del_col(ROWS_TWO[1], FAM[1], q, T3)
    return cells


def _table(spark, cells, families=FAM):
    return Table(
        TableMeta(
            name="TestFilter",
            families=tuple(FamilyMeta(name=f) for f in families),
        ),
        spark.createDataFrame(cells, CELL_SCHEMA),
        now_ms=10_000,
    )


@pytest.fixture(scope="module")
def t(spark):
    return _table(spark, _base_cells())


# ---------------------------------------------------------------------------
# verify helpers (TestFilter.java:1657 verifyScan / :1678 NoEarlyOut /
# :1700 verifyScanFull / :1731 verifyScanFullNoValues)
# ---------------------------------------------------------------------------


def _collect(df):
    return sorted(
        (
            bytes(r["row"]),
            r["family"],
            bytes(r["qualifier"]),
            None if r["value"] is None else bytes(r["value"]),
        )
        for r in df.collect()
    )


def verify_scan(df, expected_rows, expected_keys):
    got = _collect(df)
    per_row: dict[bytes, int] = {}
    for row, *_ in got:
        per_row[row] = per_row.get(row, 0) + 1
    assert len(per_row) == expected_rows, (
        f"expected {expected_rows} rows, scanned {len(per_row)}: "
        f"{sorted(per_row)}"
    )
    for row, n in per_row.items():
        assert n == expected_keys, (
            f"expected {expected_keys} keys per row, {row!r} returned {n}"
        )


def verify_scan_full(df, kvs):
    assert _collect(df) == sorted(kvs)


def kv(row, fam, qual, val):
    return (row, fam, qual, val)


def _row_cells(row, fam_idx=None, quals=(0, 2, 3)):
    """All visible cells of a fixture row (optionally one family)."""
    group_q, val = (Q_ONE, V[0]) if row.startswith(b"testRowOne") else (
        Q_TWO, V[1]
    )
    fams = FAM if fam_idx is None else [FAM[fam_idx]]
    return [kv(row, f, group_q[i], val) for f in fams for i in quals]


LIVE_ROWS = [ROWS_ONE[0], ROWS_ONE[2], ROWS_ONE[3],
             ROWS_TWO[0], ROWS_TWO[2], ROWS_TWO[3]]


def _all_cells(rows=None, fam_idx=None, quals=(0, 2, 3)):
    out = []
    for row in (rows if rows is not None else LIVE_ROWS):
        out += _row_cells(row, fam_idx, quals)
    return out


# ---------------------------------------------------------------------------
# testNoFilter (:293)
# ---------------------------------------------------------------------------


def test_no_filter(t):
    verify_scan(t.scan(), NUM_ROWS, COLS_PER_ROW)
    verify_scan(t.scan(families=(FAM[0],)), NUM_ROWS, COLS_PER_ROW // 2)


# ---------------------------------------------------------------------------
# testPrefixFilter (:309) / testPrefixFilterWithReverseScan (:319)
# ---------------------------------------------------------------------------


def test_prefix_filter(t):
    s = t.scan(filter=ast.PrefixFilter(b"testRowOne"))
    verify_scan(s, NUM_ROWS // 2, COLS_PER_ROW)
    verify_scan_full(s, _all_cells(rows=[ROWS_ONE[0], ROWS_ONE[2], ROWS_ONE[3]]))


def test_prefix_filter_with_reverse_scan(t):
    s = t.scan(reversed=True, filter=ast.PrefixFilter(b"testRowOne"))
    verify_scan(s, NUM_ROWS // 2, COLS_PER_ROW)


# ---------------------------------------------------------------------------
# testPageFilter (:330) — pages 6/4/2/1 with the exact KV prefix table
# ---------------------------------------------------------------------------


def test_page_filter(t):
    # the expectedKVs table (:333-378) is the fixture's 6 live rows in
    # row order; page N = the first N rows' cells
    for n in (6, 4, 2, 1):
        s = t.scan(filter=ast.PageFilter(n))
        verify_scan(s, n, COLS_PER_ROW)
        verify_scan_full(s, _all_cells(rows=LIVE_ROWS[:n]))


def test_page_filter_with_reverse_scan(t):
    # :417 pins counts only; the reversed page is the LAST n rows (the
    # first n encountered in descending key order)
    for n in (6, 4, 2, 1):
        s = t.scan(reversed=True, filter=ast.PageFilter(n))
        verify_scan(s, n, COLS_PER_ROW)
        verify_scan_full(s, _all_cells(rows=LIVE_ROWS[-n:]))


# ---------------------------------------------------------------------------
# testWhileMatchFilterWithFilterRow (:563) + WithReverseScan (:497):
# WhileMatch(PageFilter(4)) returns exactly pageSize rows
# ---------------------------------------------------------------------------


def test_while_match_filter_with_filter_row(t):
    f = ast.WhileMatchFilter(ast.PageFilter(4))
    s = t.scan(filter=f)
    verify_scan(s, 4, COLS_PER_ROW)
    verify_scan_full(s, _all_cells(rows=LIVE_ROWS[:4]))


def test_while_match_filter_with_filter_row_with_reverse_scan(t):
    f = ast.WhileMatchFilter(ast.PageFilter(4))
    s = t.scan(reversed=True, filter=f)
    verify_scan(s, 4, COLS_PER_ROW)
    verify_scan_full(s, _all_cells(rows=LIVE_ROWS[-4:]))


# ---------------------------------------------------------------------------
# testWhileMatchFilterWithFilterRowKey (:642) + WithReverseScan (:527):
# WhileMatch(PrefixFilter) truncates at the first non-prefix row
# ---------------------------------------------------------------------------


def test_while_match_filter_with_filter_row_key(t):
    f = ast.WhileMatchFilter(ast.PrefixFilter(b"testRowOne"))
    s = t.scan(filter=f)
    # prefix rows lead the key order; scan stops at testRowTwo-0
    verify_scan_full(s, _all_cells(rows=LIVE_ROWS[:3]))


def test_while_match_filter_with_filter_row_key_with_reverse_scan(t):
    f = ast.WhileMatchFilter(ast.PrefixFilter(b"testRowOne"))
    s = t.scan(reversed=True, filter=f)
    # reversed: the FIRST row scanned (testRowTwo-3) already fails the
    # prefix, so filterAllRemaining fires immediately — zero rows (the
    # reference loop asserts filterAllRemaining on the first miss)
    assert _collect(s) == []


# ---------------------------------------------------------------------------
# testWhileMatchFilterWithFilterKeyValue (:671): WhileMatch(SCVF) —
# the first row's tested column fails (value != 'foo'), NEXT_ROW fires
# filterAllRemaining, scan ends with zero rows
# ---------------------------------------------------------------------------


def test_while_match_filter_with_filter_key_value(t):
    f = ast.WhileMatchFilter(
        ast.SingleColumnValueFilter(
            FAM[0], Q_ONE[0], ast.CompareOp.EQUAL,
            ast.BinaryComparator(b"foo"),
        )
    )
    assert _collect(t.scan(filter=f)) == []


# ---------------------------------------------------------------------------
# testInclusiveStopFilter (:690) + WithReverseScan (:725)
# ---------------------------------------------------------------------------


def test_inclusive_stop_filter(t):
    # plain [start, stop) drops the stop row
    s = t.scan(start_row=b"testRowOne-0", stop_row=b"testRowOne-3")
    verify_scan(s, NUM_ROWS // 2 - 1, COLS_PER_ROW)
    # start row + InclusiveStopFilter keeps it
    s = t.scan(start_row=b"testRowOne-0",
               filter=ast.InclusiveStopFilter(b"testRowOne-3"))
    verify_scan(s, NUM_ROWS // 2, COLS_PER_ROW)

    s = t.scan(start_row=b"testRowTwo-0", stop_row=b"testRowTwo-3")
    verify_scan(s, NUM_ROWS // 2 - 1, COLS_PER_ROW)
    s = t.scan(start_row=b"testRowTwo-0",
               filter=ast.InclusiveStopFilter(b"testRowTwo-3"))
    verify_scan(s, NUM_ROWS // 2, COLS_PER_ROW)


def test_inclusive_stop_filter_with_reverse_scan(t):
    # reversed scan: start is the HIGH key, stop the LOW one; the
    # reference reuses InclusiveStopFilter with the LOW row, meaning
    # "stop AT (and include) this row going down" — visible set =
    # [stop_low, start_high] inclusive
    s = t.scan(reversed=True, start_row=b"testRowOne-3",
               stop_row=b"testRowOne-0")
    verify_scan(s, NUM_ROWS // 2 - 1, COLS_PER_ROW)
    s = t.scan(reversed=True, start_row=b"testRowOne-3",
               filter=ast.InclusiveStopFilter(b"testRowOne-0"))
    verify_scan(s, NUM_ROWS // 2, COLS_PER_ROW)

    s = t.scan(reversed=True, start_row=b"testRowTwo-3",
               stop_row=b"testRowTwo-0")
    verify_scan(s, NUM_ROWS // 2 - 1, COLS_PER_ROW)
    s = t.scan(reversed=True, start_row=b"testRowTwo-3",
               filter=ast.InclusiveStopFilter(b"testRowTwo-0"))
    verify_scan(s, NUM_ROWS // 2, COLS_PER_ROW)


# ---------------------------------------------------------------------------
# testQualifierFilter (:762) — the CompareOp battery + two KV tables
# ---------------------------------------------------------------------------


def test_qualifier_filter(t):
    def qf(op, comparator):
        return ast.QualifierFilter(op, comparator)

    bc = ast.BinaryComparator
    # EQUAL 'testQualifierOne-2': one qual in each family, group one only
    verify_scan(t.scan(filter=qf(ast.CompareOp.EQUAL, bc(Q_ONE[2]))),
                NUM_ROWS // 2, 2)
    # LESS: only One-0 remains below One-2 (One-1 deleted)
    verify_scan(t.scan(filter=qf(ast.CompareOp.LESS, bc(Q_ONE[2]))),
                NUM_ROWS // 2, 2)
    # LESS_OR_EQUAL: One-0, One-2
    verify_scan(t.scan(filter=qf(ast.CompareOp.LESS_OR_EQUAL, bc(Q_ONE[2]))),
                NUM_ROWS // 2, 4)
    # NOT_EQUAL, scan limited to group one
    verify_scan(
        t.scan(stop_row=b"testRowTwo",
               filter=qf(ast.CompareOp.NOT_EQUAL, bc(Q_ONE[2]))),
        NUM_ROWS // 2, 4)
    # GREATER_OR_EQUAL, group one
    verify_scan(
        t.scan(stop_row=b"testRowTwo",
               filter=qf(ast.CompareOp.GREATER_OR_EQUAL, bc(Q_ONE[2]))),
        NUM_ROWS // 2, 4)
    # GREATER, group one
    verify_scan(
        t.scan(stop_row=b"testRowTwo",
               filter=qf(ast.CompareOp.GREATER, bc(Q_ONE[2]))),
        NUM_ROWS // 2, 2)
    # NOT_EQUAL across both groups: 4 keys/row in group one (One-2
    # excluded), all 6 in group two
    s = t.scan(filter=qf(ast.CompareOp.NOT_EQUAL, bc(Q_ONE[2])))
    expected = (
        _all_cells(rows=[ROWS_ONE[0], ROWS_ONE[2], ROWS_ONE[3]],
                   quals=(0, 3))
        + _all_cells(rows=[ROWS_TWO[0], ROWS_TWO[2], ROWS_TWO[3]])
    )
    verify_scan_full(s, expected)
    # NOT_EQUAL regex 'test.+-2': drops the -2 qual of BOTH groups
    s = t.scan(filter=qf(ast.CompareOp.NOT_EQUAL,
                         ast.RegexStringComparator("test.+-2")))
    verify_scan_full(s, _all_cells(quals=(0, 3)))


# ---------------------------------------------------------------------------
# testFamilyFilter (:920)
# ---------------------------------------------------------------------------


def test_family_filter(t):
    def ff(op, comparator):
        return ast.FamilyFilter(op, comparator)

    bc = ast.BinaryComparator
    verify_scan(t.scan(filter=ff(ast.CompareOp.EQUAL, bc(b"testFamilyOne"))),
                NUM_ROWS, COLS_PER_ROW // 2)
    # LESS 'testFamily' (a strict prefix of both family names): nothing
    assert _collect(t.scan(filter=ff(ast.CompareOp.LESS,
                                     bc(b"testFamily")))) == []
    verify_scan(
        t.scan(filter=ff(ast.CompareOp.LESS_OR_EQUAL, bc(b"testFamilyOne"))),
        NUM_ROWS, COLS_PER_ROW // 2)
    verify_scan(
        t.scan(stop_row=b"testRowTwo",
               filter=ff(ast.CompareOp.NOT_EQUAL, bc(b"testFamilyOne"))),
        NUM_ROWS // 2, COLS_PER_ROW // 2)
    verify_scan(
        t.scan(stop_row=b"testRowTwo",
               filter=ff(ast.CompareOp.GREATER_OR_EQUAL,
                         bc(b"testFamilyOne"))),
        NUM_ROWS // 2, COLS_PER_ROW)
    verify_scan(
        t.scan(stop_row=b"testRowTwo",
               filter=ff(ast.CompareOp.GREATER, bc(b"testFamilyOne"))),
        NUM_ROWS // 2, COLS_PER_ROW // 2)
    # NOT_EQUAL testFamilyTwo: family-one cells of every row
    s = t.scan(filter=ff(ast.CompareOp.NOT_EQUAL, bc(b"testFamilyTwo")))
    verify_scan_full(s, _all_cells(fam_idx=0))
    # NOT_EQUAL regex 'test.*One': family-two cells of every row
    s = t.scan(filter=ff(ast.CompareOp.NOT_EQUAL,
                         ast.RegexStringComparator("test.*One")))
    verify_scan_full(s, _all_cells(fam_idx=1))


# ---------------------------------------------------------------------------
# testRowFilter (:1055)
# ---------------------------------------------------------------------------


def test_row_filter(t):
    def rf(op, comparator):
        return ast.RowFilter(op, comparator)

    bc = ast.BinaryComparator
    verify_scan(t.scan(filter=rf(ast.CompareOp.EQUAL, bc(b"testRowOne-2"))),
                1, COLS_PER_ROW)
    verify_scan(
        t.scan(filter=rf(ast.CompareOp.EQUAL,
                         ast.RegexStringComparator("testRow.+-2"))),
        2, COLS_PER_ROW)
    # LESS: only testRowOne-0 sorts below -2 (row index 1 deleted)
    verify_scan(t.scan(filter=rf(ast.CompareOp.LESS, bc(b"testRowOne-2"))),
                1, COLS_PER_ROW)
    verify_scan(
        t.scan(filter=rf(ast.CompareOp.LESS_OR_EQUAL, bc(b"testRowOne-2"))),
        2, COLS_PER_ROW)
    verify_scan(
        t.scan(filter=rf(ast.CompareOp.NOT_EQUAL, bc(b"testRowOne-2"))),
        NUM_ROWS - 1, COLS_PER_ROW)
    verify_scan(
        t.scan(filter=rf(ast.CompareOp.GREATER_OR_EQUAL,
                         bc(b"testRowOne-2"))),
        NUM_ROWS - 1, COLS_PER_ROW)
    verify_scan(t.scan(filter=rf(ast.CompareOp.GREATER, bc(b"testRowOne-2"))),
                NUM_ROWS - 2, COLS_PER_ROW)
    # NOT_EQUAL full table
    s = t.scan(filter=rf(ast.CompareOp.NOT_EQUAL, bc(b"testRowOne-2")))
    verify_scan_full(
        s, _all_cells(rows=[r for r in LIVE_ROWS if r != ROWS_ONE[2]])
    )
    # EQUAL regex '.+-2' full table
    s = t.scan(filter=rf(ast.CompareOp.EQUAL,
                         ast.RegexStringComparator(".+-2")))
    verify_scan_full(s, _all_cells(rows=[ROWS_ONE[2], ROWS_TWO[2]]))


# ---------------------------------------------------------------------------
# testValueFilter (:1202)
# ---------------------------------------------------------------------------


def test_value_filter(t):
    def vf(op, comparator):
        return ast.ValueFilter(op, comparator)

    bc = ast.BinaryComparator
    verify_scan(t.scan(filter=vf(ast.CompareOp.EQUAL, bc(V[0]))),
                NUM_ROWS // 2, COLS_PER_ROW)
    verify_scan(t.scan(filter=vf(ast.CompareOp.EQUAL, bc(V[1]))),
                NUM_ROWS // 2, COLS_PER_ROW)
    verify_scan(
        t.scan(filter=vf(ast.CompareOp.EQUAL,
                         ast.RegexStringComparator("testValue((One)|(Two))"))),
        NUM_ROWS, COLS_PER_ROW)
    verify_scan(t.scan(filter=vf(ast.CompareOp.LESS, bc(V[1]))),
                NUM_ROWS // 2, COLS_PER_ROW)
    verify_scan(t.scan(filter=vf(ast.CompareOp.LESS_OR_EQUAL, bc(V[1]))),
                NUM_ROWS, COLS_PER_ROW)
    verify_scan(t.scan(filter=vf(ast.CompareOp.LESS_OR_EQUAL, bc(V[0]))),
                NUM_ROWS // 2, COLS_PER_ROW)
    verify_scan(t.scan(filter=vf(ast.CompareOp.NOT_EQUAL, bc(V[0]))),
                NUM_ROWS // 2, COLS_PER_ROW)
    verify_scan(t.scan(filter=vf(ast.CompareOp.GREATER_OR_EQUAL, bc(V[0]))),
                NUM_ROWS, COLS_PER_ROW)
    verify_scan(t.scan(filter=vf(ast.CompareOp.GREATER, bc(V[0]))),
                NUM_ROWS // 2, COLS_PER_ROW)
    # NOT_EQUAL testValueOne full table = all group-two cells
    s = t.scan(filter=vf(ast.CompareOp.NOT_EQUAL, bc(V[0])))
    verify_scan_full(
        s, _all_cells(rows=[ROWS_TWO[0], ROWS_TWO[2], ROWS_TWO[3]])
    )


# ---------------------------------------------------------------------------
# testSkipFilter (:1326): Skip(Qualifier NOT_EQUAL One-2) keeps only
# rows where EVERY cell passes = the group-two rows
# ---------------------------------------------------------------------------


def test_skip_filter(t):
    f = ast.SkipFilter(
        ast.QualifierFilter(ast.CompareOp.NOT_EQUAL,
                            ast.BinaryComparator(Q_ONE[2]))
    )
    s = t.scan(filter=f)
    verify_scan_full(
        s, _all_cells(rows=[ROWS_TWO[0], ROWS_TWO[2], ROWS_TWO[3]])
    )


# ---------------------------------------------------------------------------
# testFilterList (:1364)
# ---------------------------------------------------------------------------


def test_filter_list(t):
    # MUST_PASS_ALL of row-regex, qualifier-regex, value-substring over
    # family one: exactly one cell survives
    f = ast.FilterList("MUST_PASS_ALL", [
        ast.RowFilter(ast.CompareOp.EQUAL, ast.RegexStringComparator(".+-2")),
        ast.QualifierFilter(ast.CompareOp.EQUAL,
                            ast.RegexStringComparator(".+-2")),
        ast.ValueFilter(ast.CompareOp.EQUAL, ast.SubstringComparator("One")),
    ])
    s = t.scan(families=(FAM[0],), filter=f)
    verify_scan_full(s, [kv(ROWS_ONE[2], FAM[0], Q_ONE[2], V[0])])

    # MUST_PASS_ONE of row-regex(.+Two.+), qualifier-regex, value-substring:
    # every cell passes at least one member -> everything
    f = ast.FilterList("MUST_PASS_ONE", [
        ast.RowFilter(ast.CompareOp.EQUAL,
                      ast.RegexStringComparator(".+Two.+")),
        ast.QualifierFilter(ast.CompareOp.EQUAL,
                            ast.RegexStringComparator(".+-2")),
        ast.ValueFilter(ast.CompareOp.EQUAL, ast.SubstringComparator("One")),
    ])
    verify_scan(t.scan(filter=f), NUM_ROWS, COLS_PER_ROW)


# ---------------------------------------------------------------------------
# testFirstKeyOnlyFilter (:1397)
# ---------------------------------------------------------------------------


def test_first_key_only_filter(t):
    s = t.scan(filter=ast.FirstKeyOnlyFilter())
    verify_scan_full(s, [
        kv(ROWS_ONE[0], FAM[0], Q_ONE[0], V[0]),
        kv(ROWS_ONE[2], FAM[0], Q_ONE[0], V[0]),
        kv(ROWS_ONE[3], FAM[0], Q_ONE[0], V[0]),
        kv(ROWS_TWO[0], FAM[0], Q_TWO[0], V[1]),
        kv(ROWS_TWO[2], FAM[0], Q_TWO[0], V[1]),
        kv(ROWS_TWO[3], FAM[0], Q_TWO[0], V[1]),
    ])


# ---------------------------------------------------------------------------
# testFilterListWithSingleColumnValueFilter (:1413, HBASE-3191):
# two filterIfMissing SCVFs individually, then their MUST_PASS_ONE
# union — the pure-SCVF OR fuse at HRegion level
# ---------------------------------------------------------------------------


def test_filter_list_with_single_column_value_filter(t):
    f1 = ast.SingleColumnValueFilter(
        FAM[0], Q_ONE[0], ast.CompareOp.EQUAL, ast.BinaryComparator(V[0]),
        filter_if_missing=True,
    )
    s1 = t.scan(families=(FAM[0],), filter=f1)
    kvs1 = _all_cells(rows=[ROWS_ONE[0], ROWS_ONE[2], ROWS_ONE[3]],
                      fam_idx=0)
    verify_scan(s1, 3, 3)
    verify_scan_full(s1, kvs1)

    f2 = ast.SingleColumnValueFilter(
        FAM[0], Q_TWO[0], ast.CompareOp.EQUAL, ast.BinaryComparator(V[1]),
        filter_if_missing=True,
    )
    s2 = t.scan(families=(FAM[0],), filter=f2)
    kvs2 = _all_cells(rows=[ROWS_TWO[0], ROWS_TWO[2], ROWS_TWO[3]],
                      fam_idx=0)
    verify_scan(s2, 3, 3)
    verify_scan_full(s2, kvs2)

    f = ast.FilterList("MUST_PASS_ONE", [f1, f2])
    s = t.scan(families=(FAM[0],), filter=f)
    verify_scan(s, 6, 3)
    verify_scan_full(s, kvs1 + kvs2)


# ---------------------------------------------------------------------------
# testFilterListWithPrefixFilter (:1491, HBASE-9747): mixed
# MUST_PASS_ONE of PrefixFilter + SCVF on a 5-row table — 'brow' via
# the prefix, 'crow' via the value; this is the mixed-OR case where the
# intuitive composition AGREES with the reference's visible result
# ---------------------------------------------------------------------------


def test_filter_list_with_prefix_filter(spark):
    cells = [
        ((chr(ord("a") + i) + "row").encode(), "f1", b"q1", 100, TYPE_PUT,
         str(111 + i).encode(), i)
        for i in range(5)
    ]
    t2 = Table(
        TableMeta(name="TestFilterPrefix", families=(FamilyMeta(name="f1"),)),
        spark.createDataFrame(cells, CELL_SCHEMA),
        now_ms=10_000,
    )
    f = ast.FilterList("MUST_PASS_ONE", [
        ast.PrefixFilter(b"b"),
        ast.SingleColumnValueFilter(
            "f1", b"q1", ast.CompareOp.EQUAL, ast.BinaryComparator(b"113")
        ),
    ])
    got = {r for (r, *_rest) in _collect(t2.scan(filter=f))}
    assert got == {b"brow", b"crow"}


# ---------------------------------------------------------------------------
# testSingleColumnValueFilter (:1538, HBASE-1821): fused MPA SCVFs,
# SkipFilter-wrapped SCVFs, and the filterIfMissing battery
# ---------------------------------------------------------------------------

R3 = [b"rowThree-" + str(i).encode() for i in range(4)]


def _hbase1821_table(spark):
    cells = _base_cells()
    seq = 100_000
    # change ROWS_ONE[2] Q_ONE[2] to the group-two value (:1545)
    cells.append((ROWS_ONE[2], FAM[0], Q_ONE[2], T4, TYPE_PUT, V[1], seq))
    # the four srcKVs (:1596-1601)
    src = [
        (R3[0], FAM[0], Q_ONE[0], V[0]),
        (R3[1], FAM[0], Q_ONE[0], V[1]),
        (R3[2], FAM[0], Q_ONE[1], V[0]),
        (R3[3], FAM[0], Q_ONE[1], V[1]),
    ]
    for i, (row, fam, q, v) in enumerate(src):
        cells.append((row, fam, q, T4, TYPE_PUT, v, seq + 1 + i))
    return _table(spark, cells), src


def test_single_column_value_filter(spark):
    t2, src = _hbase1821_table(spark)

    # MPA of the two SCVFs over [ROWS_ONE[0], ROWS_TWO[0]), family one:
    # only ROWS_ONE[2] has Q0=V0 AND Q2=V1 (group-two rows would pass
    # via filterIfMissing=false, hence the range limit)
    f = ast.FilterList("MUST_PASS_ALL", [
        ast.SingleColumnValueFilter(
            FAM[0], Q_ONE[0], ast.CompareOp.EQUAL, ast.BinaryComparator(V[0])
        ),
        ast.SingleColumnValueFilter(
            FAM[0], Q_ONE[2], ast.CompareOp.EQUAL, ast.BinaryComparator(V[1])
        ),
    ])
    expected = [
        kv(ROWS_ONE[2], FAM[0], Q_ONE[0], V[0]),
        kv(ROWS_ONE[2], FAM[0], Q_ONE[2], V[1]),
        kv(ROWS_ONE[2], FAM[0], Q_ONE[3], V[0]),
    ]
    s = t2.scan(start_row=ROWS_ONE[0], stop_row=ROWS_TWO[0],
                families=(FAM[0],), filter=f)
    verify_scan(s, 1, 3)
    verify_scan_full(s, expected)

    # same semantics via SkipFilter-wrapped SCVFs (:1570-1581)
    f = ast.FilterList("MUST_PASS_ALL", [
        ast.SkipFilter(ast.SingleColumnValueFilter(
            FAM[0], Q_ONE[0], ast.CompareOp.EQUAL, ast.BinaryComparator(V[0])
        )),
        ast.SkipFilter(ast.SingleColumnValueFilter(
            FAM[0], Q_ONE[2], ast.CompareOp.EQUAL, ast.BinaryComparator(V[1])
        )),
    ])
    s = t2.scan(start_row=ROWS_ONE[0], stop_row=ROWS_TWO[0],
                families=(FAM[0],), filter=f)
    verify_scan(s, 1, 3)
    verify_scan_full(s, expected)

    # filterIfMissing battery over the rowThree-* range (:1604-1650)
    def scvf(qual, val, fim):
        return ast.SingleColumnValueFilter(
            FAM[0], qual, ast.CompareOp.EQUAL, ast.BinaryComparator(val),
            filter_if_missing=fim,
        )

    def r3scan(f):
        return t2.scan(start_row=R3[0], stop_row=b"rowThree-4",
                       families=(FAM[0],), filter=f)

    # fIM=false: matching row 0 plus the missing-column rows 2 and 3
    verify_scan_full(r3scan(scvf(Q_ONE[0], V[0], False)),
                     [kv(*src[0]), kv(*src[2]), kv(*src[3])])
    # fIM=true: only the matching row
    verify_scan_full(r3scan(scvf(Q_ONE[0], V[0], True)), [kv(*src[0])])
    verify_scan_full(r3scan(scvf(Q_ONE[1], V[1], True)), [kv(*src[3])])


def test_single_column_value_filter_after_extra_column(spark):
    # :1639-1650 — adding Q_ONE[1]=V[0] to rowThree-0 must NOT admit it
    # under EQUAL V[1] + filterIfMissing (the column now exists and fails)
    t2, src = _hbase1821_table(spark)
    cells = [tuple(r) for r in t2.cells.collect()]
    kv_a = (R3[0], FAM[0], Q_ONE[1], T4 + 1, TYPE_PUT, V[0], 200_000)
    t3 = _table(spark, cells + [kv_a])
    f = ast.SingleColumnValueFilter(
        FAM[0], Q_ONE[1], ast.CompareOp.EQUAL, ast.BinaryComparator(V[1]),
        filter_if_missing=True,
    )
    s = t3.scan(start_row=R3[0], stop_row=b"rowThree-4",
                families=(FAM[0],), filter=f)
    verify_scan_full(s, [kv(*src[3])])


# ---------------------------------------------------------------------------
# testColumnPaginationFilterColumnOffset (:1775): the byte[] bookmark
# variant, including the cross-family continuation
# ---------------------------------------------------------------------------


def test_column_pagination_filter_column_offset(t):
    # Page size 1 from Q_ONE[1]: group one resumes at (F0, One-2),
    # group two's Two-0 already sorts past the bookmark
    s = t.scan(filter=ast.ColumnPaginationFilter(1, column_offset=Q_ONE[1]))
    verify_scan(s, 6, 1)
    verify_scan_full(s, [
        kv(ROWS_ONE[0], FAM[0], Q_ONE[2], V[0]),
        kv(ROWS_ONE[2], FAM[0], Q_ONE[2], V[0]),
        kv(ROWS_ONE[3], FAM[0], Q_ONE[2], V[0]),
        kv(ROWS_TWO[0], FAM[0], Q_TWO[0], V[1]),
        kv(ROWS_TWO[2], FAM[0], Q_TWO[0], V[1]),
        kv(ROWS_TWO[3], FAM[0], Q_TWO[0], V[1]),
    ])

    # Page size 2 from Q_TWO[2]: group one has no qualifier >= bookmark
    s = t.scan(filter=ast.ColumnPaginationFilter(2, column_offset=Q_TWO[2]))
    verify_scan(s, 3, 2)
    verify_scan_full(s, [
        kv(r, FAM[0], q, V[1])
        for r in (ROWS_TWO[0], ROWS_TWO[2], ROWS_TWO[3])
        for q in (Q_TWO[2], Q_TWO[3])
    ])

    # Page size 3 from Q_TWO[2]: the third column CROSSES into family
    # two at (F1, Two-0) — the bookmark only picks the start
    s = t.scan(filter=ast.ColumnPaginationFilter(3, column_offset=Q_TWO[2]))
    verify_scan(s, 3, 3)
    verify_scan_full(s, [
        kv(r, fam, q, V[1])
        for r in (ROWS_TWO[0], ROWS_TWO[2], ROWS_TWO[3])
        for fam, q in ((FAM[0], Q_TWO[2]), (FAM[0], Q_TWO[3]),
                       (FAM[1], Q_TWO[0]))
    ])

    # Page size 2 from Q_TWO[2] restricted to family two
    s = t.scan(families=(FAM[1],),
               filter=ast.ColumnPaginationFilter(2, column_offset=Q_TWO[2]))
    verify_scan_full(s, [
        kv(r, FAM[1], q, V[1])
        for r in (ROWS_TWO[0], ROWS_TWO[2], ROWS_TWO[3])
        for q in (Q_TWO[2], Q_TWO[3])
    ])


# ---------------------------------------------------------------------------
# testColumnPaginationFilter (:1861): limit/offset pages; the extra
# version of (ROWS_ONE[0], F0, Q_ONE[0]) must be version-deduped, not
# paginated as a second column
# ---------------------------------------------------------------------------


def test_column_pagination_filter(spark):
    cells = _base_cells()
    cells.append(
        (ROWS_ONE[0], FAM[0], Q_ONE[0], T4, TYPE_PUT, V[0], 300_000)
    )
    t2 = _table(spark, cells)

    def one_per_row(qi):
        return (
            [kv(r, FAM[0], Q_ONE[qi], V[0])
             for r in (ROWS_ONE[0], ROWS_ONE[2], ROWS_ONE[3])]
            + [kv(r, FAM[0], Q_TWO[qi], V[1])
               for r in (ROWS_TWO[0], ROWS_TWO[2], ROWS_TWO[3])]
        )

    # Page 1, 1 column per page (limit 1, offset 0)
    s = t2.scan(filter=ast.ColumnPaginationFilter(1, 0))
    verify_scan(s, NUM_ROWS, 1)
    verify_scan_full(s, one_per_row(0))

    # Page 3, 1 per page (limit 1, offset 2): visible quals 0,2,3 -> Q-3
    s = t2.scan(filter=ast.ColumnPaginationFilter(1, 2))
    verify_scan(s, NUM_ROWS, 1)
    verify_scan_full(s, one_per_row(3))

    # Page 2, 2 per page (limit 2, offset 2): (F0, Q-3) + (F1, Q-0)
    s = t2.scan(filter=ast.ColumnPaginationFilter(2, 2))
    verify_scan(s, NUM_ROWS, 2)
    expected = []
    for r in (ROWS_ONE[0], ROWS_ONE[2], ROWS_ONE[3]):
        expected += [kv(r, FAM[0], Q_ONE[3], V[0]),
                     kv(r, FAM[1], Q_ONE[0], V[0])]
    for r in (ROWS_TWO[0], ROWS_TWO[2], ROWS_TWO[3]):
        expected += [kv(r, FAM[0], Q_TWO[3], V[1]),
                     kv(r, FAM[1], Q_TWO[0], V[1])]
    verify_scan_full(s, expected)

    # limit 20, offset 140: past the end of every row
    assert _collect(t2.scan(filter=ast.ColumnPaginationFilter(20, 140))) == []


# ---------------------------------------------------------------------------
# testKeyOnlyFilter (:1959): values stripped (NULL) or replaced by the
# 4-byte big-endian original length
# ---------------------------------------------------------------------------


def test_key_only_filter(t):
    for use_len in (False, True):
        s = t.scan(filter=ast.KeyOnlyFilter(len_as_val=use_len))
        got = _collect(s)
        expected_keys = sorted(
            (row, fam, q) for row, fam, q, _v in _all_cells()
        )
        assert [(r, f, q) for r, f, q, _ in got] == expected_keys
        for _r, _f, _q, v in got:
            if use_len:
                # both fixture values are 12 bytes long
                assert v == (12).to_bytes(4, "big")
            else:
                assert v is None


# ---------------------------------------------------------------------------
# testNestedFilterListWithSCVF (:2052): nested MPO(RowFilter,
# MPA(RowFilter, SCVF)) in BOTH member orders
# ---------------------------------------------------------------------------


def test_nested_filter_list_with_scvf(spark):
    status = b"S"
    cells = [
        ((b"row" + str(i).encode()), FAM[0], status, 100, TYPE_PUT,
         (i % 2).to_bytes(4, "big"), i)
        for i in range(10)
    ]
    t2 = Table(
        TableMeta(name="testNestedFilterListWithSCVF",
                  families=(FamilyMeta(name=FAM[0]),)),
        spark.createDataFrame(cells, CELL_SCHEMA),
        now_ms=10_000,
    )
    row_filter = ast.RowFilter(ast.CompareOp.GREATER,
                               ast.BinaryComparator(b"row4"))
    # 1. rows > row4
    got = {r for (r, *_x) in _collect(t2.scan(filter=row_filter))}
    assert got == {b"row" + str(i).encode() for i in range(5, 10)}
    # 2. rows <= row4 AND S == 0
    sub = ast.FilterList("MUST_PASS_ALL", [
        ast.RowFilter(ast.CompareOp.LESS_OR_EQUAL,
                      ast.BinaryComparator(b"row4")),
        ast.SingleColumnValueFilter(
            FAM[0], status, ast.CompareOp.EQUAL,
            ast.BinaryComparator((0).to_bytes(4, "big")),
        ),
    ])
    got = {r for (r, *_x) in _collect(t2.scan(filter=sub))}
    assert got == {b"row0", b"row2", b"row4"}
    # 3. nested MPO, both member orders
    expected = {b"row0", b"row2", b"row4"} | {
        b"row" + str(i).encode() for i in range(5, 10)
    }
    for members in ([row_filter, sub], [sub, row_filter]):
        f = ast.FilterList("MUST_PASS_ONE", members)
        got = {r for (r, *_x) in _collect(t2.scan(filter=f))}
        assert got == expected


# ---------------------------------------------------------------------------
# Skip(SCVF) cell-code semantics (r12 divergence fix). SkipFilter.java:79-83:
# only filterKeyValue codes feed the row verdict (changeFR) — the wrapped
# filter's filterRow, where filterIfMissing lives, is NEVER consulted, and
# FilterBase.filterRowCells is a no-op so SingleColumnValueExcludeFilter
# excludes nothing under Skip. SCVF.filterKeyValue
# (SingleColumnValueFilter.java:171-188) returns NEXT_ROW only when
# latestVersionOnly=true and the found column's newest tested version fails;
# with latestVersionOnly=false every code is INCLUDE. Not covered by
# TestFilter.java itself (its Skip(SCVF) beats use the fim=false default).
# ---------------------------------------------------------------------------


def test_skip_scvf_filter_if_missing_keeps_row(spark):
    """Skip(SCVF fim=true, lvo=true) on rows MISSING the tested column:
    reference KEEPS them (all codes INCLUDE — filterIfMissing only feeds
    filterRow, which Skip ignores); a row whose newest value fails is
    dropped via the NEXT_ROW code."""
    t2, _src = _hbase1821_table(spark)
    f = ast.SkipFilter(ast.SingleColumnValueFilter(
        FAM[0], Q_ONE[0], ast.CompareOp.EQUAL, ast.BinaryComparator(V[0]),
        filter_if_missing=True,
    ))
    s = t2.scan(start_row=R3[0], stop_row=b"rowThree-4",
                families=(FAM[0],), filter=f)
    # R3[0] Q0=V0 matches; R3[1] Q0=V1 fails -> NEXT_ROW -> dropped;
    # R3[2]/R3[3] have no Q0 -> KEPT despite filterIfMissing=True
    verify_scan_full(s, [
        kv(R3[0], FAM[0], Q_ONE[0], V[0]),
        kv(R3[2], FAM[0], Q_ONE[1], V[0]),
        kv(R3[3], FAM[0], Q_ONE[1], V[1]),
    ])


def test_skip_scvf_any_version_is_identity(spark):
    """Skip(SCVF latestVersionOnly=false) never drops a row: a failing
    comparison returns INCLUDE (the NEXT_ROW shortcut is gated on
    latestVersionOnly, SingleColumnValueFilter.java:184-185), so the
    Skip verdict stays clean for every row — even fim=true + failing
    values."""
    t2, _src = _hbase1821_table(spark)
    f = ast.SkipFilter(ast.SingleColumnValueFilter(
        FAM[0], Q_ONE[0], ast.CompareOp.EQUAL,
        ast.BinaryComparator(b"no-such-value"),
        filter_if_missing=True, latest_version_only=False,
    ))
    s = t2.scan(start_row=R3[0], stop_row=b"rowThree-4",
                families=(FAM[0],), filter=f)
    verify_scan_full(s, [
        kv(R3[0], FAM[0], Q_ONE[0], V[0]),
        kv(R3[1], FAM[0], Q_ONE[0], V[1]),
        kv(R3[2], FAM[0], Q_ONE[1], V[0]),
        kv(R3[3], FAM[0], Q_ONE[1], V[1]),
    ])


def test_skip_scvef_excludes_nothing(spark):
    """Skip(SingleColumnValueExcludeFilter): the exclusion lives in
    filterRowCells, which SkipFilter inherits as FilterBase's no-op —
    the tested column stays in the output."""
    t2, _src = _hbase1821_table(spark)
    f = ast.SkipFilter(ast.SingleColumnValueExcludeFilter(
        FAM[0], Q_ONE[0], ast.CompareOp.EQUAL, ast.BinaryComparator(V[0]),
    ))
    s = t2.scan(start_row=R3[0], stop_row=b"rowThree-4",
                families=(FAM[0],), filter=f)
    verify_scan_full(s, [
        kv(R3[0], FAM[0], Q_ONE[0], V[0]),
        kv(R3[2], FAM[0], Q_ONE[1], V[0]),
        kv(R3[3], FAM[0], Q_ONE[1], V[1]),
    ])
