"""Round-11 port of TestFromClientSide.testSingleRowMultipleFamily
(:1055, ~300 lines) — the canonical get/scan PROJECTION battery over
one row and ten families: whole-family vs explicit-column selection,
their UNION across families (Get.addFamily + addColumn build a
familyMap whose per-family entries union — r11 fix: the engine
intersected ``families`` with ``columns``), empties around the
populated coordinates, and the delete interplay (column deletes leave
neighbors intact; a family delete hides both its columns while other
families stay readable). Flush beats collapse (storage-physical).

Declarative note: the reference familyMap is call-order-dependent
(the LAST addFamily/addColumn per family wins); the declarative Scan
expresses the two orders by choosing the field — a family in
``families`` selects it whole (the addColumn-then-addFamily order),
a family present only via ``columns`` selects just those columns
(the addFamily-then-addColumn order, getVerifySingleEmpty's probes).
"""

from __future__ import annotations

from hbase_1_3_0_spark.catalog import FamilyMeta, TableMeta
from hbase_1_3_0_spark.cells import CELL_SCHEMA, TYPE_DELETE_COLUMN, TYPE_DELETE_FAMILY, TYPE_PUT
from hbase_1_3_0_spark.table import Get, Scan, Table

from tests._concurrent import gather

ROWS = [b"testRow" + str(i).encode() for i in range(3)]
FAM = [f"testFamily{i}" for i in range(10)]
Q = [b"testQualifier" + str(i).encode() for i in range(10)]
V = [b"testValue" + str(i).encode() for i in range(10)]


def _table(spark, cells):
    return Table(
        TableMeta(name="t",
                  families=tuple(FamilyMeta(name=f) for f in FAM)),
        spark.createDataFrame(cells, CELL_SCHEMA),
        now_ms=100_000,
    )


def _got(df):
    return sorted(
        (r["family"], bytes(r["qualifier"]), bytes(r["value"]))
        for r in df.collect()
    )


def _cell(f, q, v):
    return (FAM[f], Q[q], V[v])


STAGE_A = [(ROWS[0], FAM[4], Q[0], 1000, TYPE_PUT, V[0], 0)]

STAGE_B = STAGE_A + [
    (ROWS[0], FAM[2], Q[2], 2000, TYPE_PUT, V[2], 1),
    (ROWS[0], FAM[2], Q[4], 2000, TYPE_PUT, V[4], 2),
    (ROWS[0], FAM[4], Q[4], 2000, TYPE_PUT, V[4], 3),
    (ROWS[0], FAM[6], Q[6], 2000, TYPE_PUT, V[6], 4),
    (ROWS[0], FAM[6], Q[7], 2000, TYPE_PUT, V[7], 5),
    (ROWS[0], FAM[7], Q[7], 2000, TYPE_PUT, V[7], 6),
    (ROWS[0], FAM[9], Q[0], 2000, TYPE_PUT, V[0], 7),
]


def test_single_column_get_and_scan(spark):
    """getVerifySingleColumn / scanVerifySingleColumn (:3062/:3120):
    full-row get, whole-family get, the three-family union, the
    explicit column, and the addColumn+addFamily union (family wins
    whole); scan variants with open/bounded ranges."""
    t = _table(spark, STAGE_A)
    one = [_cell(4, 0, 0)]
    assert _got(t.get(Get(ROWS[0]))) == one
    assert _got(t.get(Get(ROWS[0], families=(FAM[4],)))) == one
    assert _got(t.get(Get(
        ROWS[0], families=(FAM[2], FAM[4], FAM[6])))) == one
    assert _got(t.get(Get(ROWS[0], columns=((FAM[4], Q[0]),)))) == one
    # addColumn(F4, Q1) then addFamily(F4): the family selection wins
    # whole-family -> the Q0 cell still returns (:3094-3099)
    assert _got(t.get(Get(
        ROWS[0], families=(FAM[4],), columns=((FAM[4], Q[1]),)))) == one

    assert _got(t.scan()) == one
    assert _got(t.scan(start_row=ROWS[0])) == one
    assert _got(t.scan(start_row=ROWS[0], stop_row=ROWS[1])) == one
    assert _got(t.scan(stop_row=ROWS[1])) == one
    assert _got(t.scan(families=(FAM[4],))) == one
    assert _got(t.scan(columns=((FAM[4], Q[0]),))) == one


def test_single_empty_probes(spark):
    """getVerifySingleEmpty / scanVerifySingleEmpty (:3180/:3211):
    probes around the populated coordinate come back empty — the
    column-only selection of a missing qualifier (the reference's
    addFamily-then-addColumn overwrite), the three-way union missing
    everywhere, and the neighboring row."""
    t = _table(spark, STAGE_A)
    assert _got(t.get(Get(ROWS[0], columns=((FAM[4], Q[1]),)))) == []
    assert _got(t.get(Get(ROWS[0], columns=((FAM[4], Q[2]),)))) == []
    # union of F3 + F4:Q2 + F5: none exist
    assert _got(t.get(Get(
        ROWS[0], families=(FAM[3], FAM[5]),
        columns=((FAM[4], Q[2]),)))) == []
    assert _got(t.get(Get(ROWS[1]))) == []
    assert _got(t.scan(start_row=ROWS[1])) == []
    assert _got(t.scan(start_row=ROWS[0], stop_row=ROWS[0]))  == []
    assert _got(t.scan(columns=((FAM[4], Q[2]),))) == []


def test_single_row_multi_family_projections(spark):
    """singleRowGetTest / singleRowScanTest (:2862/:2960): the
    multi-family permutations over the 8-cell row."""
    t = _table(spark, STAGE_B)
    # single columns
    assert _got(t.get(Get(ROWS[0], columns=((FAM[4], Q[0]),)))) == [
        _cell(4, 0, 0)]
    assert _got(t.get(Get(ROWS[0], columns=((FAM[2], Q[2]),)))) == [
        _cell(2, 2, 2)]
    # whole family with one column
    assert _got(t.get(Get(ROWS[0], families=(FAM[7],)))) == [_cell(7, 7, 7)]
    # two columns, same family: wildcard and explicit agree
    two = sorted([_cell(4, 0, 0), _cell(4, 4, 4)])
    assert _got(t.get(Get(ROWS[0], families=(FAM[4],)))) == two
    assert _got(t.get(Get(
        ROWS[0], columns=((FAM[4], Q[0]), (FAM[4], Q[4]))))) == two
    # two whole families union
    three = sorted(two + [_cell(7, 7, 7)])
    assert _got(t.get(Get(ROWS[0], families=(FAM[4], FAM[7])))) == three
    # whole row
    expect_all = sorted([
        _cell(4, 0, 0), _cell(2, 2, 2), _cell(2, 4, 4), _cell(4, 4, 4),
        _cell(6, 6, 6), _cell(6, 7, 7), _cell(7, 7, 7), _cell(9, 0, 0),
    ])
    assert _got(t.get(Get(ROWS[0]))) == expect_all
    # the same permutations through scans
    assert _got(t.scan(families=(FAM[4], FAM[7]))) == three
    assert _got(t.scan(columns=((FAM[4], Q[0]), (FAM[4], Q[4])))) == two
    assert _got(t.scan()) == expect_all
    # mixed union across families: whole F7 + one F4 column
    assert _got(t.scan(families=(FAM[7],),
                       columns=((FAM[4], Q[4]),))) == sorted(
        [_cell(7, 7, 7), _cell(4, 4, 4)])


def test_delete_interplay(spark):
    """:1143-1356 — deleteColumns(F6,Q7) and (F6,Q8) leave neighbors
    readable; deleteFamily(F4) hides both its columns while other
    families stay; all via both get and scan."""
    cells = STAGE_B + [
        (ROWS[0], FAM[6], Q[5], 3000, TYPE_PUT, V[5], 10),
        (ROWS[0], FAM[6], Q[8], 3000, TYPE_PUT, V[8], 11),
        (ROWS[0], FAM[6], Q[9], 3000, TYPE_PUT, V[9], 12),
        (ROWS[0], FAM[4], Q[3], 3000, TYPE_PUT, V[3], 13),
        (ROWS[0], FAM[6], Q[7], 4000, TYPE_DELETE_COLUMN, None, 14),
    ]
    t = _table(spark, cells)
    # independent reads of one immutable state: overlapped (guide §2.6)
    r = gather(
        lambda: _got(t.get(Get(ROWS[0], columns=((FAM[6], Q[7]),)))),
        lambda: _got(t.scan(columns=((FAM[6], Q[7]),))),
        lambda: _got(t.get(Get(ROWS[0], columns=((FAM[6], Q[6]),)))),
        lambda: _got(t.get(Get(ROWS[0], columns=((FAM[6], Q[8]),)))),
    )
    assert r[0] == []
    assert r[1] == []
    assert r[2] == [_cell(6, 6, 6)]
    assert r[3] == [_cell(6, 8, 8)]

    cells.append((ROWS[0], FAM[6], Q[8], 5000, TYPE_DELETE_COLUMN, None, 15))
    t = _table(spark, cells)
    r = gather(
        lambda: _got(t.get(Get(ROWS[0], columns=((FAM[6], Q[8]),)))),
        lambda: _got(t.get(Get(ROWS[0], columns=((FAM[6], Q[9]),)))),
    )
    assert r[0] == []
    assert r[1] == [_cell(6, 9, 9)]

    cells.append((ROWS[0], FAM[4], None, 6000, TYPE_DELETE_FAMILY, None, 16))
    t = _table(spark, cells)
    r = gather(
        lambda: _got(t.get(Get(ROWS[0], columns=((FAM[4], Q[4]),)))),
        lambda: _got(t.get(Get(ROWS[0], columns=((FAM[4], Q[3]),)))),
        lambda: _got(t.get(Get(ROWS[0], families=(FAM[4],)))),
        lambda: _got(t.scan(columns=((FAM[4], Q[4]),))),
        lambda: _got(t.scan(families=(FAM[4],))),
        lambda: _got(t.get(Get(ROWS[0], columns=((FAM[2], Q[2]),)))),
        lambda: _got(t.get(Get(ROWS[0], columns=((FAM[6], Q[9]),)))),
        lambda: _got(t.scan(columns=((FAM[6], Q[6]),))),
    )
    assert r[0] == []
    assert r[1] == []
    assert r[2] == []
    assert r[3] == []
    assert r[4] == []
    assert r[5] == [_cell(2, 2, 2)]
    assert r[6] == [_cell(6, 9, 9)]
    assert r[7] == [_cell(6, 6, 6)]
