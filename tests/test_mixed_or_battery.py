"""Mixed MUST_PASS_ONE {SCVF x cell-level filter} boundary battery.

The engine's one documented un-fenced divergence (compiler.py
compile_filter docstring): a MIXED OR of SCVF + cell-level filters.
This module pins it the PageFilter way — an exact sequential replay of
the reference protocol next to the engine, with the decision table and
the diff set asserted case by case.

Reference protocol (replayed verbatim by ``RefMixedOr`` below):

* FilterList MPO filterKeyValue (FilterList.java:278-307): a cell is
  emitted iff ANY member returns INCLUDE/INCLUDE_AND_NEXT_COL; a
  member's NEXT_ROW/SKIP/NEXT_COL just means "no vote", never
  terminates the row.
* SCVF filterKeyValue (SingleColumnValueFilter.java:171-188): INCLUDE
  for every cell until the tested column is seen; once matched,
  INCLUDE forever; a failed test under latestVersionOnly=true yields
  NEXT_ROW for that cell and all later ones; under
  latestVersionOnly=false it yields INCLUDE always (the verdict is
  deferred to filterRow).
* FilterList MPO filterRow (FilterList.java:341-355): the row drops
  iff EVERY member's filterRow() is true — and a cell-level sibling's
  filterRow() is constantly false (FilterBase), so a mixed-OR list
  NEVER drops a row at row level: SCVF's filterIfMissing /
  matched-verdict is effectively dead code in this composition.

Engine contract (deliberate, documented): cell kept iff (SCVF row
verdict, honoring filterIfMissing/latestVersionOnly) OR (cell passes
the sibling). The decision table over rows r1-r6 + the two-version row
r7 (sibling = ValueFilter(EQUAL, 'vv'); SCVF tests q=qm for 'ok'):

====  ========================  =============================  ==============================  =======
row   shape                     reference keeps                engine keeps                    agree?
====  ========================  =============================  ==============================  =======
r1    qm passes                 all cells                      all cells                       yes
r2    qm fails (lvo=true)       cells BEFORE qm + VF-passing   VF-passing cells only           NO
                                cells from qm on
r3    qm missing, fim=true      all cells                      VF-passing cells only           NO
r4    qm missing, fim=false     all cells                      all cells                       yes
r5    qm fails (lvo=false)      all cells                      VF-passing cells only           NO
r6    qm fails, all values vv   all cells                      all cells                       yes
r7    latest qm fails, older    cells BEFORE qm + VF-passing   VF-passing only (lvo judges     NO
      passes (lvo=true, 2       cells from qm on               the latest version)
      visible versions)
====  ========================  =============================  ==============================  =======

Where they differ, the reference's answer is the degenerate
"every row survives, SCVF can only stop voting mid-row" — not a
contract a user can rely on; the engine's is the boolean composition
the DSL reads as. The diff set asserted below IS the fence: any engine
change that moves a non-diff cell breaks this module.
"""

from __future__ import annotations

import pytest

from hbase_1_3_0_spark.catalog import FamilyMeta, TableMeta
from hbase_1_3_0_spark.cells import CELL_SCHEMA, TYPE_PUT
from hbase_1_3_0_spark.filters import ast
from hbase_1_3_0_spark.table import Scan, Table

FAM = "f1"
Q_PRE, Q_MID, Q_POST = b"a_pre", b"m_tested", b"z_post"
OK, BAD, VV = b"ok", b"bad", b"vv"
T1, T2 = 1000, 2000

# (row, cells as (qualifier, [(ts, value)] newest-first))
ROWS = [
    (b"r1_match", [(Q_PRE, [(T1, BAD)]), (Q_MID, [(T1, OK)]),
                   (Q_POST, [(T1, BAD)])]),
    (b"r2_fail_lvo", [(Q_PRE, [(T1, BAD)]), (Q_MID, [(T1, BAD)]),
                      (Q_POST, [(T1, VV)])]),
    (b"r3_missing_fim", [(Q_PRE, [(T1, VV)]), (Q_POST, [(T1, BAD)])]),
    (b"r4_missing_nofim", [(Q_PRE, [(T1, BAD)]), (Q_POST, [(T1, BAD)])]),
    (b"r5_fail_anyversion", [(Q_PRE, [(T1, BAD)]), (Q_MID, [(T1, BAD)]),
                             (Q_POST, [(T1, BAD)])]),
    (b"r6_fail_vv", [(Q_PRE, [(T1, VV)]), (Q_MID, [(T1, VV)]),
                     (Q_POST, [(T1, VV)])]),
    (b"r7_old_passes", [(Q_PRE, [(T1, BAD)]),
                        (Q_MID, [(T2, BAD), (T1, OK)]),
                        (Q_POST, [(T1, VV)])]),
]


def _cells():
    out, seq = [], 0
    for row, cols in ROWS:
        for q, versions in cols:
            for ts, v in versions:
                seq += 1
                out.append((row, FAM, q, ts, TYPE_PUT, v, seq))
    return out


def _visible_cells(max_versions):
    """The scan-visible cell stream, ordered the scanner's way:
    (row, family, qualifier asc, ts desc), version-limited."""
    vis = []
    for row, cols in ROWS:
        for q, versions in sorted(cols, key=lambda c: c[0]):
            for ts, v in sorted(versions, reverse=True)[:max_versions]:
                vis.append((row, q, ts, v))
    return vis


# ---------------------------------------------------------------------------
# exact reference replay (the Java-shaped walk lives in the test, the
# engine stays declarative — the TestFilter-pin precedent)
# ---------------------------------------------------------------------------


class RefScvf:
    """SingleColumnValueFilter.java:171-188 + filterRow :219-222."""

    def __init__(self, qual, expected, fim, lvo):
        self.qual, self.expected, self.fim, self.lvo = qual, expected, fim, lvo
        self.reset()

    def reset(self):
        self.found = self.matched = False

    def filter_key_value(self, q, value):
        if self.matched:
            return "INCLUDE"
        if self.lvo and self.found:
            return "NEXT_ROW"
        if q != self.qual:
            return "INCLUDE"
        self.found = True
        if value != self.expected:  # filterColumnValue true = fails EQUAL
            return "NEXT_ROW" if self.lvo else "INCLUDE"
        self.matched = True
        return "INCLUDE"

    def filter_row(self):
        return (not self.matched) if self.found else self.fim


class RefValueFilter:
    """ValueFilter(EQUAL, BinaryComparator) — INCLUDE iff value equal;
    filterRow() constantly false (FilterBase)."""

    def __init__(self, expected):
        self.expected = expected

    def reset(self):
        pass

    def filter_key_value(self, q, value):
        return "INCLUDE" if value == self.expected else "SKIP"

    def filter_row(self):
        return False


def ref_mixed_or(scvf, sibling, max_versions=1):
    """FilterList MPO over the visible stream: cell kept iff any member
    INCLUDEs (:278-307); row kept unless ALL members filterRow()
    (:341-355)."""
    kept = []
    for row, _ in ROWS:
        scvf.reset()
        sibling.reset()
        row_cells = [c for c in _visible_cells(max_versions) if c[0] == row]
        row_kept = []
        for _, q, ts, v in row_cells:
            codes = (scvf.filter_key_value(q, v),
                     sibling.filter_key_value(q, v))
            if "INCLUDE" in codes:
                row_kept.append((row, q, ts))
        if not (scvf.filter_row() and sibling.filter_row()):
            kept += row_kept
    return sorted(kept)


def engine_expected(scvf_rows, sibling_value, max_versions=1):
    """The engine's documented contract: cell kept iff its row is in the
    SCVF row-verdict set OR the cell passes the sibling."""
    return sorted(
        (row, q, ts)
        for row, q, ts, v in _visible_cells(max_versions)
        if row in scvf_rows or v == sibling_value
    )


def _scan_engine(spark, filt, max_versions=1):
    t = Table(
        TableMeta(
            name="mixed_or",
            families=(FamilyMeta(name=FAM, max_versions=max_versions),),
        ),
        spark.createDataFrame(_cells(), CELL_SCHEMA),
        now_ms=10_000,
    )
    return sorted(
        (bytes(r["row"]), bytes(r["qualifier"]), r["ts"])
        for r in t.scan(Scan(filter=filt, max_versions=max_versions)).collect()
    )


def _case(fim, lvo):
    return ast.FilterList("MUST_PASS_ONE", [
        ast.SingleColumnValueFilter(
            FAM, Q_MID, ast.CompareOp.EQUAL, ast.BinaryComparator(OK),
            filter_if_missing=fim, latest_version_only=lvo,
        ),
        ast.ValueFilter(ast.CompareOp.EQUAL, ast.BinaryComparator(VV)),
    ])


# ---------------------------------------------------------------------------
# the battery
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("fim,lvo", [(True, True), (False, True),
                                     (True, False), (False, False)])
def test_decision_table(spark, fim, lvo):
    """Engine == engine contract; reference == replay; the diff set is
    EXACTLY the table's 'NO' rows for each (fim, lvo) corner."""
    got = _scan_engine(spark, _case(fim, lvo))

    # engine contract: which rows pass the SCVF row verdict?
    # r1 matches; r7's visible latest under maxVersions=1 fails;
    # missing-column rows pass iff fim=False; under lvo=False no row
    # has ANY passing visible version except r1/r7(older hidden).
    scvf_rows = {b"r1_match"}
    if not fim:
        scvf_rows |= {b"r3_missing_fim", b"r4_missing_nofim"}
    assert got == engine_expected(scvf_rows, VV)

    ref = ref_mixed_or(
        RefScvf(Q_MID, OK, fim, lvo), RefValueFilter(VV)
    )
    # the reference replay: every row survives; under lvo=True the
    # SCVF stops voting after a failed test, under lvo=False it never
    # stops voting (all cells INCLUDE)
    if lvo:
        failing = (b"r2_fail_lvo", b"r5_fail_anyversion", b"r7_old_passes")
        assert ref == sorted(
            (row, q, ts) for row, q, ts, v in _visible_cells(1)
            if row not in failing or q == Q_PRE or v == VV
        )
    else:
        assert ref == sorted(
            (row, q, ts) for row, q, ts, _ in _visible_cells(1)
        )

    # the FENCE: the divergence's direction and magnitude, pinned.
    diff = set(ref) ^ set(got)
    # direction: every diff cell is REF-kept, ENGINE-dropped (the
    # reference never returns LESS than the engine in this composition)
    assert all(c in set(ref) and c not in set(got) for c in diff)
    # pin the magnitude per corner of the table (hand-derived):
    # fim=T,lvo=T: r2/r5/r7 pre-cells + r3 z_post + r4 both     = 6
    # fim=F,lvo=T: r2/r5/r7 pre-cells (r3/r4 pass via fim=F)    = 3
    # fim=T,lvo=F: ref keeps ALL; engine-only rows stay {r1}    = 10
    # fim=F,lvo=F: ditto minus the r3/r4 cells                  = 7
    n_diff = {
        (True, True): 6,
        (False, True): 3,
        (True, False): 10,
        (False, False): 7,
    }[(fim, lvo)]
    assert len(diff) == n_diff, sorted(diff)


def test_two_version_row_lvo(spark):
    """r7: latest visible version fails, older passes, maxVersions=2.
    Reference: pre-cells kept, the two qm versions + post kept only via
    the sibling. Engine: lvo=True judges the LATEST version -> row
    verdict false -> sibling-only."""
    got = _scan_engine(spark, _case(False, True), max_versions=2)
    assert got == engine_expected(
        {b"r1_match", b"r3_missing_fim", b"r4_missing_nofim"}, VV,
        max_versions=2,
    )
    ref = ref_mixed_or(
        RefScvf(Q_MID, OK, False, True), RefValueFilter(VV),
        max_versions=2,
    )
    # r7 under the replay: Q_PRE kept (SCVF still voting), both Q_MID
    # versions NEXT_ROW'd (latest fails with lvo; older sees found&lvo),
    # Q_POST kept via the sibling's VV
    r7_ref = [c for c in ref if c[0] == b"r7_old_passes"]
    assert r7_ref == [
        (b"r7_old_passes", Q_PRE, T1),
        (b"r7_old_passes", Q_POST, T1),
    ]
    r7_got = [c for c in got if c[0] == b"r7_old_passes"]
    assert r7_got == [(b"r7_old_passes", Q_POST, T1)]
