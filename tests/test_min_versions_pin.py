"""Round-11 pin of TestMinVersions.java (479 LoC,
hbase-server/src/test/java/org/apache/hadoop/hbase/regionserver/) —
the minVersions keep-floor x TTL x tombstone x filter suite, pinned
directly against the minVersions floor reworked this round (dense
rank by ts; same-ts dups don't consume floor slots).

Fixture convention: createTableDescriptor(name, minVersions,
maxVersions=1000, ttl=1s, KDC.FALSE); every put is "2s in the past"
so ALL versions are TTL-expired and only the minVersions floor keeps
them. now_ms=10_000, ts=8_000 here. The reference's pre-flush beats
(expired versions transiently readable until HBASE-4241's flush
collects them) are PHYSICAL memstore state; the pinned verdicts are
the post-flush/compaction ones, which the declarative read view
produces directly.
"""

from __future__ import annotations

from hbase_1_3_0_spark.catalog import FamilyMeta, TableMeta
from hbase_1_3_0_spark.cells import CELL_SCHEMA, TYPE_DELETE_FAMILY, TYPE_PUT
from hbase_1_3_0_spark.filters import ast
from hbase_1_3_0_spark.table import Get, Scan, Table

C0, C1 = "c0", "c1"
Q0, Q1 = b"c0", b"c1"
T = [b"%d" % i for i in range(6)]
R1, R2, R3 = b"1", b"2", b"3"
NOW = 10_000
TS = 8_000
MAXV = 2**31 - 1


def _table(spark, cells, min_versions, families=(C0,)):
    return Table(
        TableMeta(
            name="t",
            families=tuple(
                FamilyMeta(
                    name=f, max_versions=1000, min_versions=min_versions,
                    ttl_seconds=1, keep_deleted_cells="FALSE",
                )
                for f in families
            ),
        ),
        spark.createDataFrame(cells, CELL_SCHEMA),
        now_ms=NOW,
    )


def _vals(df, fam=C0, qual=Q0):
    out = []
    for r in sorted(df.collect(), key=lambda r: -r["ts"]):
        if r["family"] == fam and bytes(r["qualifier"]) == qual:
            out.append(bytes(r["value"]))
    return out


def test_get_closest_before(spark):
    """testGetClosestBefore (:67): expired-but-floor-kept rows stay
    visible to getClosestRowBefore, at their latest version."""
    cells = [
        (R1, C0, Q0, TS, TYPE_PUT, T[1], 0),
        (R1, C0, Q0, TS + 1, TYPE_PUT, T[4], 1),
        (R3, C0, Q0, TS, TYPE_PUT, T[3], 2),
    ]
    t = _table(spark, cells, min_versions=1)
    assert _vals(t.get_row_or_before(R1, C0)) == [T[4]]
    assert _vals(t.get_row_or_before(R2, C0)) == [T[4]]


def test_store_mem_store(spark):
    """testStoreMemStore (:116): minVersions=3 keeps the 3 newest
    expired versions; the duplicate backdated re-put of (ts-3, T0)
    neither adds a version nor consumes a floor slot."""
    cells = [
        (R1, C0, Q0, TS - 1, TYPE_PUT, T[2], 0),
        (R1, C0, Q0, TS - 3, TYPE_PUT, T[0], 1),
        (R1, C0, Q0, TS, TYPE_PUT, T[3], 2),
        (R1, C0, Q0, TS - 2, TYPE_PUT, T[1], 3),
        (R1, C0, Q0, TS - 3, TYPE_PUT, T[0], 4),  # the dup re-put
    ]
    t = _table(spark, cells, min_versions=3)
    assert _vals(t.get(Get(R1, max_versions=MAXV))) == [T[3], T[2], T[1]]
    assert _vals(t.get(Get(R1, max_versions=MAXV,
                           columns=((C0, Q0),)))) == [T[3], T[2], T[1]]


def test_delete(spark):
    """testDelete (:172): a row delete at ts-1 masks the two older
    versions; the floor keeps only SURVIVING versions (T3)."""
    cells = [
        (R1, C0, Q0, TS - 2, TYPE_PUT, T[1], 0),
        (R1, C0, Q0, TS - 1, TYPE_PUT, T[2], 1),
        (R1, C0, Q0, TS, TYPE_PUT, T[3], 2),
        (R1, C0, None, TS - 1, TYPE_DELETE_FAMILY, None, 3),
    ]
    t = _table(spark, cells, min_versions=3)
    assert _vals(t.get(Get(R1, max_versions=MAXV))) == [T[3]]
    assert _vals(t.get(Get(R1, max_versions=MAXV,
                           columns=((C0, Q0),)))) == [T[3]]


def test_mem_store(spark):
    """testMemStore (:231): minVersions=2 — a backdated put below the
    floor stays invisible; a newer put shifts the floor window up."""
    cells = [
        (R1, C0, Q0, TS - 2, TYPE_PUT, T[2], 0),
        (R1, C0, Q0, TS - 1, TYPE_PUT, T[3], 1),
        (R1, C0, Q0, TS, TYPE_PUT, T[4], 2),
        (R1, C0, Q0, TS - 3, TYPE_PUT, T[1], 3),  # backdated
    ]
    t = _table(spark, cells, min_versions=2)
    assert _vals(t.get(Get(R1))) == [T[4]]
    assert _vals(t.get(Get(R1, max_versions=MAXV))) == [T[4], T[3]]
    cells.append((R1, C0, Q0, TS + 1, TYPE_PUT, T[5], 4))
    t = _table(spark, cells, min_versions=2)
    assert _vals(t.get(Get(R1, max_versions=MAXV))) == [T[5], T[4]]


def test_base_case(spark):
    """testBaseCase (:306): minVersions=2 over four expired versions —
    the floor keeps the two newest; timerange reads see only
    floor-surviving versions (the post-HBASE-4241 state)."""
    cells = [
        (R1, C0, Q0, TS - 3 + i, TYPE_PUT, T[i + 1], i) for i in range(4)
    ]
    t = _table(spark, cells, min_versions=2)
    assert _vals(t.get(Get(R1))) == [T[4]]
    assert _vals(t.get(Get(R1, time_range=(0, TS + 1)))) == [T[4]]
    assert _vals(t.get(Get(R1, max_versions=MAXV))) == [T[4], T[3]]
    assert _vals(t.get(Get(R1, max_versions=MAXV,
                           columns=((C0, Q0),)))) == [T[4], T[3]]
    # the 3rd version is reachable via timerange; older ones collected
    assert _vals(t.get(Get(R1, time_range=(0, TS)))) == [T[3]]
    assert _vals(t.get(Get(R1, time_range=(0, TS - 1)))) == []


def test_filters(spark):
    """testFilters (:399): TimestampsFilter x minVersions=2 — only the
    floor-surviving version in the requested set comes back (the
    post-compaction verdict: T2, not T2+T1)."""
    cells = []
    for i in range(4):  # versions ts-3..ts with values T0..T3
        cells.append((R1, C0, Q0, TS - 3 + i, TYPE_PUT, T[i], 2 * i))
        cells.append((R1, C1, Q1, TS - 3 + i, TYPE_PUT, T[i], 2 * i + 1))
    t = _table(spark, cells, min_versions=2, families=(C0, C1))
    tss = ast.TimestampsFilter([TS - 1, TS - 2])
    got = _vals(t.get(Get(R1, columns=((C1, Q1),), max_versions=MAXV,
                          filter=tss)), fam=C1, qual=Q1)
    assert got == [T[2]]
    got = _vals(t.get(Get(R1, columns=((C0, Q0),), max_versions=MAXV,
                          filter=tss)))
    assert got == [T[2]]
