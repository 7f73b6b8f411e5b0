"""Round-11 pin of TestColumnSeeking.java testDuplicateVersions (304
LoC, hbase-server/src/test/java/org/apache/hadoop/hbase/regionserver/)
— a randomized sweep of DUPLICATE-identity re-puts (same (row, column,
ts) written repeatedly with different values across put events; the
newest write wins) scanned through random explicit-column subsets and
the wildcard scanner, against a last-write-wins model keyed by
(row, column, ts). The reference interleaves random flush/minor/major
compactions to vary the physical layout — storage-physical here; the
seeded RNG replaces Math.random() for reproducibility. testReseeking
drives seek physics (not pinned)."""

from __future__ import annotations

import random

from hbase_1_3_0_spark.catalog import FamilyMeta, TableMeta
from hbase_1_3_0_spark.cells import CELL_SCHEMA, TYPE_PUT
from hbase_1_3_0_spark.table import Scan, Table

FAM = "Family"
MAXV = 2**31 - 1


def _words(rng, n, prefix):
    out = set()
    while len(out) < n:
        out.add(prefix + "".join(
            rng.choice("abcdefghijklmnopqrstuvwxyz")
            for _ in range(rng.randint(2, 6))
        ))
    return sorted(out)


def test_duplicate_versions_random_sweep(spark):
    rng = random.Random(867_5309)
    rows = _words(rng, 10, "row")
    all_columns = _words(rng, 10, "column")
    values = _words(rng, 20, "value")
    max_timestamp = 2
    select_percent, put_percent = 0.5, 0.2

    # 5 random explicit-column subsets (HBASE-7700: empty subsets skip)
    column_lists = [
        [c for c in all_columns if rng.random() < select_percent]
        for _ in range(5)
    ]

    cells = []
    model: dict[tuple, bytes] = {}  # (row, column, ts) -> last value
    seq = 0
    for value in values:
        for row in rows:
            for column in all_columns:
                for ts in range(1, max_timestamp + 1):
                    if rng.random() < put_percent:
                        cells.append((
                            row.encode(), FAM, column.encode(), ts,
                            TYPE_PUT, value.encode(), seq,
                        ))
                        seq += 1
                        model[(row, column, ts)] = value.encode()

    t = Table(
        TableMeta(name="t",
                  families=(FamilyMeta(name=FAM, max_versions=3),)),
        spark.createDataFrame(cells, CELL_SCHEMA),
        now_ms=10_000,
    )

    def got(scan_columns=None):
        kw = {}
        if scan_columns is not None:
            kw["columns"] = tuple((FAM, c.encode()) for c in scan_columns)
        return sorted(
            (bytes(r["row"]).decode(), bytes(r["qualifier"]).decode(),
             r["ts"], bytes(r["value"]))
            for r in t.scan(Scan(max_versions=MAXV, **kw)).collect()
        )

    def expected(cols=None):
        return sorted(
            (row, column, ts, val)
            for (row, column, ts), val in model.items()
            if cols is None or column in cols
        )

    # wildcard scanner
    assert got() == expected()
    # explicit-column scanners
    for cols in column_lists:
        if not cols:
            continue
        assert got(cols) == expected(set(cols))
