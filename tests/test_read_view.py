"""Read-view decision table: versions x tombstone kinds x TTL x timerange.

Encodes the ScanQueryMatcher semantics (ScanQueryMatcher.java:283-410) as
explicit scenarios — the SURVEY.md §7 watch-list #1 tests, written first.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hbase_1_3_0_spark.cells import (
    CELL_SCHEMA,
    TYPE_DELETE_COLUMN,
    TYPE_DELETE_FAMILY,
    TYPE_DELETE_FAMILY_VERSION,
    TYPE_DELETE_VERSION,
    TYPE_PUT,
)
from hbase_1_3_0_spark.operators.read_view import read_view


def mk(spark, rows):
    """rows: (row, family, qualifier, ts, type, value, seq)"""
    data = [
        (
            r[0].encode() if isinstance(r[0], str) else r[0],
            r[1],
            r[2].encode() if isinstance(r[2], str) else r[2],
            r[3],
            r[4],
            (r[5].encode() if isinstance(r[5], str) else r[5]),
            r[6] if len(r) > 6 else 0,
        )
        for r in rows
    ]
    return spark.createDataFrame(data, CELL_SCHEMA)


def visible(df, **kw):
    out = read_view(df, **kw)
    return sorted(
        (bytes(r.row).decode(), r.family, bytes(r.qualifier).decode(), r.ts,
         bytes(r.value).decode() if r.value is not None else None)
        for r in out.collect()
    )


def test_newest_version_wins_default(spark):
    cells = mk(spark, [
        ("r1", "d", "q", 100, TYPE_PUT, "old"),
        ("r1", "d", "q", 200, TYPE_PUT, "new"),
    ])
    assert visible(cells) == [("r1", "d", "q", 200, "new")]


def test_seq_breaks_ts_ties(spark):
    cells = mk(spark, [
        ("r1", "d", "q", 100, TYPE_PUT, "first", 1),
        ("r1", "d", "q", 100, TYPE_PUT, "second", 2),
    ])
    assert visible(cells) == [("r1", "d", "q", 100, "second")]


def test_max_versions_returns_n_newest(spark):
    cells = mk(spark, [
        ("r1", "d", "q", t, TYPE_PUT, f"v{t}") for t in (100, 200, 300, 400)
    ])
    got = visible(cells, max_versions=3)
    assert got == [
        ("r1", "d", "q", 200, "v200"),
        ("r1", "d", "q", 300, "v300"),
        ("r1", "d", "q", 400, "v400"),
    ]


def test_delete_version_masks_exact_ts_only(spark):
    cells = mk(spark, [
        ("r1", "d", "q", 100, TYPE_PUT, "a"),
        ("r1", "d", "q", 200, TYPE_PUT, "b"),
        ("r1", "d", "q", 200, TYPE_DELETE_VERSION, None),
    ])
    assert visible(cells, max_versions=5) == [("r1", "d", "q", 100, "a")]


def test_delete_column_masks_at_and_older(spark):
    cells = mk(spark, [
        ("r1", "d", "q", 100, TYPE_PUT, "a"),
        ("r1", "d", "q", 200, TYPE_PUT, "b"),
        ("r1", "d", "q", 300, TYPE_PUT, "c"),
        ("r1", "d", "q", 200, TYPE_DELETE_COLUMN, None),
        ("r1", "d", "other", 150, TYPE_PUT, "x"),
    ])
    assert visible(cells, max_versions=5) == [
        ("r1", "d", "other", 150, "x"),
        ("r1", "d", "q", 300, "c"),
    ]


def test_delete_family_masks_all_columns_at_and_older(spark):
    cells = mk(spark, [
        ("r1", "d", "q1", 100, TYPE_PUT, "a"),
        ("r1", "d", "q2", 200, TYPE_PUT, "b"),
        ("r1", "d", "q3", 300, TYPE_PUT, "c"),
        ("r1", "d", None, 250, TYPE_DELETE_FAMILY, None),
        ("r1", "x", "q1", 100, TYPE_PUT, "other-family"),
    ])
    assert visible(cells, max_versions=5) == [
        ("r1", "d", "q3", 300, "c"),
        ("r1", "x", "q1", 100, "other-family"),
    ]


def test_delete_family_version_masks_exact_ts_across_family(spark):
    cells = mk(spark, [
        ("r1", "d", "q1", 100, TYPE_PUT, "a"),
        ("r1", "d", "q2", 100, TYPE_PUT, "b"),
        ("r1", "d", "q2", 200, TYPE_PUT, "c"),
        ("r1", "d", None, 100, TYPE_DELETE_FAMILY_VERSION, None),
    ])
    assert visible(cells, max_versions=5) == [("r1", "d", "q2", 200, "c")]


def test_delete_then_put_older_stays_masked(spark):
    # the classic gotcha: a put with ts <= a later-written delete marker is
    # still masked (masking is by timestamp, not arrival order)
    cells = mk(spark, [
        ("r1", "d", "q", 200, TYPE_DELETE_COLUMN, None, 1),
        ("r1", "d", "q", 150, TYPE_PUT, "late-arriving-old-ts", 2),
    ])
    assert visible(cells, max_versions=5) == []


def test_delete_then_put_newer_visible(spark):
    cells = mk(spark, [
        ("r1", "d", "q", 200, TYPE_DELETE_COLUMN, None, 1),
        ("r1", "d", "q", 201, TYPE_PUT, "newer", 2),
    ])
    assert visible(cells, max_versions=5) == [("r1", "d", "q", 201, "newer")]


def test_time_range_half_open_and_versions_within_range(spark):
    cells = mk(spark, [
        ("r1", "d", "q", t, TYPE_PUT, f"v{t}") for t in (100, 200, 300, 400)
    ])
    # [100, 300) excludes 300 and 400; max_versions=1 picks newest IN RANGE
    assert visible(cells, time_range=(100, 300)) == [("r1", "d", "q", 200, "v200")]


def test_raw_scan_exposes_markers_and_all_versions(spark):
    cells = mk(spark, [
        ("r1", "d", "q", 100, TYPE_PUT, "a"),
        ("r1", "d", "q", 200, TYPE_DELETE_COLUMN, None),
    ])
    out = read_view(cells, raw=True, max_versions=2**31 - 1)
    assert out.count() == 2


def test_raw_scan_respects_scan_max_versions(spark):
    """TestFromClientSide.java:5526 testRawScanRespectsVersions: raw
    exposes markers but still caps at the SCAN's maxVersions (markers
    count as cells of their column); default maxVersions=1 -> newest."""
    cells = mk(spark, [
        ("r1", "d", "q", 100, TYPE_PUT, "a"),
        ("r1", "d", "q", 200, TYPE_PUT, "b"),
        ("r1", "d", "q", 300, TYPE_DELETE_COLUMN, None),
    ])
    assert read_view(cells, raw=True, max_versions=2**31 - 1).count() == 3
    got2 = read_view(cells, raw=True, max_versions=2).collect()
    assert sorted(r.ts for r in got2) == [200, 300]  # 2 newest, marker counted
    got1 = read_view(cells, raw=True).collect()  # default maxVersions=1
    assert [r.ts for r in got1] == [300]


def test_ttl_expiry_with_min_versions_floor(spark):
    now = 1_000_000_000
    ttl = 100  # seconds => floor = now - 100_000
    cells = mk(spark, [
        ("r1", "d", "q", now - 300_000, TYPE_PUT, "ancient"),
        ("r1", "d", "q", now - 200_000, TYPE_PUT, "old"),
        ("r1", "d", "q", now - 50_000, TYPE_PUT, "fresh"),
        ("r2", "d", "q", now - 200_000, TYPE_PUT, "only-old"),
    ])
    # min_versions=0: expired cells drop entirely
    got = visible(cells, max_versions=5, ttl_seconds=ttl, now_ms=now)
    assert got == [("r1", "d", "q", now - 50_000, "fresh")]
    # min_versions=1: newest survives expiry even when out of TTL
    got = visible(cells, max_versions=5, ttl_seconds=ttl, min_versions=1, now_ms=now)
    assert got == [
        ("r1", "d", "q", now - 50_000, "fresh"),
        ("r2", "d", "q", now - 200_000, "only-old"),
    ]


def test_keep_deleted_cells_time_travel(spark):
    cells = mk(spark, [
        ("r1", "d", "q", 100, TYPE_PUT, "v1"),
        ("r1", "d", "q", 300, TYPE_DELETE_COLUMN, None),
    ])
    # KEEP_DELETED_CELLS=FALSE: masked even for past reads
    assert visible(cells, time_range=(0, 200), keep_deleted_cells="FALSE") == []
    # TRUE: a time-range read below the marker ts sees through the delete
    assert visible(cells, time_range=(0, 200), keep_deleted_cells="TRUE") == [
        ("r1", "d", "q", 100, "v1")
    ]


def test_masking_is_per_row_and_family(spark):
    cells = mk(spark, [
        ("r1", "d", "q", 100, TYPE_PUT, "r1v"),
        ("r2", "d", "q", 100, TYPE_PUT, "r2v"),
        ("r1", "d", None, 500, TYPE_DELETE_FAMILY, None),
    ])
    assert visible(cells, max_versions=5) == [("r2", "d", "q", 100, "r2v")]


def test_cell_filter_runs_before_version_count(spark):
    """ScanQueryMatcher order: the filter verdict precedes ColumnTracker
    version counting (ScanQueryMatcher.java:283-410) — with VERSIONS=1 a
    newer version failing a ValueFilter is SKIPped (not counted), so the
    newest PASSING version is returned."""
    from hbase_1_3_0_spark.catalog import FamilyMeta, TableMeta
    from hbase_1_3_0_spark.table import Table

    cells = mk(spark, [
        ("r1", "d", "q", 100, TYPE_PUT, "keep"),
        ("r1", "d", "q", 200, TYPE_PUT, "drop"),
        ("r2", "d", "q", 100, TYPE_PUT, "drop"),
    ])
    t = Table(
        TableMeta(name="t", families=(FamilyMeta(max_versions=3),)),
        cells,
        now_ms=1_000_000,
    )
    got = [
        (bytes(r.row).decode(), r.ts, bytes(r.value).decode())
        for r in t.scan(filter="ValueFilter (=, 'binary:keep')").collect()
    ]
    assert got == [("r1", 100, "keep")]

    # tombstones still mask before the filter sees the cell
    cells2 = mk(spark, [
        ("r1", "d", "q", 100, TYPE_PUT, "keep"),
        ("r1", "d", "q", 150, TYPE_DELETE_COLUMN, None),
        ("r1", "d", "q", 200, TYPE_PUT, "drop"),
    ])
    t2 = Table(TableMeta(name="t2"), cells2, now_ms=1_000_000)
    assert t2.scan(filter="ValueFilter (=, 'binary:keep')").count() == 0
