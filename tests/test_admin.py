"""Admin-surface analogs: truncate, snapshot clone/restore, region
boundaries, split (Admin.java / RegionLocator.java)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hbase_1_3_0_spark.catalog import TableMeta
from hbase_1_3_0_spark.engine import Engine
from hbase_1_3_0_spark.sources import fixtures


@pytest.fixture()
def eng(spark, sf_dir, tmp_path):
    e = Engine(spark, root=tmp_path / "store", now_ms=9_000_000)
    cells = fixtures.kv_cells(spark, sf_dir, "nation")
    t = e.create_table(TableMeta(name="nation", clean_log=True), cells)
    e.save(t)
    return e


def test_truncate_keeps_schema_drops_data(eng):
    t = eng.table("nation")
    assert t.scan().count() > 0
    t2 = eng.truncate_table(t)
    assert t2.scan().count() == 0
    assert "default:nation" in eng.catalog.tables()


def test_snapshot_clone_and_restore(eng):
    t = eng.table("nation")
    before = t.scan().count()
    eng.snapshot(t, "s1")
    assert eng.list_snapshots() == ["s1"]

    clone = eng.clone_snapshot("s1", TableMeta(name="nation2", clean_log=True))
    assert clone.scan().count() == before

    # mutate the original, then roll back
    t = eng.table("nation")
    trunc = eng.truncate_table(t)
    eng.save(trunc)
    assert eng.table("nation").scan().count() == 0
    restored = eng.restore_snapshot(trunc, "s1")
    assert restored.scan().count() == before

    eng.delete_snapshot("s1")
    assert eng.list_snapshots() == []


def test_drop_table_removes_catalog_entry(eng):
    t = eng.table("nation")
    eng.drop_table(t)
    assert "default:nation" not in eng.catalog.tables()
    with pytest.raises(KeyError):
        eng.table("nation")


def test_region_boundaries_cover_disjoint_sorted_ranges(eng):
    t = eng.table("nation")
    t4 = eng.split_table(t, 4)
    bounds = eng.region_boundaries(t4).collect()
    assert len(bounds) == 4
    assert sum(r.cells for r in bounds) == t4.cells.count()
    # regions are row-range partitioned: consecutive ranges don't overlap
    for a, b in zip(bounds, bounds[1:]):
        assert bytes(a.end_key) <= bytes(b.start_key)
