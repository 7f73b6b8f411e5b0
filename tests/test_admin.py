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


def test_create_table_with_split_keys_roundtrip(spark, sf_dir, tmp_path):
    """Admin.createTable(desc, splitKeys) analog: split points persist in
    the catalog and pin the saved layout to one directory per region."""
    from hbase_1_3_0_spark.catalog import TableMeta
    from hbase_1_3_0_spark.engine import Engine
    from hbase_1_3_0_spark.sources import fixtures

    eng = Engine(spark, root=tmp_path, now_ms=1)
    splits = (b"0000000000000000008", b"0000000000000000016")
    meta = TableMeta(name="nation_presplit", split_points=splits)
    cells = fixtures.kv_cells(spark, sf_dir, "nation")
    t = eng.create_table(meta, cells)
    saved = eng.save(t)
    assert saved.cells.count() == cells.count()
    # region directories exist at the declared boundaries
    region_dirs = sorted(
        p.name for p in (tmp_path / "default" / "nation_presplit").iterdir()
        if p.name.startswith("region=")
    )
    assert region_dirs == ["region=0", "region=1", "region=2"]
    # catalog JSON roundtrip preserves the byte boundaries
    eng2 = Engine(spark, root=tmp_path, now_ms=1)
    assert eng2.catalog.describe("nation_presplit").split_points == splits


def test_merge_table_halves_regions_scan_unchanged(eng):
    """Admin.mergeRegions analog (Admin.java:778): adjacent regions
    coalesce pairwise; boundary count halves, cells identical."""
    t = eng.table("nation")
    t4 = eng.split_table(t, 4)
    before = {
        (bytes(r.row), r.family, bytes(r.qualifier))
        for r in t4.scan().collect()
    }
    t2 = eng.merge_table(t4, factor=2)
    bounds = eng.region_boundaries(t2).collect()
    assert len(bounds) == 2
    after = {
        (bytes(r.row), r.family, bytes(r.qualifier))
        for r in t2.scan().collect()
    }
    assert after == before
    for a, b in zip(bounds, bounds[1:]):
        assert bytes(a.end_key) <= bytes(b.start_key)


def test_merge_table_presplit_drops_boundaries(spark, sf_dir, tmp_path):
    """Pre-split layout: merging in groups of 2 keeps every 2nd boundary,
    so 3 boundaries (4 regions) -> 1 boundary (2 regions)."""
    from hbase_1_3_0_spark.catalog import TableMeta
    from hbase_1_3_0_spark.engine import Engine
    from hbase_1_3_0_spark.sources import fixtures

    eng2 = Engine(spark, root=tmp_path, now_ms=1)
    splits = (
        b"0000000000000000006",
        b"0000000000000000012",
        b"0000000000000000018",
    )
    meta = TableMeta(name="nation_merge", split_points=splits)
    cells = fixtures.kv_cells(spark, sf_dir, "nation")
    t = eng2.save(eng2.create_table(meta, cells))
    n_cells = t.scan().count()
    merged = eng2.merge_table(t, factor=2)
    assert merged.meta.split_points == (b"0000000000000000012",)
    assert eng2.catalog.describe("nation_merge").split_points == (
        b"0000000000000000012",
    )
    assert merged.scan().count() == n_cells


def test_merge_table_factor_exceeding_regions_pins_one(spark, sf_dir, tmp_path):
    """factor >= region count drops every boundary; the result must be
    ONE pinned region, not default sampled partitioning."""
    from hbase_1_3_0_spark.catalog import TableMeta
    from hbase_1_3_0_spark.engine import Engine
    from hbase_1_3_0_spark.sources import fixtures

    eng2 = Engine(spark, root=tmp_path, now_ms=1)
    splits = (b"0000000000000000008", b"0000000000000000016")
    meta = TableMeta(name="nation_merge_all", split_points=splits)
    cells = fixtures.kv_cells(spark, sf_dir, "nation")
    t = eng2.save(eng2.create_table(meta, cells))
    merged = eng2.merge_table(t, factor=4)
    assert merged.meta.split_points is None
    assert merged.meta.range_partitions == 1
    assert len(eng2.region_boundaries(merged).collect()) == 1


def test_export_snapshot_roundtrip(eng, spark, tmp_path):
    """ExportSnapshot.java:88 analog: export to a second storage root,
    manifest-verify the target, clone from it on a second engine."""
    from hbase_1_3_0_spark.engine import CorruptedSnapshotError, Engine

    t = eng.table("nation")
    before = t.scan().count()
    eng.snapshot(t, "s1")
    dest_root = tmp_path / "cluster2"

    out = eng.export_snapshot("s1", dest_root)
    assert out == dest_root / "_snapshots" / "s1"
    n_files = Engine.verify_snapshot(out)
    assert n_files > 0
    assert not (dest_root / "_snapshots" / ".tmp" / "s1").exists()

    # the exported snapshot is usable by an engine on the target root
    eng2 = Engine(spark, root=dest_root, now_ms=1)
    clone = eng2.clone_snapshot("s1", TableMeta(name="nation", clean_log=True))
    assert clone.scan().count() == before

    # -overwrite posture (:936): refuse an existing target by default
    with pytest.raises(FileExistsError, match="already exists"):
        eng.export_snapshot("s1", dest_root)
    eng.export_snapshot("s1", dest_root, overwrite=True)

    # -target rename (:872)
    out2 = eng.export_snapshot("s1", dest_root, target_name="s1-copy")
    assert out2.name == "s1-copy"

    # verify catches tampering: truncate a data file
    victim = next(
        p for p in sorted(out.rglob("*"))
        if p.is_file() and p.name != "_manifest.json"
    )
    victim.write_bytes(victim.read_bytes()[:-1])
    with pytest.raises(CorruptedSnapshotError, match="size mismatch"):
        Engine.verify_snapshot(out)
    # and unreferenced foreign files
    Engine.verify_snapshot(out2)
    (out2 / "stray.bin").write_bytes(b"x")
    with pytest.raises(CorruptedSnapshotError, match="unreferenced"):
        Engine.verify_snapshot(out2)


def test_export_snapshot_missing_source(eng, tmp_path):
    with pytest.raises(KeyError, match="no such snapshot"):
        eng.export_snapshot("nope", tmp_path / "d")


def test_export_snapshot_nested_manifest_is_data(eng, tmp_path):
    """Only the TOP-LEVEL _manifest.json is export metadata; a nested
    file of the same name must be digest-verified like any data file,
    and a stray nested one must be flagged as unreferenced."""
    from hbase_1_3_0_spark.engine import CorruptedSnapshotError, Engine

    t = eng.table("nation")
    eng.snapshot(t, "snm")
    # plant a nested _manifest.json INSIDE the snapshot source tree so
    # it's copied as data
    src = next(p for p in (eng.root / "_snapshots").iterdir()
               if p.name == "snm")
    sub = src / "subdir"
    sub.mkdir()
    (sub / "_manifest.json").write_text("payload")

    out = eng.export_snapshot("snm", tmp_path / "c2")
    Engine.verify_snapshot(out)
    # tampering with the NESTED one must now be caught
    (out / "subdir" / "_manifest.json").write_text("tampered!!")
    with pytest.raises(CorruptedSnapshotError):
        Engine.verify_snapshot(out)

    # a stray nested _manifest.json added post-export is unreferenced
    out2 = eng.export_snapshot("snm", tmp_path / "c3")
    (out2 / "subdir2").mkdir()
    (out2 / "subdir2" / "_manifest.json").write_text("foreign")
    with pytest.raises(CorruptedSnapshotError, match="unreferenced"):
        Engine.verify_snapshot(out2)
