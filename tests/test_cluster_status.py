"""ClusterStatus / ServerLoad rollups (operators/cluster_status.py),
pinned to ClusterStatus.java:133-168 / ServerLoad.java:55-70 /
RegionLoad.java:97 semantics on a hand-checkable cluster."""

from __future__ import annotations

from hbase_1_3_0_spark.operators.cluster_status import (
    cluster_status,
    server_load,
)

RL_SCHEMA = (
    "server string, region string, stores long, storefiles long, "
    "storefile_size_mb long, memstore_size_mb long, "
    "read_requests long, write_requests long"
)

ROWS = [
    ("rs0", "r1", 2, 5, 100, 10, 40, 7),
    ("rs0", "r2", 1, 3, 50, 5, 10, 3),
    ("rs1", "r3", 1, 1, 10, 1, 1, 1),
]


def test_server_load_sums_region_loads(spark):
    rl = spark.createDataFrame(ROWS, RL_SCHEMA)
    got = {r.server: r.asDict() for r in server_load(rl).collect()}
    assert got["rs0"]["n_regions"] == 2
    assert got["rs0"]["storefiles"] == 8
    assert got["rs0"]["storefile_size_mb"] == 150
    assert got["rs0"]["requests"] == 60  # (40+7)+(10+3), read+write (:97)
    assert got["rs1"]["n_regions"] == 1 and got["rs1"]["requests"] == 2


def test_server_load_missing_metric_columns_default_zero(spark):
    rl = spark.createDataFrame(
        [("rs0", "r1"), ("rs0", "r2")], "server string, region string"
    )
    row = server_load(rl).collect()[0]
    assert row.n_regions == 2 and row.storefiles == 0 and row.requests == 0


def test_cluster_status_summary_and_empty_server(spark):
    rl = spark.createDataFrame(ROWS, RL_SCHEMA)
    out = {
        r.server: r.asDict()
        for r in cluster_status(
            rl, servers=["rs0", "rs1", "rs2"], dead_servers=("rs9", "rs10")
        ).collect()
    }
    assert set(out) == {"rs0", "rs1", "rs2"}
    # the zero-region live server gets a zero-filled ServerLoad row
    assert out["rs2"]["n_regions"] == 0 and out["rs2"]["requests"] == 0
    for r in out.values():
        assert r["servers_size"] == 3
        assert r["dead_servers"] == 2
        assert r["regions_count"] == 3  # getRegionsCount (:155)
        assert r["requests_count"] == 62  # getRequestsCount (:168)
        assert abs(r["average_load"] - 1.0) < 1e-9  # 3 regions / 3 servers


def test_cluster_status_stray_reporting_server_raises(spark):
    # In the reference every reporting server is in liveServers
    # (ClusterStatus:133); a region_loads server missing from `servers`
    # must surface, not silently undercount regions/requests.
    import pytest

    rl = spark.createDataFrame(ROWS, RL_SCHEMA)
    with pytest.raises(ValueError, match="rs1"):
        cluster_status(rl, servers=["rs0", "rs2"]).collect()


def test_last_major_compaction_ts_min_per_table(spark):
    from hbase_1_3_0_spark.operators.cluster_status import (
        last_major_compaction_ts,
    )

    rl = spark.createDataFrame(
        [("t1", 100), ("t1", 50), ("t2", None), ("t2", 7)],
        "table_name string, last_major_compaction_ts long",
    )
    got = {
        r.table_name: r.last_major_compaction_ts
        for r in last_major_compaction_ts(rl).collect()
    }
    # min over regions (:296); NULL reads as 0 (protobuf default)
    assert got == {"t1": 50, "t2": 0}


def test_engine_cluster_status_real_layout(spark, sf_dir, tmp_path):
    """Engine.cluster_status_df over a real saved layout: one
    RegionLoad row per parquet region file with true on-disk sizes,
    round-robin placed, rolled up to ClusterStatus — regions_count
    equals the physical file count, every live server gets a row, and
    storefiles sum to the file count."""
    from hbase_1_3_0_spark.catalog import TableMeta
    from hbase_1_3_0_spark.engine import Engine
    from hbase_1_3_0_spark.sources import fixtures

    eng = Engine(spark, root=tmp_path / "store", now_ms=1)
    cells = fixtures.kv_cells(spark, sf_dir, "nation")
    t = eng.create_table(
        TableMeta(name="nation", clean_log=True, range_partitions=4), cells
    )
    eng.save(t)

    out = eng.cluster_status_df(["rs0", "rs1", "rs2"],
                                dead_servers=("rs9",))
    rows = {r.server: r.asDict() for r in out.collect()}
    assert set(rows) == {"rs0", "rs1", "rs2"}
    n_files = len(eng.table("nation").cells.inputFiles())
    assert n_files >= 1
    first = next(iter(rows.values()))
    assert first["regions_count"] == n_files
    assert first["servers_size"] == 3 and first["dead_servers"] == 1
    assert sum(r["storefiles"] for r in rows.values()) == n_files
    # placement is the round-robin stride: no server exceeds its share
    assert max(r["n_regions"] for r in rows.values()) <= -(-n_files // 3) + 1
