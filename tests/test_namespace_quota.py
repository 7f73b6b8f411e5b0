"""NamespaceAuditor quota decision tables (NamespaceAuditor.java:58
checkQuotaToCreateTable / :76 checkQuotaToUpdateRegion;
NamespaceStateManager.java:120,:148; TableNamespaceManager.java:304-308
positive-value validation)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hbase_1_3_0_spark.catalog import Catalog, QuotaExceededError, TableMeta


def test_quota_values_must_be_positive(tmp_path):
    cat = Catalog(tmp_path / "cat.json")
    with pytest.raises(ValueError, match="positive"):
        cat.create_namespace("bad", max_tables=0)
    with pytest.raises(ValueError, match="positive"):
        cat.create_namespace("bad", max_regions=-1)


def test_max_tables_enforced(tmp_path):
    cat = Catalog(tmp_path / "cat.json")
    cat.create_namespace("ns", max_tables=2)
    cat.create_table(TableMeta(name="t1", namespace="ns"))
    cat.create_table(TableMeta(name="t2", namespace="ns"))
    with pytest.raises(QuotaExceededError, match="number of tables"):
        cat.create_table(TableMeta(name="t3", namespace="ns"))
    # other namespaces unaffected
    cat.create_table(TableMeta(name="t3", namespace="default"))


def test_max_regions_enforced_on_create(tmp_path):
    cat = Catalog(tmp_path / "cat.json")
    cat.create_namespace("ns", max_regions=10)
    cat.create_table(
        TableMeta(name="t1", namespace="ns", range_partitions=6)
    )
    # 6 + 5 > 10
    with pytest.raises(QuotaExceededError, match="not allowed to have"):
        cat.create_table(
            TableMeta(name="t2", namespace="ns", range_partitions=5)
        )
    # 6 + 4 fits exactly (the reference checks >, not >=)
    cat.create_table(
        TableMeta(name="t2", namespace="ns", range_partitions=4)
    )


def test_max_regions_enforced_on_region_update(tmp_path):
    from dataclasses import replace

    cat = Catalog(tmp_path / "cat.json")
    cat.create_namespace("ns", max_regions=10)
    m1 = cat.create_table(
        TableMeta(name="t1", namespace="ns", range_partitions=6)
    )
    cat.create_table(TableMeta(name="t2", namespace="ns", range_partitions=4))
    # growing t1 6 -> 7 would push the namespace to 11
    with pytest.raises(QuotaExceededError, match="region count cannot"):
        cat.alter_table(replace(m1, range_partitions=7))
    # swapping t1 down then up within budget is fine
    cat.alter_table(replace(m1, range_partitions=2))
    cat.alter_table(replace(m1, range_partitions=6))


def test_split_table_hits_namespace_region_quota(spark, tmp_path):
    from hbase_1_3_0_spark.engine import Engine

    eng = Engine(spark, root=tmp_path / "store", now_ms=1_000)
    eng.catalog.create_namespace("ns", max_regions=4)
    cells = spark.range(64).select(
        F.encode(F.lpad(F.col("id").cast("string"), 8, "0"), "utf-8").alias(
            "row"
        ),
        F.lit("f").alias("family"),
        F.lit(b"q").alias("qualifier"),
        F.lit(1000).cast("long").alias("ts"),
        F.lit(4).cast("int").alias("type"),
        F.lit(b"v").alias("value"),
        F.lit(0).cast("long").alias("seq"),
    )
    t = eng.create_table(
        TableMeta(name="qt", namespace="ns", clean_log=True), cells
    )
    t = eng.split_table(t, 4)  # 4 regions: at the budget
    with pytest.raises(QuotaExceededError):
        eng.split_table(t, 8)
    # quota-free namespaces keep unlimited splits
    t2 = eng.create_table(TableMeta(name="qt2", clean_log=True), cells)
    eng.split_table(t2, 8)


def test_persistence_roundtrip_with_quotas(tmp_path):
    p = tmp_path / "cat.json"
    cat = Catalog(p)
    cat.create_namespace("ns", max_tables=3, max_regions=99)
    cat.create_table(TableMeta(name="t1", namespace="ns"))
    again = Catalog(p)
    assert again.namespaces() == ["default", "hbase", "ns"]
    with pytest.raises(QuotaExceededError):
        for i in range(2, 6):
            again.create_table(TableMeta(name=f"t{i}", namespace="ns"))


def test_legacy_namespace_list_still_loads(tmp_path):
    import json

    p = tmp_path / "cat.json"
    p.write_text(json.dumps({
        "namespaces": ["default", "hbase", "old"],
        "tables": [],
    }))
    cat = Catalog(p)
    assert "old" in cat.namespaces()
    cat.create_table(TableMeta(name="t", namespace="old"))  # no quotas
