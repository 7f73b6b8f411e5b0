"""fan_out_small_scan gating (pipeline/parallelism.py) — the r14
trigger: few files AND small bytes fan out; few LARGE files pass
through untouched (the ADVICE few-big-splittable-files case)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hbase_1_3_0_spark.pipeline.parallelism import (
    _should_fan_out,
    fan_out_small_scan,
)


def test_should_fan_out_decision_core():
    mb = 128 * 1024 * 1024
    # small single-file corpus on 32 cores: fan out
    assert _should_fan_out(1, 5 * 1024 * 1024, 32, mb)
    # many files: never (each file is >= one scan task)
    assert not _should_fan_out(32, 5 * 1024 * 1024, 32, mb)
    assert not _should_fan_out(4000, 10**13, 2000, mb)
    # few LARGE files (16 x 100 GB, 2000 cores): the scan already
    # splits by byte range — must NOT shuffle the corpus
    assert not _should_fan_out(16, 16 * 100 * 1024**3, 2000, mb)
    # ceiling is cores-proportional: the same corpus on enough cores
    # that bytes/core < maxPartitionBytes... still capped by file count
    assert not _should_fan_out(0, 0, 32, mb)
    # boundary: exactly target * maxPartitionBytes bytes -> no
    assert not _should_fan_out(2, 32 * mb, 32, mb)


def test_fan_out_small_file_adds_repartition(spark, tmp_path):
    p = str(tmp_path / "small")
    spark.range(1000).coalesce(1).write.parquet(p)
    df = spark.read.parquet(p)
    target = spark.sparkContext.defaultParallelism
    out = fan_out_small_scan(df)
    assert "RoundRobinPartitioning" in out._jdf.queryExecution().toString()
    assert out.rdd.getNumPartitions() == target
    # values untouched
    assert out.agg(F.sum("id")).first()[0] == df.agg(F.sum("id")).first()[0]


def test_fan_out_large_input_passes_through(spark, tmp_path):
    """A single file whose size exceeds cores * maxPartitionBytes must
    keep its plan unchanged (no added Exchange). Exercised by shrinking
    maxPartitionBytes so a modest test file counts as 'large'."""
    p = str(tmp_path / "big")
    spark.range(2_000_000).coalesce(1).write.parquet(p)
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        # file is ~8-16 MB; make the ceiling cores * 4KB so it exceeds it
        spark.conf.set("spark.sql.files.maxPartitionBytes", "4096")
        df = spark.read.parquet(p)
        out = fan_out_small_scan(df)
        assert out is df
        plan = out._jdf.queryExecution().toString()
        assert "RoundRobinPartitioning" not in plan
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_fan_out_non_file_source_passes_through(spark):
    df = spark.range(10)
    out = fan_out_small_scan(df)
    assert out is df
    assert out.count() == 10
