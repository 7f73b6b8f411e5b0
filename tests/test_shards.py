"""Training-shard materialization (pipeline/shards.py).

The manifest's SQL derivation is oracle-checked via `shard_manifest`;
these tests cover the WRITER contract: the materialized shard
directories reproduce the manifest exactly (counts, token sums,
order-independent digests), shards are independently loadable, and
shard assignment respects the packing layout.
"""

from __future__ import annotations

import hashlib
import pathlib

from pyspark.sql import functions as F

from hbase_1_3_0_spark.pipeline import shards

DOCS = [
    (i, "src%d" % (i % 2), "word " * (5 + i % 7))  # 5..11 tokens each
    for i in range(40)
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, source string, text string")


def test_write_roundtrip_matches_manifest(spark, tmp_path):
    out = tmp_path / "shards"
    manifest = shards.write_training_shards(
        _docs(spark), out, capacity=32, bins_per_shard=2
    ).collect()
    want = {
        (r.source, r.shard_id): (r.n_docs, r.n_tokens, r.n_bins, r.doc_digest)
        for r in manifest
    }

    data = spark.read.parquet(f"{out}/data")
    got = {}
    for r in (
        data.groupBy("source", "shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.countDistinct("bin_id").alias("n_bins"),
            F.expr(
                "bit_xor(cast(conv(substring(md5(cast(doc_id as string)),"
                " 1, 15), 16, 10) as long))"
            ).alias("doc_digest"),
        )
        .collect()
    ):
        got[(r.source, r.shard_id)] = (
            r.n_docs,
            r.n_tokens,
            r.n_bins,
            r.doc_digest,
        )
    assert got == want

    # the persisted manifest equals the returned one
    stored = {
        (r.source, r.shard_id): (r.n_docs, r.n_tokens, r.n_bins, r.doc_digest)
        for r in spark.read.parquet(f"{out}/manifest").collect()
    }
    assert stored == want

    # every doc appears exactly once across shards
    assert data.count() == len(DOCS)
    assert data.select("doc_id").distinct().count() == len(DOCS)


def test_shards_are_independent_directories(spark, tmp_path):
    out = tmp_path / "shards2"
    manifest = shards.write_training_shards(
        _docs(spark), out, capacity=32, bins_per_shard=2
    ).collect()
    one = manifest[0]
    d = pathlib.Path(out, "data", f"source={one.source}", f"shard_id={one.shard_id}")
    assert d.is_dir()
    part = spark.read.parquet(str(d))
    assert part.count() == one.n_docs


def test_shard_assignment_follows_bins(spark, tmp_path):
    placed = shards.shard_placements(
        _docs(spark), capacity=32, bins_per_shard=2
    ).collect()
    for r in placed:
        assert r.shard_id == r.bin_id // 2
    # digest model check against hashlib
    m = {
        (r.source, r.shard_id): r.doc_digest
        for r in shards.shard_manifest(
            shards.shard_placements(_docs(spark), capacity=32, bins_per_shard=2)
        ).collect()
    }
    want: dict = {}
    for r in placed:
        h = int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[:15], 16)
        k = (r.source, r.shard_id)
        want[k] = want.get(k, 0) ^ h
    assert m == want


def test_rejects_bad_bins_per_shard(spark):
    import pytest

    with pytest.raises(ValueError):
        shards.shard_placements(_docs(spark), bins_per_shard=0)
