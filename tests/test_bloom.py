"""Bloom filters (operators/bloom.py) vs a pure-Python model.

The model transliterates the engine-neutral scheme directly (md5
double hashing, fixed-point sizing) so Spark, DuckDB (the oracle), and
Python all agree bit-for-bit; plus the reference's sizing-formula
contract (ByteBloomFilter.java:157,250) and the no-false-negative
property every bloom must satisfy.
"""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from hbase_1_3_0_spark.operators import bloom


def _h32(key: str, salt: str) -> int:
    return int(hashlib.md5((key + salt).encode()).hexdigest()[:8], 16)


def _py_sizing(n_keys: int, error_rate: float) -> tuple[int, int]:
    factor = bloom.sizing_factor_micro(error_rate)
    n_bits = (n_keys * factor + 999_999) // 1_000_000
    # reference optimalFunctionCount: inner integer division FIRST
    n_hash = ((n_bits // n_keys) * 693_147 + 999_999) // 1_000_000
    return n_bits, n_hash


def _py_positions(key: str, n_bits: int, n_hash: int) -> list[int]:
    h1, h2 = _h32(key, "#b1"), _h32(key, "#b2")
    return [(h1 + i * h2) % n_bits for i in range(n_hash)]


def _py_bloom(keys: list[str], n_bits: int, n_hash: int) -> set[int]:
    bits: set[int] = set()
    for k in keys:
        bits.update(_py_positions(k, n_bits, n_hash))
    return bits


def test_sizing_matches_reference_formulas():
    # fixed-point sizing must agree with the float formulas of
    # ByteBloomFilter.computeBitSize / optimalFunctionCount (off-by-one
    # at most at exact ceil boundaries, which these counts never hit)
    log2sq = math.log(2) ** 2
    for n in (10, 188, 1000, 12345, 10**6):
        for err in (0.01, 0.03, 0.001):
            bits, k = _py_sizing(n, err)
            ref_bits = math.ceil(n * -math.log(err) / log2sq)
            ref_k = math.ceil(math.log(2) * ref_bits / n)
            assert abs(bits - ref_bits) <= 1
            assert abs(k - ref_k) <= 1
            assert k >= 1


def test_build_and_probe_match_python_model(spark):
    keys = [f"K{i:04d}" for i in range(200)]
    regions = {r: [k for i, k in enumerate(keys) if i % 4 == r] for r in range(4)}
    keyed = spark.createDataFrame(
        [(r, k) for r, ks in regions.items() for k in ks], "region long, bkey string"
    )
    sizing = bloom.bloom_sizing(
        keyed.groupBy("region").agg(F.count(F.lit(1)).alias("n_keys")),
        error_rate=0.01,
    )
    sz = {r.region: (r.n_bits, r.n_hash) for r in sizing.collect()}
    for r, ks in regions.items():
        assert sz[r] == _py_sizing(len(ks), 0.01)

    bits = bloom.build_bloom(keyed, sizing)
    got = {}
    for row in bits.collect():
        got.setdefault(row.region, set()).add(row.bit)
    for r, ks in regions.items():
        assert got[r] == _py_bloom(ks, *sz[r])

    probes = spark.createDataFrame(
        [(i, f"K{i:04d}") for i in range(0, 300, 7)], "probe_id long, bkey string"
    )
    maybe = {
        (r.probe_id, r.region)
        for r in bloom.bloom_probe(bits, sizing, probes).collect()
    }
    # python-model probe verdicts
    expect = set()
    for i in range(0, 300, 7):
        pk = f"K{i:04d}"
        for r in regions:
            n_bits, n_hash = sz[r]
            if all(p in got[r] for p in _py_positions(pk, n_bits, n_hash)):
                expect.add((i, r))
    assert maybe == expect


def test_no_false_negatives_and_bounded_false_positives(spark):
    keys = [f"row-{i}" for i in range(500)]
    keyed = spark.createDataFrame(
        [(i % 2, k) for i, k in enumerate(keys)], "region long, bkey string"
    )
    sizing = bloom.bloom_sizing(
        keyed.groupBy("region").agg(F.count(F.lit(1)).alias("n_keys")),
        error_rate=0.01,
    )
    bits = bloom.build_bloom(keyed, sizing)
    present = spark.createDataFrame(
        [(i, f"row-{i}") for i in range(0, 500, 11)], "probe_id long, bkey string"
    )
    maybe = {
        (r.probe_id, r.region)
        for r in bloom.bloom_probe(bits, sizing, present).collect()
    }
    for i in range(0, 500, 11):
        assert (i, i % 2) in maybe, "bloom false negative"

    absent = spark.createDataFrame(
        [(i, f"row-{i}") for i in range(10_000, 10_400)],
        "probe_id long, bkey string",
    )
    fp = bloom.bloom_probe(bits, sizing, absent).count()
    # 400 absent probes x 2 regions at 1% nominal error: expect ~8,
    # allow generous slack for the md5-hash variance
    assert fp <= 40


def test_rowcol_key_distinguishes_columns(spark):
    df = spark.createDataFrame(
        [("r1", "d", "qa"), ("r1", "d", "qb")], "row string, fam string, qual string"
    )
    out = df.select(
        bloom.bloom_key(
            F.encode("row", "UTF-8"),
            F.encode("fam", "UTF-8"),
            F.encode("qual", "UTF-8"),
        ).alias("rc"),
        bloom.bloom_key(F.encode("row", "UTF-8")).alias("r"),
    ).collect()
    assert out[0].rc != out[1].rc  # ROWCOL: different columns differ
    assert out[0].r == out[1].r  # ROW: same row key collapses


def test_sizing_rejects_bad_error_rate():
    with pytest.raises(ValueError):
        bloom.sizing_factor_micro(0.0)
    with pytest.raises(ValueError):
        bloom.sizing_factor_micro(1.5)


def test_presplit_pruned_point_reads(spark, tmp_path):
    """End-to-end read-path integration: write a pre-split cell log,
    build per-region blooms from the partition layout, and multi-get
    through them — results match an unpruned lookup, no false
    negatives, and the pruned scan OPENS FEWER FILES (the partition
    filter actually prunes region directories)."""
    from hbase_1_3_0_spark.sources import writer
    from hbase_1_3_0_spark.sources.kv_encoder import table_to_cells

    df = spark.range(0, 400).select(
        F.lpad(F.col("id").cast("string"), 8, "0").alias("k"),
        (F.col("id") * 3).alias("v"),
    )
    cells = table_to_cells(df, ["k"], ["v"])
    splits = [f"{i:08d}".encode() for i in (100, 200, 300)]
    path = tmp_path / "presplit"
    writer.write_cells(cells, path, split_points=splits)

    bits, sizing = bloom.bloom_for_presplit_table(spark, path)
    assert {r.region for r in sizing.collect()} == {0, 1, 2, 3}

    probe_ids = [5, 150, 399, 4000, 9999]  # 3 present, 2 absent
    probes = spark.createDataFrame(
        [(i, f"{i:08d}") for i in probe_ids], "probe_id long, k string"
    ).select("probe_id", F.encode("k", "UTF-8").alias("row"))

    got = bloom.pruned_point_reads(spark, path, probes, bits, sizing)
    rows = got.collect()
    hit_keys = {bytes(r.row).decode() for r in rows}
    assert hit_keys == {"00000005", "00000150", "00000399"}
    # every present key yields all its cells (no false negatives)
    assert len(rows) == 3  # one value column x 3 present keys

    # the pruned scan must not open every region directory: present
    # keys live in regions 0, 1, 3 — region 2's files stay closed
    # unless a bloom false positive pulls it in (allowed, rare)
    opened = {f.split("region=")[1].split("/")[0] for f in got.inputFiles()}
    assert "0" in opened and "1" in opened and "3" in opened
    total = {
        f.split("region=")[1].split("/")[0]
        for f in spark.read.parquet(str(path)).inputFiles()
    }
    assert len(total) == 4
    assert len(opened) <= 4  # typically 3; ==4 only on a false positive


def test_pruned_point_reads_no_candidates(spark, tmp_path):
    from hbase_1_3_0_spark.sources import writer
    from hbase_1_3_0_spark.sources.kv_encoder import table_to_cells

    df = spark.range(0, 50).select(
        F.lpad(F.col("id").cast("string"), 8, "0").alias("k"),
        F.col("id").alias("v"),
    )
    path = tmp_path / "presplit2"
    writer.write_cells(
        table_to_cells(df, ["k"], ["v"]), path, split_points=[b"00000025"]
    )
    bits, sizing = bloom.bloom_for_presplit_table(spark, path)
    absent = spark.createDataFrame(
        [(1, "zzzzzzzz")], "probe_id long, k string"
    ).select("probe_id", F.encode("k", "UTF-8").alias("row"))
    out = bloom.pruned_point_reads(spark, path, absent, bits, sizing)
    assert out.count() == 0 or out.count() <= 2  # false positive tolerated


def _chunk_cells(spark, lo, hi):
    return spark.createDataFrame(
        [(i % 4, f"row-{i:06d}".encode()) for i in range(lo, hi)],
        "region long, row binary",
    )


def test_streaming_bloom_store_multi_batch(spark, tmp_path):
    """One bloom chunk per micro-batch (the flush-time
    CompoundBloomFilter analog): keys from EVERY batch stay probe-able
    (union over chunks, no false negatives), re-delivered batches
    rewrite their own partitions idempotently, and the rebuild
    compaction folds chunks into a batch_id=-1 base with identical
    verdicts."""
    bloom_dir = str(tmp_path / "bloom_store")
    bloom.bloom_ingest_update(spark, _chunk_cells(spark, 0, 200), 0, bloom_dir=bloom_dir)
    bloom.bloom_ingest_update(spark, _chunk_cells(spark, 200, 350), 1, bloom_dir=bloom_dir)
    bloom.bloom_ingest_update(spark, _chunk_cells(spark, 350, 500), 2, bloom_dir=bloom_dir)

    def probe_df(ids):
        return spark.createDataFrame(
            [(i, f"row-{i:06d}".encode()) for i in ids],
            "probe_id long, row binary",
        ).select("probe_id", bloom.bloom_key(F.col("row")).alias("bkey"))

    present = list(range(0, 500, 37))
    got = {
        (r.probe_id, r.region)
        for r in bloom.bloom_store_probe(spark, bloom_dir, probe_df(present)).collect()
    }
    for i in present:
        assert (i, i % 4) in got, f"false negative for key from batch {i // 200}"

    # replay idempotence: rewriting batch 1 leaves identical verdicts
    bloom.bloom_ingest_update(spark, _chunk_cells(spark, 200, 350), 1, bloom_dir=bloom_dir)
    got2 = {
        (r.probe_id, r.region)
        for r in bloom.bloom_store_probe(spark, bloom_dir, probe_df(present)).collect()
    }
    assert got2 == got

    # compaction: rebuild the base from the full key set, fold 0..1
    all_cells = _chunk_cells(spark, 0, 500)
    bloom.rebuild_bloom_base(spark, all_cells, bloom_dir, up_to_batch=1)
    import pathlib

    bids = {
        p.name
        for p in pathlib.Path(bloom_dir, "bits").glob("batch_id=*")
    }
    assert bids == {"batch_id=-1", "batch_id=2"}
    got3 = {
        (r.probe_id, r.region)
        for r in bloom.bloom_store_probe(spark, bloom_dir, probe_df(present)).collect()
    }
    for i in present:
        assert (i, i % 4) in got3  # still no false negatives post-fold

    absent = probe_df(list(range(10_000, 10_200)))
    fp = bloom.bloom_store_probe(spark, bloom_dir, absent).count()
    assert fp <= 60  # 200 probes x 4 regions x 2 chunks at ~1%


def test_rebuild_bloom_base_rejects_remote_uri(spark):
    import pytest as _pytest

    with _pytest.raises(ValueError):
        bloom.rebuild_bloom_base(
            spark,
            spark.createDataFrame([], "region long, row binary"),
            "s3://bucket/blooms",
            up_to_batch=0,
        )


def test_per_file_blooms_prune_file_opens(spark, tmp_path):
    """Per-HFile-granularity blooms on the default (no region column)
    layout: build per-parquet-file blooms via input_file_name, probe a
    multi-get batch, and read ONLY candidate files — inputFiles() on
    the result shows non-candidate files never open."""
    from hbase_1_3_0_spark.sources import writer
    from hbase_1_3_0_spark.sources.kv_encoder import table_to_cells

    df = spark.range(0, 600).select(
        F.lpad(F.col("id").cast("string"), 8, "0").alias("k"),
        (F.col("id") + 7).alias("v"),
    )
    path = tmp_path / "flat"
    writer.write_cells(table_to_cells(df, ["k"], ["v"]), path, num_partitions=6)

    bits, sizing = bloom.bloom_per_file(spark, path)
    n_files = sizing.count()
    assert n_files == 6

    probes = spark.createDataFrame(
        [(i, f"{i:08d}".encode()) for i in (3, 250, 599, 70_000)],
        "probe_id long, row binary",
    )
    got = bloom.pruned_file_reads(spark, probes, bits, sizing)
    rows = got.collect()
    assert {bytes(r.row).decode() for r in rows} == {
        "00000003",
        "00000250",
        "00000599",
    }
    # 3 present keys live in at most 3 distinct files; absent key adds
    # none (modulo rare false positives)
    assert len(set(got.inputFiles())) <= 4 < n_files

    none = bloom.pruned_file_reads(
        spark,
        spark.createDataFrame(
            [(1, b"zzzzzzzz")], "probe_id long, row binary"
        ),
        bits,
        sizing,
    )
    assert none.count() <= 1  # empty, or one rare false positive key
