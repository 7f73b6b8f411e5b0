"""Blooms + dedup maintained by the SAME ingest stream — the composed
flush path: the reference writes a store file AND its bloom chunk at
every memstore flush (CompoundBloomFilterWriter rides the HFile
writer); here each micro-batch commit runs the digest dedup and then
writes the surviving keys' bloom chunk under the same batch_id, so the
two stores advance in lockstep and replay idempotence covers both."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from hbase_1_3_0_spark.operators import bloom
from hbase_1_3_0_spark.streaming import wal as walmod


def _mk_source(spark, tmp_path):
    """3 single-file micro-batches; batch 1 re-crawls two batch-0 docs
    (exact dup text) and batch 2 one of batch 1's."""
    texts = {
        0: [(1, "alpha doc one"), (2, "beta doc two"), (3, "gamma three")],
        1: [(4, "delta four"), (1001, "alpha doc one"), (5, "eps five"),
            (1002, "beta doc two")],
        2: [(6, "zeta six"), (2001, "delta four"), (7, "eta seven")],
    }
    src = tmp_path / "src"
    src.mkdir()
    for b, rows in texts.items():
        scratch = tmp_path / f"scratch{b}"
        (
            spark.createDataFrame(rows, "doc_id long, text string")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(str(scratch))
        )
        part = glob.glob(f"{scratch}/part-*.parquet")[0]
        import shutil

        shutil.copy(part, src / f"b{b}.parquet")
    return src, texts


def _cells_of(survivors):
    return survivors.select(
        F.encode(F.lpad(F.col("doc_id").cast("string"), 8, "0"), "utf-8"
                 ).alias("row"),
        (F.col("doc_id") % 4).alias("region"),
    )


@pytest.fixture()
def pipeline(spark, tmp_path):
    src, texts = _mk_source(spark, tmp_path)
    dirs = {
        "out": str(tmp_path / "out"),
        "store": str(tmp_path / "store"),
        "bloom": str(tmp_path / "bloom"),
        "ckpt": str(tmp_path / "ckpt"),
    }

    def process(batch_df, batch_id):
        walmod._dedup_commit_batch(
            spark, batch_df, batch_id,
            out_dir=dirs["out"], store_dir=dirs["store"],
        )
        survivors = spark.read.parquet(dirs["out"]).where(
            F.col("batch_id") == batch_id
        )
        bloom.bloom_ingest_update(
            spark, _cells_of(survivors), batch_id, bloom_dir=dirs["bloom"]
        )

    q = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", dirs["ckpt"])
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark, dirs, process, src


def _probe_ids(spark, bloom_dir, doc_ids):
    probes = spark.createDataFrame(
        [(d, f"{d:08d}".encode()) for d in doc_ids],
        "probe_id long, row binary",
    ).select("probe_id", bloom.bloom_key(F.col("row")).alias("bkey"))
    return bloom.bloom_store_probe(spark, bloom_dir, probes)


def test_stream_maintains_both_stores_in_lockstep(pipeline):
    spark, dirs, _, _src = pipeline
    accepted = {
        r.doc_id for r in spark.read.parquet(dirs["out"]).collect()
    }
    # dups dropped by the digest store across batches
    assert accepted == {1, 2, 3, 4, 5, 6, 7}
    # every accepted doc's key passes the compound bloom probe in its
    # own region (no false negatives across chunks)
    got = {
        (r.probe_id, r.region)
        for r in _probe_ids(spark, dirs["bloom"], sorted(accepted)).collect()
    }
    assert {(d, d % 4) for d in accepted} <= got
    # rejected re-crawl ids never entered the bloom store
    chunks = spark.read.parquet(f"{dirs['bloom']}/sizing")
    n_batches = {r.batch_id for r in chunks.select("batch_id").collect()}
    assert n_batches == {0, 1, 2}  # one chunk set per micro-batch


def test_replayed_batch_rewrites_not_duplicates(pipeline):
    """Re-delivering the LAST batch (the only one Structured Streaming
    ever replays after a crash — foreachBatch re-runs the in-flight
    batch id) must overwrite its own partitions in BOTH stores: same
    accepted set, same probe verdicts, same chunk count. Replaying an
    OLDER id is a checkpoint reset and the store guard rejects it
    (wal.py frontier check) — asserted at the end."""
    spark, dirs, process, src = pipeline
    before_accept = {
        r.doc_id for r in spark.read.parquet(dirs["out"]).collect()
    }
    before_probe = {
        (r.probe_id, r.region)
        for r in _probe_ids(
            spark, dirs["bloom"], sorted(before_accept)
        ).collect()
    }
    before_bits = spark.read.parquet(f"{dirs['bloom']}/bits").count()

    # replay the final batch (2) from its source file
    batch2 = spark.read.schema("doc_id long, text string").parquet(
        str(src / "b2.parquet")
    )
    process(batch2, 2)

    after_accept = {
        r.doc_id for r in spark.read.parquet(dirs["out"]).collect()
    }
    after_probe = {
        (r.probe_id, r.region)
        for r in _probe_ids(
            spark, dirs["bloom"], sorted(after_accept)
        ).collect()
    }
    assert after_accept == before_accept
    assert after_probe == before_probe
    assert spark.read.parquet(f"{dirs['bloom']}/bits").count() == before_bits

    # an OLDER batch id is a checkpoint reset, not a replay: rejected
    batch1 = spark.read.schema("doc_id long, text string").parquet(
        str(src / "b1.parquet")
    )
    with pytest.raises(ValueError, match="checkpoint was reset"):
        process(batch1, 1)
