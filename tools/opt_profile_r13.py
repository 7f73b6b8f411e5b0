"""r13 optimization-round profiler: time SUB-STEPS of the heavy bench
workloads through the noop sink (guide §1.4) and dump formatted plans to
plans/r13/. Reuses bench.py's exact fixtures so numbers map 1:1 onto the
bench rows. Usage:

    python tools/opt_profile_r13.py <workload> [...]   # neardup|substring|
                                                       # minhash|bloom|topk|
                                                       # sync|seek|agg

Each sub-step is labeled via setJobDescription and timed as min of
$SPARK_GRAFT_BENCH_RUNS (default 2) samples.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hbase_1_3_0_spark.catalog import TableMeta  # noqa: E402
from hbase_1_3_0_spark.engine import build_session  # noqa: E402
from hbase_1_3_0_spark.sources import fixtures, writer  # noqa: E402
from hbase_1_3_0_spark.table import Table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCRATCH = "/dev/shm" if os.path.isdir("/dev/shm") else None
NOW_MS = 9_000_000
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
PLAN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13"
)


def _sink(df):
    df.write.format("noop").mode("overwrite").save()


def step(spark, name, fn):
    samples = []
    for _ in range(RUNS):
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        fn()
        samples.append(time.time() - t0)
        spark.sparkContext.setJobDescription(None)
    print(f"{name}: min={min(samples):.2f}s samples={[round(s,2) for s in samples]}")


def dump_plan(df, plan_name):
    os.makedirs(PLAN_DIR, exist_ok=True)
    with open(os.path.join(PLAN_DIR, plan_name), "w") as fh:
        fh.write(df._jdf.queryExecution().explainString(
            df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        ))
    print(f"  wrote plans/r13/{plan_name}")


def main():
    which = set(sys.argv[1:]) or {"neardup"}
    spark = build_session(
        "opt_profile",
        extra_conf={"spark.driver.memory": os.environ.get("SPARK_DRIVER_MEMORY", "24g")},
    )
    spark.sparkContext.setLogLevel("ERROR")
    bench_root = tempfile.mkdtemp(prefix="prof_cells_", dir=SCRATCH)

    docs = fixtures.load_table(spark, SF_DIR, "documents")

    if {"neardup"} & which:
        import glob

        from hbase_1_3_0_spark.streaming import wal as walmod

        nd_base = tempfile.mkdtemp(prefix="prof_nd_", dir=SCRATCH)
        nd_src = f"{nd_base}/src"
        os.makedirs(nd_src)
        nd_docs = docs.select("doc_id", "text", "source")
        nd_max = nd_docs.agg(F.max("doc_id")).first()[0] or 0
        nd_cuts = [0, nd_max // 3 + 1, 2 * nd_max // 3 + 1, nd_max + 1]
        for i in range(3):
            scratch = f"{nd_base}/scratch{i}"
            (
                nd_docs.where(
                    (F.col("doc_id") >= nd_cuts[i])
                    & (F.col("doc_id") < nd_cuts[i + 1])
                )
                .coalesce(1).write.mode("overwrite").parquet(scratch)
            )
            shutil.copy(
                glob.glob(f"{scratch}/part-*.parquet")[0],
                f"{nd_src}/b{i}.parquet",
            )

        # A) whole 3-batch stream (the bench row)
        def full_stream():
            run_dir = tempfile.mkdtemp(prefix="prof_nd_run_", dir=SCRATCH)
            try:
                q = walmod.neardup_ingest_stream(
                    spark, nd_src,
                    out_dir=f"{run_dir}/out", store_dir=f"{run_dir}/store",
                    checkpoint_dir=f"{run_dir}/ckpt",
                    schema="doc_id bigint, text string, source string",
                    threshold=0.8, max_files_per_trigger=1,
                    band_store_dir=f"{run_dir}/bands",
                )
                q.awaitTermination()
            finally:
                shutil.rmtree(run_dir, ignore_errors=True)

        step(spark, "neardup/full-3batch-stream", full_stream)

        # B) ONE direct commit batch (no streaming machinery) against a
        # prepared 2-batch store — isolates per-batch plan cost from the
        # trigger/checkpoint overhead
        prep = tempfile.mkdtemp(prefix="prof_nd_prep_", dir=SCRATCH)
        b0 = spark.read.parquet(f"{nd_src}/b0.parquet")
        b1 = spark.read.parquet(f"{nd_src}/b1.parquet")
        b2 = spark.read.parquet(f"{nd_src}/b2.parquet")
        walmod._neardup_commit_batch(
            spark, b0, 0, out_dir=f"{prep}/out", store_dir=f"{prep}/store",
            threshold=0.8, band_store_dir=f"{prep}/bands")
        walmod._neardup_commit_batch(
            spark, b1, 1, out_dir=f"{prep}/out", store_dir=f"{prep}/store",
            threshold=0.8, band_store_dir=f"{prep}/bands")

        def one_batch():
            walmod._neardup_commit_batch(
                spark, b2, 2, out_dir=f"{prep}/out", store_dir=f"{prep}/store",
                threshold=0.8, band_store_dir=f"{prep}/bands")

        step(spark, "neardup/one-commit-batch", one_batch)

        # C) sub-steps of one batch
        from hbase_1_3_0_spark.pipeline.dedup import (
            minhash_signatures, signature_bands,
        )

        def sigs_only():
            minhash_signatures(
                b2.select("doc_id", "text"), text_col="text",
                id_col="doc_id", n=5, num_hashes=64, seed=42,
            ).localCheckpoint()

        step(spark, "neardup/sigs+localCheckpoint", sigs_only)

        sigs = minhash_signatures(
            b2.select("doc_id", "text"), text_col="text", id_col="doc_id",
            n=5, num_hashes=64, seed=42).localCheckpoint()
        bands = signature_bands(sigs, bands=16, num_hashes=64)
        step(spark, "neardup/bands-noop", lambda: _sink(bands))
        shutil.rmtree(nd_base, ignore_errors=True)
        shutil.rmtree(prep, ignore_errors=True)

    if {"substring"} & which:
        from hbase_1_3_0_spark.pipeline import substrings

        step(
            spark, "substring/full",
            lambda: _sink(substrings.remove_repeated_spans(docs, k=40)),
        )
        win = substrings.window_digests(docs, k=40)
        step(spark, "substring/window-digests-only", lambda: _sink(win))
        hot = (
            win.groupBy("digest")
            .agg(F.count(F.lit(1)).alias("_n"),
                 F.min(F.struct(F.col("_id"), F.col("pos"))).alias("_first"))
            .where(F.col("_n") >= 2)
        )
        step(spark, "substring/pass1-hot-agg", lambda: _sink(hot))
        dump_plan(hot, "b-substring_pass1_before.txt")
        spans = substrings.repeated_spans(docs, k=40)
        dump_plan(spans, "b-substring_spans_before.txt")

    if {"minhash"} & which:
        from hbase_1_3_0_spark.pipeline import dedup

        step(
            spark, "minhash/full-star",
            lambda: _sink(dedup.minhash_dedup_pairs(
                docs, threshold=0.5, pair_mode="star")),
        )
        sigs = dedup.minhash_signatures(docs)
        step(spark, "minhash/signatures-only", lambda: _sink(sigs))
        cands = dedup.minhash_lsh_candidates(docs, pair_mode="star")
        step(spark, "minhash/candidates-only", lambda: _sink(cands))
        dump_plan(
            dedup.minhash_dedup_pairs(docs, threshold=0.5, pair_mode="star"),
            "b-dedup-minhash_before.txt")

    if {"bloom"} & which:
        from hbase_1_3_0_spark.operators import bloom as bloom_mod

        orders_cells = writer.read_cells(spark, f"{bench_root}/orders") if (
            os.path.isdir(f"{bench_root}/orders")) else None
        if orders_cells is None:
            writer.write_cells(
                fixtures.kv_cells(spark, SF_DIR, "orders"),
                f"{bench_root}/orders")
            orders_cells = writer.read_cells(spark, f"{bench_root}/orders")
        bloom_splits = [f"{i * 40_000:019d}".encode() for i in range(1, 16)]
        writer.write_cells(
            orders_cells, f"{bench_root}/orders_presplit",
            split_points=bloom_splits)
        probe_df = spark.createDataFrame(
            [(i, f"{37 * i % 300_000:019d}".encode()) for i in range(1000)],
            "probe_id long, row binary",
        ).select("probe_id", bloom_mod.bloom_key(F.col("row")).alias("bkey"))

        def full():
            bits, sz = bloom_mod.bloom_for_presplit_table(
                spark, f"{bench_root}/orders_presplit")
            _sink(bloom_mod.bloom_probe(bits, sz, probe_df))

        step(spark, "bloom/full", full)
        bits, sz = bloom_mod.bloom_for_presplit_table(
            spark, f"{bench_root}/orders_presplit")
        step(spark, "bloom/build-bits-only", lambda: _sink(bits))
        step(spark, "bloom/sizing-only", lambda: _sink(sz))
        dump_plan(bits, "b-bloom_bits_before.txt")

    if {"topk"} & which:
        from hbase_1_3_0_spark.pipeline import similarity

        embs = fixtures.load_table(spark, SF_DIR, "embeddings")
        topk_queries = embs.where(F.col("vec_id") < 100).select(
            F.col("vec_id").alias("query_id"), "embedding")
        out = similarity.cosine_topk(embs, topk_queries, k=10)
        step(spark, "topk/full", lambda: _sink(out))
        dump_plan(out, "b-topk_before.txt")

    if {"sync"} & which:
        from hbase_1_3_0_spark.operators import jobs
        from hbase_1_3_0_spark.sources.kv_encoder import table_to_cells

        orders = fixtures.load_table(spark, SF_DIR, "orders")
        if not os.path.isdir(f"{bench_root}/orders"):
            writer.write_cells(
                fixtures.kv_cells(spark, SF_DIR, "orders"),
                f"{bench_root}/orders")
        orders_cells = writer.read_cells(spark, f"{bench_root}/orders")
        sync_tgt_rows = orders.where(F.col("o_orderkey") % 13 != 0).withColumn(
            "o_totalprice",
            F.when(F.col("o_orderkey") % 11 == 0,
                   F.col("o_totalprice") + 1.0).otherwise(F.col("o_totalprice")))
        sync_tgt = table_to_cells(sync_tgt_rows, ["o_orderkey"])
        out = jobs.sync_table(orders_cells, sync_tgt)
        step(spark, "sync/full", lambda: _sink(out))
        dump_plan(out, "b-sync_before.txt")

    if {"seek"} & which:
        from hbase_1_3_0_spark.filters import ast as fast

        if not os.path.isdir(f"{bench_root}/orders"):
            writer.write_cells(
                fixtures.kv_cells(spark, SF_DIR, "orders"),
                f"{bench_root}/orders")
        od = Table(TableMeta(name="orders", clean_log=True),
                   writer.read_cells(spark, f"{bench_root}/orders"),
                   now_ms=NOW_MS)
        seek_ranges = tuple(
            fast.RowRange(f"{1500 * i % 150_000:019d}".encode(), True,
                          f"{1500 * i % 150_000 + 10:019d}".encode(), False)
            for i in range(100))
        out = od.scan(filter=fast.MultiRowRangeFilter(ranges=seek_ranges))
        step(spark, "seek/full", lambda: _sink(out))
        dump_plan(out, "b-scan-seek_before.txt")

    if {"agg"} & which:
        from hbase_1_3_0_spark.operators import aggregations as agg

        writer.write_cells(
            fixtures.kv_cells(spark, SF_DIR, "lineitem"),
            f"{bench_root}/lineitem")
        li = Table(TableMeta(name="lineitem", clean_log=True),
                   writer.read_cells(spark, f"{bench_root}/lineitem"),
                   now_ms=NOW_MS)
        a1 = agg.aggregate(li.scan(), "d", b"l_quantity", interpreter="double")
        a2 = agg.median(li.scan(), "d", b"l_extendedprice", interpreter="double")
        step(spark, "agg/aggregate", lambda: _sink(a1))
        step(spark, "agg/median", lambda: _sink(a2))
        dump_plan(a2, "b-agg_median_before.txt")

    spark.stop()
    shutil.rmtree(bench_root, ignore_errors=True)


if __name__ == "__main__":
    main()
