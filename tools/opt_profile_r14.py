"""r14 optimization-round profiler: time SUB-STEPS of the heavy bench
workloads through the noop sink (guide §1.4) and dump formatted plans to
plans/r14/. Reuses bench.py's exact fixtures so numbers map 1:1 onto the
bench rows. Usage:

    python tools/opt_profile_r14.py <workload> [...]
        # neardup-hist | neardup-stream | lm | sync | agg | cold-paths

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

from hbase_1_3_0_spark.engine import build_session  # noqa: E402
from hbase_1_3_0_spark.sources import fixtures, writer  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCRATCH = "/dev/shm" if os.path.isdir("/dev/shm") else None
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
PLAN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r14"
)


def _sink(df):
    df.write.format("noop").mode("overwrite").save()


def step(spark, name, fn, runs=None):
    samples = []
    for _ in range(runs or RUNS):
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        fn()
        samples.append(time.time() - t0)
        spark.sparkContext.setJobDescription(None)
    print(
        f"{name}: min={min(samples):.2f}s "
        f"samples={[round(s, 2) for s in samples]}",
        flush=True,
    )


def dump_plan(df, plan_name):
    os.makedirs(PLAN_DIR, exist_ok=True)
    with open(os.path.join(PLAN_DIR, plan_name), "w") as fh:
        fh.write(df._jdf.queryExecution().explainString(
            df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted")))
    print(f"  wrote plans/r14/{plan_name}", flush=True)


def _hist_fixture(spark, n_hist=400_000):
    """bench.py's b-neardup-hist fixture: 400k synthetic signatures as a
    batch_id=-1 compacted base + matching band store."""
    from hbase_1_3_0_spark.streaming import wal as walmod

    hist_base = tempfile.mkdtemp(prefix="prof_ndhist_", dir=SCRATCH)
    hist_sigs = spark.range(n_hist).select(
        (F.col("id") + 10_000_000).alias("doc_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda i: F.xxhash64(F.col("id"), i),
        ).alias("sig"),
        F.lit(-1).alias("batch_id"),
    )
    (
        hist_sigs.write.mode("overwrite")
        .partitionBy("batch_id")
        .parquet(f"{hist_base}/store")
    )
    walmod.backfill_neardup_band_store(
        spark, f"{hist_base}/store", f"{hist_base}/bands"
    )
    return hist_base


def main():
    which = set(sys.argv[1:]) or {"neardup-hist"}
    spark = build_session(
        "opt_profile_r14",
        extra_conf={
            "spark.driver.memory": os.environ.get(
                "SPARK_DRIVER_MEMORY", "24g")},
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = fixtures.load_table(spark, SF_DIR, "documents")
    nd_docs = docs.select("doc_id", "text", "source")

    if {"neardup-hist"} & which:
        from hbase_1_3_0_spark.pipeline.dedup import (
            minhash_signatures,
            signature_bands,
        )
        from hbase_1_3_0_spark.streaming import wal as walmod

        hist_base = _hist_fixture(spark)

        def one_commit():
            walmod._neardup_commit_batch(
                spark, nd_docs, 1,
                out_dir=f"{hist_base}/out", store_dir=f"{hist_base}/store",
                threshold=0.8, band_store_dir=f"{hist_base}/bands",
            )

        step(spark, "ndhist/full-commit-batch", one_commit, runs=3)

        # sub-steps
        def load_store():
            walmod._load_ingest_store(spark, f"{hist_base}/store", 1)
            walmod._load_ingest_store(spark, f"{hist_base}/bands", 1)

        step(spark, "ndhist/load-stores", load_store)

        def sigs_ckpt():
            minhash_signatures(
                nd_docs.select("doc_id", "text"), text_col="text",
                id_col="doc_id", n=5, num_hashes=64, seed=42,
            ).localCheckpoint()

        step(spark, "ndhist/sigs+eager-localCheckpoint", sigs_ckpt)

        sigs = minhash_signatures(
            nd_docs.select("doc_id", "text"), text_col="text",
            id_col="doc_id", n=5, num_hashes=64, seed=42,
        ).localCheckpoint()
        batch_bands = signature_bands(sigs, bands=16, num_hashes=64)
        store = walmod._load_ingest_store(spark, f"{hist_base}/store", 1)
        band_store = walmod._load_ingest_store(spark, f"{hist_base}/bands", 1)
        prior = store.where(F.col("batch_id") != 1)
        prior_sigs = prior.select(
            F.col("doc_id").alias("_nid"), F.col("sig").alias("_nsig"))
        prior_bands = band_store.where(F.col("batch_id") != 1).select(
            F.col("doc_id").alias("_nid"), "band", "bucket")
        cross = batch_bands.join(prior_bands, ["band", "bucket"]).select(
            "_id", "_nid")
        step(spark, "ndhist/store-band-join-only", lambda: _sink(cross))

        est = (
            F.aggregate(
                F.zip_with(F.col("_sig_a"), F.col("_sig_b"),
                           lambda x, y: (x == y).cast("int")),
                F.lit(0), lambda acc, v: acc + v,
            ) / F.lit(64)
        )
        kill = (
            cross.distinct()
            .join(sigs.select(F.col("_id"), F.col("_sig").alias("_sig_a")),
                  "_id")
            .join(prior_sigs.select(F.col("_nid"),
                                    F.col("_nsig").alias("_sig_b")), "_nid")
            .where(est >= F.lit(0.8))
            .select("_id")
        )
        step(spark, "ndhist/store-kill-chain", lambda: _sink(kill))
        dump_plan(kill, "b-neardup-hist_storekill_before.txt")

        inbatch = (
            batch_bands.alias("x")
            .join(batch_bands.alias("y"), ["band", "bucket"])
            .where(F.col("y._id") < F.col("x._id"))
            .select(F.col("x._id").alias("_id"), F.col("y._id").alias("_nid"))
        )
        in_kill = (
            inbatch.distinct()
            .join(sigs.select(F.col("_id"), F.col("_sig").alias("_sig_a")),
                  "_id")
            .join(sigs.select(F.col("_id").alias("_nid"),
                              F.col("_sig").alias("_sig_b")), "_nid")
            .where(est >= F.lit(0.8))
            .select("_id")
        )
        step(spark, "ndhist/inbatch-kill-chain", lambda: _sink(in_kill))

        both = kill.unionByName(in_kill)
        surv = nd_docs.join(
            both.select(F.col("_id").alias("doc_id")), "doc_id", "left_anti")
        step(spark, "ndhist/survivors-noop(no-ckpt)", lambda: _sink(surv))

        def surv_ckpt():
            nd_docs.join(
                both.select(F.col("_id").alias("doc_id")), "doc_id",
                "left_anti").localCheckpoint()

        step(spark, "ndhist/survivors-eager-localCheckpoint", surv_ckpt)
        shutil.rmtree(hist_base, ignore_errors=True)

    if {"neardup-stream"} & which:
        import glob

        from hbase_1_3_0_spark.streaming import wal as walmod

        nd_base = tempfile.mkdtemp(prefix="prof_nd_", dir=SCRATCH)
        nd_src = f"{nd_base}/src"
        os.makedirs(nd_src)
        nd_max = nd_docs.agg(F.max("doc_id")).first()[0] or 0
        nd_cuts = [0, nd_max // 3 + 1, 2 * nd_max // 3 + 1, nd_max + 1]
        for i in range(3):
            scratch = f"{nd_base}/scratch{i}"
            (
                nd_docs.where(
                    (F.col("doc_id") >= nd_cuts[i])
                    & (F.col("doc_id") < nd_cuts[i + 1]))
                .coalesce(1).write.mode("overwrite").parquet(scratch)
            )
            shutil.copy(glob.glob(f"{scratch}/part-*.parquet")[0],
                        f"{nd_src}/b{i}.parquet")

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

        step(spark, "ndstream/full-3batch-stream", full_stream, runs=3)

        # direct 3x commit-batch, no streaming machinery: isolates the
        # trigger/checkpoint constant
        def three_commits():
            prep = tempfile.mkdtemp(prefix="prof_nd_prep_", dir=SCRATCH)
            try:
                for i in range(3):
                    b = spark.read.parquet(f"{nd_src}/b{i}.parquet")
                    walmod._neardup_commit_batch(
                        spark, b, i, out_dir=f"{prep}/out",
                        store_dir=f"{prep}/store", threshold=0.8,
                        band_store_dir=f"{prep}/bands")
            finally:
                shutil.rmtree(prep, ignore_errors=True)

        step(spark, "ndstream/3x-direct-commit", three_commits, runs=3)
        shutil.rmtree(nd_base, ignore_errors=True)

    if {"lm"} & which:
        from hbase_1_3_0_spark.pipeline import dsir as dsir_mod
        from hbase_1_3_0_spark.pipeline import lm

        out = lm.perplexity_proxy(docs, vocab_size=2000)
        step(spark, "lm/perplexity-proxy(b-lm)", lambda: _sink(out), runs=3)
        dump_plan(out, "b-lm_before.txt")
        toks = docs.select(
            F.explode(lm.word_tokens(F.col("text"))).alias("word"))
        step(spark, "lm/tokenize-explode-nofanout", lambda: _sink(toks))
        out3 = lm.trigram_perplexity(docs, vocab_size=2000)
        step(spark, "lm/trigram(b-lm3)", lambda: _sink(out3), runs=3)

        def full_dsir():
            feats = dsir_mod.hashed_ngram_counts(docs, buckets=4096)
            en = docs.where(F.col("lang") == "en").select("doc_id")
            tm = dsir_mod.bucket_model(feats.join(F.broadcast(en), "doc_id"))
            rm = dsir_mod.bucket_model(feats)
            w = dsir_mod.dsir_log_weights(feats, tm, rm)
            _sink(dsir_mod.dsir_resample(w, k=100))

        step(spark, "lm/dsir(b-dsir)", full_dsir, runs=3)

    if {"sync"} & which:
        from hbase_1_3_0_spark.operators import jobs
        from hbase_1_3_0_spark.sources.kv_encoder import table_to_cells

        bench_root = tempfile.mkdtemp(prefix="prof_cells_", dir=SCRATCH)
        orders = fixtures.load_table(spark, SF_DIR, "orders")
        writer.write_cells(
            fixtures.kv_cells(spark, SF_DIR, "orders"), f"{bench_root}/orders")
        orders_cells = writer.read_cells(spark, f"{bench_root}/orders")
        sync_tgt_rows = orders.where(
            F.col("o_orderkey") % 13 != 0).withColumn(
            "o_totalprice",
            F.when(F.col("o_orderkey") % 11 == 0,
                   F.col("o_totalprice") + 1.0
                   ).otherwise(F.col("o_totalprice")))
        sync_tgt = table_to_cells(sync_tgt_rows, ["o_orderkey"])
        out = jobs.sync_table(orders_cells, sync_tgt)
        step(spark, "sync/full-outer(default)", lambda: _sink(out), runs=3)
        pre = jobs.sync_table(orders_cells, sync_tgt, hash_prefilter=True)
        step(spark, "sync/hash-prefilter", lambda: _sink(pre), runs=3)
        dump_plan(out, "b-sync_before.txt")
        dump_plan(pre, "b-sync_prefilter.txt")
        shutil.rmtree(bench_root, ignore_errors=True)

    if {"agg"} & which:
        from hbase_1_3_0_spark.catalog import TableMeta
        from hbase_1_3_0_spark.operators import aggregations as agg
        from hbase_1_3_0_spark.table import Table

        bench_root = tempfile.mkdtemp(prefix="prof_cells_", dir=SCRATCH)
        writer.write_cells(
            fixtures.kv_cells(spark, SF_DIR, "lineitem"),
            f"{bench_root}/lineitem")
        li = Table(TableMeta(name="lineitem", clean_log=True),
                   writer.read_cells(spark, f"{bench_root}/lineitem"),
                   now_ms=9_000_000)
        a1 = agg.aggregate(li.scan(), "d", b"l_quantity",
                           interpreter="double")
        a2 = agg.median(li.scan(), "d", b"l_extendedprice",
                        interpreter="double")
        step(spark, "agg/aggregate", lambda: _sink(a1), runs=3)
        step(spark, "agg/exact-median", lambda: _sink(a2), runs=3)
        dump_plan(a2, "b-agg_median_before.txt")
        shutil.rmtree(bench_root, ignore_errors=True)

    if {"cold-paths"} & which:
        # never-profiled operator families (VERDICT item 8): one
        # decomposition each, shaped exactly like the declared queries
        from hbase_1_3_0_spark.pipeline import (
            bpe,
            classifier,
            multimodal,
            similarity,
            text,
        )

        embs = fixtures.load_table(spark, SF_DIR, "embeddings")

        def quality():
            pos = docs.where(F.col("lang") == "en")
            neg = docs.where(F.coalesce(F.col("lang"), F.lit("")) != "en")
            w = classifier.train_quality_classifier(
                pos, neg, buckets=1024, iterations=5)
            _sink(classifier.score_quality(docs, w, buckets=1024))

        step(spark, "cold/quality-classifier-train+score", quality, runs=3)
        step(spark, "cold/winnow-fingerprints",
             lambda: _sink(text.winnow_fingerprints(docs)), runs=3)
        step(spark, "cold/winnow-overlap",
             lambda: _sink(
                 text.winnow_overlap(docs, min_shared=5, max_df=50)),
             runs=3)

        def mm_feats():
            d = docs.where(F.col("doc_id") < 500).select(
                "doc_id", F.encode(F.col("text"), "UTF-8").alias("blob"))
            media = multimodal.attach_media(
                d, "blob", media_type="image", fmt="png")
            _sink(multimodal.extract_features(media, fake=True))

        step(spark, "cold/multimodal-extract-features", mm_feats, runs=3)
        step(
            spark, "cold/bpe-train-20merges",
            lambda: _sink(bpe.bpe_train(
                docs.where(F.col("doc_id") < 200),
                num_merges=20, min_count=2)),
            runs=2)

        def ivfpq():
            q = embs.where(F.col("vec_id") < 5).select(
                F.col("vec_id").alias("query_id"), "embedding")
            cents = similarity.kmeans_centroids(embs, k=16, dim=64, iters=1)
            books = similarity.pq_train(embs, m=8, k=16, dim=64, iters=1)
            _sink(similarity.ivfpq_topk(
                embs, q, k=10, num_lists=16, nprobe=4,
                centroids=cents, codebooks=books))

        step(spark, "cold/ivfpq-train+topk", ivfpq, runs=3)

    spark.stop()


if __name__ == "__main__":
    main()
