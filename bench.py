"""Benchmark harness (BASELINE.md matrix: PerformanceEvaluation analogs).

Runs the headline workloads at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each workload forces full computation through the noop sink (no driver
collect bottleneck, no output I/O) except b-write, which measures the real
range-partitioned parquet writer (the bulk-load path).

Per BASELINE.md each workload is timed as the MIN of 3 runs (set
$SPARK_GRAFT_BENCH_RUNS to change) — single-JVM local mode has multi-second
JIT/GC variance, and the shared host injects random multi-second stalls;
the fastest sample is the only consistent estimator of plan cost.

Noise is made self-documenting two ways: (1) sample rounds are INTERLEAVED
round-robin across all workloads (round 1 of everything, then round 2, ...)
so a host load spike lands on at most one sample of many workloads instead
of all samples of one; (2) the emitted JSON carries the raw per-sample
array for every workload ("samples"), so a spread like [9.1, 2.9, 2.8] is
visible in the artifact itself rather than collapsed into its min.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hbase_1_3_0_spark.catalog import TableMeta  # noqa: E402
from hbase_1_3_0_spark.cells import CELL_SCHEMA  # noqa: E402
from hbase_1_3_0_spark.engine import build_session  # noqa: E402
from hbase_1_3_0_spark.operators import aggregations as agg  # noqa: E402
from hbase_1_3_0_spark.operators import jobs  # noqa: E402
from hbase_1_3_0_spark.pipeline import (  # noqa: E402
    dedup,
    sampling,
    similarity,
    text,
)
from hbase_1_3_0_spark.sources import fixtures, writer  # noqa: E402
from hbase_1_3_0_spark.sources.kv_encoder import table_to_cells  # noqa: E402
from hbase_1_3_0_spark.table import Table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# scratch space on tmpfs when available: the bench measures compute and
# shuffle cost, not the shared host's (noisy) disk latency
SCRATCH = "/dev/shm" if os.path.isdir("/dev/shm") else None
NOW_MS = 9_000_000


def _k(n: int) -> bytes:
    return f"{n:019d}".encode()


def _sink(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    warehouse = tempfile.mkdtemp(prefix="bench_wh_", dir=SCRATCH)
    spark = build_session(
        "bench",
        extra_conf={
            "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEMORY", "24g"),
            # bucketed tables (b-sync-bucketed) land here, not in cwd
            "spark.sql.warehouse.dir": warehouse,
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Materialize the cell logs as range-partitioned parquet (the engine's
    # storage layout) and scan THAT — the 100 TB-representative read path:
    # scans get parquet pushdown/pruning and AQE sees real file sizes (so
    # the fused-SCVF semi join broadcasts). Pinning cells with .cache()
    # instead degrades that join to a static SortMergeJoin over the full
    # cell log (cached-plan stats; multi-second GC-bound variance) and no
    # 100 TB deployment scans a pinned-memory snapshot anyway — HBase PE
    # reads through the store, not a heap copy.
    bench_root = tempfile.mkdtemp(prefix="bench_cells_", dir=SCRATCH)
    writer.write_cells(
        fixtures.kv_cells(spark, SF_DIR, "lineitem"), f"{bench_root}/lineitem"
    )
    writer.write_cells(
        fixtures.kv_cells(spark, SF_DIR, "orders"), f"{bench_root}/orders"
    )
    lineitem_cells = writer.read_cells(spark, f"{bench_root}/lineitem")
    orders_cells = writer.read_cells(spark, f"{bench_root}/orders")
    li = Table(TableMeta(name="lineitem", clean_log=True), lineitem_cells, now_ms=NOW_MS)
    od = Table(TableMeta(name="orders", clean_log=True), orders_cells, now_ms=NOW_MS)
    orders = fixtures.load_table(spark, SF_DIR, "orders")
    events = fixtures.load_table(spark, SF_DIR, "events")

    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    workloads: list[tuple[str, object]] = []

    def run(name, fn):
        # registration only — execution is deferred so sample rounds can be
        # interleaved round-robin across ALL workloads (see module docstring)
        workloads.append((name, fn))

    # b-calibrate: fixed-cost host-noise probe (VERDICT r08 ask). One
    # 32-task stage summing a constant 256M-row range — zero data/SF
    # dependence and no I/O, so its per-sample spread measures ONLY the
    # shared host's scheduling/GC/CPU-contention noise. Runs first in
    # every sample round; the emitted JSON carries a "calibration"
    # summary (min/max/spread) so a noisy session is self-evident from
    # the artifact alone. Excluded from the headline total (it is a
    # meter, not a workload).
    run(
        "b-calibrate",
        lambda: _sink(
            spark.range(0, 256_000_000, 1, 32).select(F.sum("id"))
        ),
    )

    # b-scan-full: full scan + read view over lineitem-kv (PE scan)
    run("b-scan-full", lambda: _sink(li.scan()))

    # b-scan-range*: the PE random-range-scan family at its four widths
    # (RandomScanWithRange{10,100,1000,10000}Test,
    # PerformanceEvaluation.java:1264-1297) — fixed-overhead-vs-width
    # curve for pruned range scans; b-scan-range keeps the historical
    # name for the 1000-row width.
    run(
        "b-scan-range10",
        lambda: _sink(od.scan(start_row=_k(10000), stop_row=_k(10010))),
    )
    run(
        "b-scan-range100",
        lambda: _sink(od.scan(start_row=_k(20000), stop_row=_k(20100))),
    )
    run(
        "b-scan-range",
        lambda: _sink(od.scan(start_row=_k(10000), stop_row=_k(11000))),
    )
    run(
        "b-scan-range10000",
        lambda: _sink(od.scan(start_row=_k(30000), stop_row=_k(40000))),
    )

    # b-get-point: 1000 point gets as one semi-join batch (PE randomRead)
    keys = [_k(17 * i % 150_000) for i in range(1000)]
    run("b-get-point", lambda: _sink(od.multi_get(keys)))

    # b-scan-seek: randomSeekScan analog (PerformanceEvaluation.java:1180)
    # — 100 seeks each followed by a bounded 10-row scan, expressed as ONE
    # MultiRowRangeFilter pass (union of ranges -> partition-prunable ORs)
    from hbase_1_3_0_spark.filters import ast as fast

    seek_ranges = tuple(
        fast.RowRange(_k(1500 * i % 150_000), True,
                      _k(1500 * i % 150_000 + 10), False)
        for i in range(100)
    )
    run(
        "b-scan-seek",
        lambda: _sink(od.scan(filter=fast.MultiRowRangeFilter(ranges=seek_ranges))),
    )

    # b-filter-scan: SCVF + FilterList via the DSL (PE filterScan — a
    # selective server-side filter; ~1% of rows match, the fused SCVF
    # aggregation+join broadcasts the matching row set)
    dsl = (
        "(SingleColumnValueFilter ('d', 'l_returnflag', =, 'binary:R', true, true) AND "
        "SingleColumnValueFilter ('d', 'l_shipdate', =, 'substring:1996-06', true, true))"
    )
    run("b-filter-scan", lambda: _sink(li.scan(filter=dsl)))

    # b-agg: the whole AggregationClient surface + exact median
    def bench_agg():
        _sink(agg.aggregate(li.scan(), "d", b"l_quantity", interpreter="double"))
        _sink(agg.median(li.scan(), "d", b"l_extendedprice", interpreter="double"))

    run("b-agg", bench_agg)

    # b-write: bulk-load path — range-partition + sort + parquet
    def bench_write():
        out = tempfile.mkdtemp(prefix="bench_write_", dir=SCRATCH)
        try:
            writer.write_cells(table_to_cells(orders, ["o_orderkey"]), out)
        finally:
            shutil.rmtree(out, ignore_errors=True)

    run("b-write", bench_write)

    # b-write-rand: randomWrite analog (PerformanceEvaluation.java:1366) —
    # input arrives in arbitrary (hash) order, so the range partitioner does
    # real work; b-write above is the sequentialWrite analog (:1563, input
    # already in key order)
    def bench_write_rand():
        out = tempfile.mkdtemp(prefix="bench_write_rand_", dir=SCRATCH)
        try:
            shuffled = orders.repartition(64, F.col("o_custkey"))
            writer.write_cells(table_to_cells(shuffled, ["o_orderkey"]), out)
        finally:
            shutil.rmtree(out, ignore_errors=True)

    run("b-write-rand", bench_write_rand)

    # b-cas: checkAndMutate analog (PerformanceEvaluation.java:1492) — CAS
    # predicate against the pre-batch read view, passing puts applied
    def bench_cas():
        muts = orders.select(
            F.encode(
                F.lpad(F.col("o_orderkey").cast("string"), 19, "0"), "UTF-8"
            ).alias("row"),
            F.lit("put").alias("op"),
            F.lit("d").alias("family"),
            F.encode(F.lit("o_flag"), "UTF-8").alias("qualifier"),
            F.lit(None).cast("long").alias("ts"),
            F.encode(F.lit("seen"), "UTF-8").alias("value"),
            F.lit("d").alias("check_family"),
            F.encode(F.lit("o_orderstatus"), "UTF-8").alias("check_qualifier"),
            F.lit("EQUAL").alias("check_op"),
            F.encode(F.lit("F"), "UTF-8").alias("check_value"),
            F.lit(0).cast("long").alias("batch_seq"),
        )
        new_table, _ = od.check_and_mutate(muts)
        _sink(new_table.cells)

    run("b-cas", bench_cas)

    # b-cas-delete: checkAndDelete analog (CheckAndDeleteTest,
    # PerformanceEvaluation.java:1527) — same CAS predicate, passing
    # rows get a column tombstone instead of a put; distinct from b-cas
    # because the delete path writes tombstones the read view must mask
    def bench_cas_delete():
        muts = orders.select(
            F.encode(
                F.lpad(F.col("o_orderkey").cast("string"), 19, "0"), "UTF-8"
            ).alias("row"),
            F.lit("delete_column").alias("op"),
            F.lit("d").alias("family"),
            F.encode(F.lit("o_comment"), "UTF-8").alias("qualifier"),
            F.lit(None).cast("long").alias("ts"),
            F.lit(None).cast("binary").alias("value"),
            F.lit("d").alias("check_family"),
            F.encode(F.lit("o_orderstatus"), "UTF-8").alias("check_qualifier"),
            F.lit("EQUAL").alias("check_op"),
            F.encode(F.lit("F"), "UTF-8").alias("check_value"),
            F.lit(0).cast("long").alias("batch_seq"),
        )
        new_table, _ = od.check_and_mutate(muts)
        _sink(new_table.scan(columns=(("d", b"o_comment"),)))

    run("b-cas-delete", bench_cas_delete)

    # b-rmw: batched increments on events counters (PE increment)
    def bench_rmw():
        incs = events.select(
            F.encode(
                F.lpad(F.col("user_id").cast("string"), 19, "0"), "UTF-8"
            ).alias("row"),
            F.lit("d").alias("family"),
            F.encode(F.col("event_type"), "UTF-8").alias("qualifier"),
            F.lit(1).cast("long").alias("delta"),
        )
        counters = Table(
            TableMeta(name="counters"),
            spark.createDataFrame([], CELL_SCHEMA),
            now_ms=NOW_MS,
        )
        new_table, _ = counters.increment(incs)
        _sink(new_table.cells)

    run("b-rmw", bench_rmw)

    # b-append: byte-append RMW (PE append, PerformanceEvaluation.java:1478)
    def bench_append():
        apps = events.select(
            F.encode(
                F.lpad(F.col("user_id").cast("string"), 19, "0"), "UTF-8"
            ).alias("row"),
            F.lit("d").alias("family"),
            F.encode(F.lit("log"), "UTF-8").alias("qualifier"),
            F.encode(F.concat(F.col("event_type"), F.lit(",")), "UTF-8").alias(
                "value"
            ),
            F.col("event_id").alias("batch_seq"),
        )
        logs = Table(
            TableMeta(name="logs"),
            spark.createDataFrame([], CELL_SCHEMA),
            now_ms=NOW_MS,
        )
        new_table, _ = logs.append(apps)
        _sink(new_table.cells)

    run("b-append", bench_append)

    # ---- training-data pipeline workloads (SURVEY.md §2 pipeline ops) ----
    docs = fixtures.load_table(spark, SF_DIR, "documents")
    embs = fixtures.load_table(spark, SF_DIR, "embeddings")

    # b-dedup-minhash: MinHash-LSH near-dup pairs, star-linked buckets +
    # exact Jaccard verify on candidates only (pipeline/dedup.py).
    # pair_mode='star' is passed explicitly: the bench measures the
    # clustering-consumer scale path (linear in bucket size); the
    # function's default is 'all' (exact verified-pairs contract).
    run(
        "b-dedup-minhash",
        lambda: _sink(
            dedup.minhash_dedup_pairs(docs, threshold=0.5, pair_mode="star")
        ),
    )

    # b-neardup: streaming MinHash near-dup ingest through the real
    # Structured Streaming sink, WITH the persisted band store
    # (streaming/wal.py neardup_ingest_stream) — 3 id-ranged
    # micro-batches over the documents corpus; each sample starts from
    # fresh store/checkpoint dirs (the measured work is the full
    # 3-batch ingest: signature build, band-store probe+append, greedy
    # in-batch + cross-batch kill, idempotent commits)
    import glob

    from hbase_1_3_0_spark.streaming import wal as walmod

    nd_base = tempfile.mkdtemp(prefix="bench_nd_", dir=SCRATCH)
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
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(scratch)
        )
        shutil.copy(
            glob.glob(f"{scratch}/part-*.parquet")[0], f"{nd_src}/b{i}.parquet"
        )

    def bench_neardup(with_band_store=True):
        run_dir = tempfile.mkdtemp(prefix="bench_nd_run_", dir=SCRATCH)
        try:
            q = walmod.neardup_ingest_stream(
                spark,
                nd_src,
                out_dir=f"{run_dir}/out",
                store_dir=f"{run_dir}/store",
                checkpoint_dir=f"{run_dir}/ckpt",
                schema="doc_id bigint, text string, source string",
                threshold=0.8,
                max_files_per_trigger=1,
                band_store_dir=(
                    f"{run_dir}/bands" if with_band_store else None
                ),
            )
            q.awaitTermination()
        finally:
            shutil.rmtree(run_dir, ignore_errors=True)

    run("b-neardup", bench_neardup)
    # twin WITHOUT the persisted band store: history is re-banded from
    # raw signatures on every micro-batch probe. The pair shows the
    # band store's crossover in-artifact — its advantage grows with
    # accepted-history size (O(history) re-banding per batch vs a
    # 3-column columnar scan), so the gap widens with sf and with
    # batch count even if the 3-batch small-sf delta is modest.
    run("b-neardup-nostore", lambda: bench_neardup(with_band_store=False))

    # b-neardup-hist / b-neardup-hist-reband: the band store's ACTUAL
    # regime — one micro-batch probed against a LARGE accepted history
    # (400k synthetic signatures as a batch_id=-1 compacted base; built
    # once, untimed). The 3-batch b-neardup pair above measures the
    # streaming machinery at a tiny accepted-set size where the store's
    # extra write+read is pure overhead; THIS pair isolates the
    # per-batch probe at history size, where re-banding history
    # (posexplode + 16 slice hashes x 400k sigs, every batch, forever)
    # races a 3-long-column scan of the persisted band table. Samples
    # are idempotent: the probed batch commits at batch_id=1 under
    # dynamic partition overwrite, so each sample overwrites the last.
    hist_base = tempfile.mkdtemp(prefix="bench_ndhist_", dir=SCRATCH)
    n_hist = 400_000
    hist_sigs = spark.range(n_hist).select(
        (F.col("id") + 10_000_000).alias("doc_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda i: F.xxhash64(F.col("id"), i),
        ).alias("sig"),
        F.lit(-1).alias("batch_id"),
    )
    for variant in ("store", "reband"):
        (
            hist_sigs.write.mode("overwrite")
            .partitionBy("batch_id")
            .parquet(f"{hist_base}/{variant}/store")
        )
    walmod.backfill_neardup_band_store(
        spark, f"{hist_base}/store/store", f"{hist_base}/store/bands"
    )

    def bench_neardup_hist(with_band_store=True):
        variant = "store" if with_band_store else "reband"
        walmod._neardup_commit_batch(
            spark,
            nd_docs,
            1,
            out_dir=f"{hist_base}/{variant}/out",
            store_dir=f"{hist_base}/{variant}/store",
            threshold=0.8,
            band_store_dir=(
                f"{hist_base}/{variant}/bands" if with_band_store else None
            ),
        )

    run("b-neardup-hist", bench_neardup_hist)
    run(
        "b-neardup-hist-reband",
        lambda: bench_neardup_hist(with_band_store=False),
    )

    # b-topk: brute-force cosine top-10 for 100 query vectors (broadcast
    # queries, corpus never shuffled)
    topk_queries = embs.where(F.col("vec_id") < 100).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    run(
        "b-topk",
        lambda: _sink(similarity.cosine_topk(embs, topk_queries, k=10)),
    )

    # b-text: full text-analysis stats (lang-ID, quality, tokens, PII
    # counts) — pure JVM column expressions, no Python in the plan
    run("b-text", lambda: _sink(text.text_stats(docs)))

    # b-pack: concat-and-chunk sequence packing into 2048-token windows
    run("b-pack", lambda: _sink(sampling.pack_sequences(docs, capacity=2048)))

    # b-url: URL canonicalization + identity dedup + per-domain stats over
    # a synthesized url column (pipeline/web.py — parse_url JVM exprs)
    from hbase_1_3_0_spark.pipeline import lm, web

    d = F.col("doc_id")
    urls = docs.withColumn(
        "url",
        F.concat(
            F.when(d % 6 == 0, F.lit("http")).otherwise(F.lit("https")),
            F.lit("://"),
            F.when(d % 4 == 0, F.lit("WWW.")).otherwise(F.lit("")),
            F.lit("site"), (d % 50).cast("string"),
            F.when(d % 3 == 0, F.lit(".co.uk")).otherwise(F.lit(".com")),
            F.lit("/p/"), (d % 17).cast("string"),
            F.when(d % 5 == 0, F.lit("?utm_source=x&id=1")).otherwise(F.lit("")),
        ),
    )

    def bench_url():
        _sink(web.url_dedup(urls))
        _sink(web.domain_stats(urls))

    run("b-url", bench_url)

    # b-lm: in-corpus unigram perplexity scoring, top-2000 vocab broadcast
    run("b-lm", lambda: _sink(lm.perplexity_proxy(docs, vocab_size=2000)))

    # b-lm3: Kneser-Ney trigram scoring — the KenLM-shaped signal; type
    # tables bounded by the in-vocab key space, per-word models broadcast
    run(
        "b-lm3",
        lambda: _sink(lm.trigram_perplexity(docs, vocab_size=2000)),
    )

    # b-substring: exact repeated-substring excision (Lee et al. span
    # pass) — the corpus-bytes-heaviest pipeline op: two window explodes
    # (pass 2 hot-set-gated by a broadcast), ONE digest shuffle total
    from hbase_1_3_0_spark.pipeline import substrings

    run(
        "b-substring",
        lambda: _sink(substrings.remove_repeated_spans(docs, k=40)),
    )

    # b-sync: HashTable/SyncTable diff of two table versions
    sync_tgt_rows = orders.where(F.col("o_orderkey") % 13 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 11 == 0, F.col("o_totalprice") + 1.0
        ).otherwise(F.col("o_totalprice")),
    )
    sync_tgt = table_to_cells(sync_tgt_rows, ["o_orderkey"])
    run("b-sync", lambda: _sink(jobs.sync_table(orders_cells, sync_tgt)))

    # b-sync-bucketed: the same diff over the co-located bucketed layout
    # (writer.write_cells_bucketed): both sides bucket+sort on the
    # (row, family, qualifier) cell identity, so the read-view aggs AND
    # the full-outer diff join plan with ZERO exchanges — the write cost
    # is table setup (amortized across every diff of a diff-dominant
    # table); the timed work is the steady-state repair pass itself
    writer.write_cells_bucketed(orders_cells, "bench_sync_src", num_buckets=32)
    writer.write_cells_bucketed(sync_tgt, "bench_sync_tgt", num_buckets=32)
    bk_src, bk_tgt = spark.table("bench_sync_src"), spark.table("bench_sync_tgt")
    run("b-sync-bucketed", lambda: _sink(jobs.sync_table(bk_src, bk_tgt)))

    # b-bloom: build per-region ROW blooms for the pre-split orders log
    # + serve a 1000-key multi-get batch through bloom_probe (the bloom
    # build is the timed dominant term — one scan + one (region,bit)
    # distinct; the probe is a broadcast). PE randomRead with the bloom
    # consulted, the read-path index cost at ingest time.
    from hbase_1_3_0_spark.operators import bloom as bloom_mod

    # setup (untimed): a pre-split copy of the orders log — 16 region
    # directories over the lpad-19 numeric key space
    bloom_splits = [_k(i * 40_000) for i in range(1, 16)]
    writer.write_cells(
        orders_cells, f"{bench_root}/orders_presplit", split_points=bloom_splits
    )
    probe_df = spark.createDataFrame(
        [(i, _k(37 * i % 300_000)) for i in range(1000)],
        "probe_id long, row binary",
    ).select("probe_id", bloom_mod.bloom_key(F.col("row")).alias("bkey"))

    def bench_bloom():
        bits, sz = bloom_mod.bloom_for_presplit_table(
            spark, f"{bench_root}/orders_presplit"
        )
        _sink(bloom_mod.bloom_probe(bits, sz, probe_df))

    run("b-bloom", bench_bloom)

    # b-itbll (r12): the ITBLL flagship invariant — circular-chain
    # generation (one window on list_id) + full REFERENCED/UNREFERENCED/
    # UNDEFINED verification (one reference agg + one full-outer key
    # join, the reference Verify job's reduce shuffle)
    from hbase_1_3_0_spark.operators import itbll as itbll_mod

    def bench_itbll():
        chain = itbll_mod.generate_chains(orders, "o_orderkey", n_lists=64)
        _sink(itbll_mod.verify_chains(chain))

    run("b-itbll", bench_itbll)

    # b-dsir: DSIR featurize + two bucket models + weights + Gumbel
    # top-k over the documents table (one tokenize pass, broadcast
    # models — the data-selection scoring cost per corpus scan)
    from hbase_1_3_0_spark.pipeline import dsir as dsir_mod

    def bench_dsir():
        feats = dsir_mod.hashed_ngram_counts(docs, buckets=4096)
        en = docs.where(F.col("lang") == "en").select("doc_id")
        tm = dsir_mod.bucket_model(feats.join(F.broadcast(en), "doc_id"))
        rm = dsir_mod.bucket_model(feats)
        w = dsir_mod.dsir_log_weights(feats, tm, rm)
        _sink(dsir_mod.dsir_resample(w, k=100))

    run("b-dsir", bench_dsir)

    # ---- execute: interleaved sample rounds over every workload ----
    # SPARK_GRAFT_BENCH_ONLY=b-x,b-y scopes a builder's targeted perf
    # check (b-calibrate always kept as the noise meter); unset = the
    # full driver contract.
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if only is not None:
        keep = {w.strip() for w in only.split(",") if w.strip()}
        if not keep:
            raise SystemExit(
                "SPARK_GRAFT_BENCH_ONLY is set but names no workloads "
                "(empty/whitespace value); unset it for the full contract"
            )
        known = {n for n, _ in workloads}
        unknown = sorted(keep - known)
        if unknown:
            raise SystemExit(
                f"SPARK_GRAFT_BENCH_ONLY names unknown workloads: {unknown} "
                f"(known: {sorted(known)})"
            )
        keep |= {"b-calibrate"}
        workloads = [(n, f) for n, f in workloads if n in keep]
    samples: dict[str, list[float]] = {name: [] for name, _ in workloads}
    for rnd in range(n_runs):
        print(f"--- sample round {rnd + 1}/{n_runs} ---", file=sys.stderr)
        for name, fn in workloads:
            t0 = time.time()
            fn()
            dt = time.time() - t0
            samples[name].append(dt)
            print(f"{name}: {dt:.2f}s", file=sys.stderr)
    spark.sql("DROP TABLE IF EXISTS bench_sync_src")
    spark.sql("DROP TABLE IF EXISTS bench_sync_tgt")

    # min, not median: the container shares a host whose background load
    # injects multi-second stalls at random; the fastest sample is the
    # only consistent estimator of actual plan cost under external noise
    timings = {name: round(min(s), 3) for name, s in samples.items()}
    total = round(
        sum(v for k, v in timings.items() if k != "b-calibrate"), 3
    )
    cal = samples.get("b-calibrate", [])
    calibration = (
        {
            "min": round(min(cal), 3),
            "max": round(max(cal), 3),
            # spread > ~2 on a constant-cost 32-task stage = the host
            # was contended during this run; treat workload regressions
            # in the same artifact as suspect
            "spread": round(max(cal) / max(min(cal), 1e-9), 2),
        }
        if cal
        else None
    )
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "pe_workload_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "calibration": calibration,
                "samples": {
                    name: [round(x, 3) for x in s]
                    for name, s in samples.items()
                },
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()
    shutil.rmtree(bench_root, ignore_errors=True)
    shutil.rmtree(nd_base, ignore_errors=True)
    # hist_base and the warehouse dir were leaked before r13-opt:
    # ~1.4 GB of synthetic history plus the bucketed-table warehouse per
    # run left in /dev/shm, compounding across bench invocations
    shutil.rmtree(hist_base, ignore_errors=True)
    shutil.rmtree(warehouse, ignore_errors=True)


if __name__ == "__main__":
    main()
