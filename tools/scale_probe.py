"""Scale probe (VERDICT r09 next-round #1): measure the top bench
workloads at sf0.1 AND at a ~10x shifted-key union of sf0.1, in one
session, and check that no broadcast join silently flipped to
sort-merge at the bigger size.

The brief targets ~100 TB but every per-round measurement is sf0.1;
this converts the "plans you'd want at 100x" claim from assertion to
measurement.  The 10x fixture needs no new generator: each table is
REPLICAS shifted copies of the sf0.1 parquet —

* ``orders``/``lineitem``: key columns shifted by ``i * 1_000_000``
  (keeps the lpad-19 row-key space and disjoint ranges);
* ``documents``: ``doc_id`` shifted AND the text passed through a
  per-replica bijective consonant ``translate`` — within-replica
  near-dup/repeated-span structure is preserved exactly (bijective
  char map), while cross-replica shingle overlap is ~0, so the
  near-dup DENSITY of the corpus stays that of sf0.1 instead of every
  doc gaining 9 exact twins (which would measure a different problem);
* ``embeddings``: ``vec_id`` shifted, vectors as-is (top-k cost is
  pairwise; identical vectors don't change the plan or the work).

Expectations (written to SCALING.md by the round notes):
* scan/filter/write/dedup/substring/sync/topk: ~linear (ratio <=
  ~REPLICAS x, modulo fixed per-query overhead that AMORTIZES at
  scale, so sublinear ratios are fine);
* b-get-point: FLAT-ish — the 1000 probed keys live in the base
  replica, so partition pruning should keep the read bounded;
* join strategy: the executed (post-AQE) plans at 10x must still
  broadcast where the sf0.1 plans broadcast (get-point key set,
  filter-scan fused-SCVF row set, topk query set).

Usage: python tools/scale_probe.py [--replicas N] [--runs N]
Prints ONE JSON line; human-readable progress on stderr.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hbase_1_3_0_spark.catalog import FamilyMeta, TableMeta  # noqa: E402
from hbase_1_3_0_spark.engine import build_session  # noqa: E402
from hbase_1_3_0_spark.operators import itbll, jobs  # noqa: E402
from hbase_1_3_0_spark.pipeline import dedup, similarity, substrings  # noqa: E402
from hbase_1_3_0_spark.sources import fixtures, writer  # noqa: E402
from hbase_1_3_0_spark.sources.kv_encoder import table_to_cells  # noqa: E402
from hbase_1_3_0_spark.table import Table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCRATCH = "/dev/shm" if os.path.isdir("/dev/shm") else None
NOW_MS = 9_000_000
CONS = "etaoinshr"  # frequent letters; rotated per replica (bijective)

FILTER_DSL = (
    "(SingleColumnValueFilter ('d', 'l_returnflag', =, 'binary:R', true, true)"
    " AND SingleColumnValueFilter ('d', 'l_shipdate', =, 'substring:1996-06',"
    " true, true))"
)


def _k(n: int) -> bytes:
    return f"{n:019d}".encode()


def _sink(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _plan(df) -> str:
    """Executed physical plan string. ONLY meaningful after an action
    bound to this DataFrame's own QueryExecution (df.collect()) — a
    noop-write runs a separate execution, leaving this one's adaptive
    plan un-finalized (isFinalPlan=false shows the pre-AQE static plan,
    which is NOT evidence of join strategy; r10 lesson).

    Only the FINAL adaptive plan section is returned: the toString() of
    an AdaptiveSparkPlan appends the "== Initial Plan ==" too, and
    counting nodes over both sections double-counts — an x10 run whose
    final plan had ELIMINATED the tombstone joins outright (AQE
    empty-relation propagation) read as a broadcast->SMJ flip from the
    initial section (r12 lesson)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


def _join_flags(plan: str) -> dict:
    return {
        "broadcast_hash_joins": plan.count("BroadcastHashJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        # the multi-version read-view claim (r11 lag+dense_rank branch):
        # ONE shuffle exchange + ONE sort regardless of scale. Count
        # shuffle and broadcast exchanges SEPARATELY — plan.count(
        # "Exchange") also matched BroadcastExchange, so an unrelated
        # broadcast perturbed the one-exchange invariant (ADVICE r12).
        "exchanges": plan.count("Exchange") - plan.count("BroadcastExchange"),
        "broadcast_exchanges": plan.count("BroadcastExchange"),
        "sorts": plan.count("Sort ["),  # SortExec prints "Sort [order..."
    }


def build_scaled(spark, out_dir: str, replicas: int) -> None:
    specs = [
        ("orders", "o_orderkey"),
        ("lineitem", "l_orderkey"),
        ("documents", "doc_id"),
        ("embeddings", "vec_id"),
    ]
    for name, idcol in specs:
        base = fixtures.load_table(spark, SF_DIR, name)
        parts = []
        for i in range(replicas):
            d = base.withColumn(
                idcol, (F.col(idcol) + F.lit(i * 1_000_000)).cast("long")
            )
            if name == "documents" and i > 0:
                rot = CONS[i % len(CONS):] + CONS[:i % len(CONS)]
                d = d.withColumn("text", F.translate("text", CONS, rot))
            parts.append(d)
        union = parts[0]
        for p in parts[1:]:
            union = union.unionByName(p)
        union.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")
        print(f"built {name} x{replicas}", file=sys.stderr)


def make_workloads(spark, sf_dir: str, tag: str):
    """The top-8 probe workloads (bench.py shapes, identical params) as
    (name, fn, plan_df_fn|None) triples against ``sf_dir``."""
    bench_root = tempfile.mkdtemp(prefix=f"scale_{tag}_", dir=SCRATCH)
    writer.write_cells(
        fixtures.kv_cells(spark, sf_dir, "lineitem"), f"{bench_root}/lineitem"
    )
    writer.write_cells(
        fixtures.kv_cells(spark, sf_dir, "orders"), f"{bench_root}/orders"
    )
    # multi-version fixture for the r11 limit_versions branch: three
    # ts-versions of one column per key plus a same-ts re-put (seq
    # tie-break, the dupe consumes no version slot) on every 5th key
    ov = fixtures.load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    mv_parts = [
        table_to_cells(
            ov.withColumn(
                "o_totalprice", F.col("o_totalprice") + F.lit(float(i))
            ),
            ["o_orderkey"], ["o_totalprice"],
            ts=1_000_000 * (i + 1), seq=i,
        )
        for i in range(3)
    ]
    mv_parts.append(
        table_to_cells(
            ov.where(F.col("o_orderkey") % 5 == 0).withColumn(
                "o_totalprice", F.col("o_totalprice") + F.lit(99.0)
            ),
            ["o_orderkey"], ["o_totalprice"], ts=3_000_000, seq=9,
        )
    )
    mv_cells = mv_parts[0]
    for p in mv_parts[1:]:
        mv_cells = mv_cells.unionByName(p)
    writer.write_cells(mv_cells, f"{bench_root}/orders_mv")

    lineitem_cells = writer.read_cells(spark, f"{bench_root}/lineitem")
    orders_cells = writer.read_cells(spark, f"{bench_root}/orders")
    mv = Table(
        TableMeta(
            name="orders_mv",
            families=(FamilyMeta(name="d", max_versions=5),),
        ),
        writer.read_cells(spark, f"{bench_root}/orders_mv"),
        now_ms=NOW_MS,
    )
    li = Table(TableMeta(name="lineitem", clean_log=True), lineitem_cells,
               now_ms=NOW_MS)
    od = Table(TableMeta(name="orders", clean_log=True), orders_cells,
               now_ms=NOW_MS)
    orders = fixtures.load_table(spark, sf_dir, "orders")
    docs = fixtures.load_table(spark, sf_dir, "documents")
    embs = fixtures.load_table(spark, sf_dir, "embeddings")

    keys = [_k(17 * i % 150_000) for i in range(1000)]  # base-replica keys

    sync_tgt_rows = orders.where(F.col("o_orderkey") % 13 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 11 == 0, F.col("o_totalprice") + 1.0
        ).otherwise(F.col("o_totalprice")),
    )
    sync_tgt = table_to_cells(sync_tgt_rows, ["o_orderkey"])

    topk_queries = embs.where(F.col("vec_id") < 100).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    def bench_write_rand():
        out = tempfile.mkdtemp(prefix="scale_write_", dir=SCRATCH)
        try:
            shuffled = orders.repartition(64, F.col("o_custkey"))
            writer.write_cells(table_to_cells(shuffled, ["o_orderkey"]), out)
        finally:
            shutil.rmtree(out, ignore_errors=True)

    # third element: plan-capture mode — "collect" runs df.collect() once
    # in the warmup round so the FINAL adaptive plan is inspectable (only
    # for workloads whose output is driver-safe to collect); False = no
    # capture (huge output or no joins worth checking)
    wl = [
        ("b-calibrate",
         lambda: spark.range(0, 256_000_000, 1, 32).select(F.sum("id")),
         False),
        ("b-scan-full", lambda: li.scan(), False),  # no joins; huge output
        ("b-get-point", lambda: od.multi_get(keys), "collect"),
        ("b-filter-scan", lambda: li.scan(filter=FILTER_DSL), "collect"),
        ("b-write-rand", bench_write_rand, False),
        ("b-dedup-minhash",
         lambda: dedup.minhash_dedup_pairs(docs, threshold=0.5,
                                           pair_mode="star"),
         "collect"),
        ("b-substring",
         lambda: substrings.remove_repeated_spans(docs, k=40),
         False),  # broadcast-by-construction; output carries full texts
        ("b-sync", lambda: jobs.sync_table(orders_cells, sync_tgt),
         "collect"),
        # the ITBLL flagship invariant (r12): chain generation is one
        # window on list_id; verification is one reference aggregation +
        # one full-outer key join — the counts rollup is driver-safe to
        # collect, so its executed plan pins the join strategy
        ("b-itbll",
         lambda: itbll.verify_chains(
             itbll.generate_chains(orders, "o_orderkey", n_lists=64)
         ),
         False),
        ("b-itbll-counts",
         lambda: itbll.verify_counts(
             itbll.verify_chains(
                 itbll.generate_chains(orders, "o_orderkey", n_lists=64)
             )
         ),
         "collect"),
        # r11-touched read path: full multi-version scan (timing) plus a
        # prunable seek slice (driver-safe collect) whose executed plan
        # must keep ONE exchange + ONE sort at both scales
        ("b-scan-mv", lambda: mv.scan(max_versions=5), False),
        ("b-scan-mv-seek",
         lambda: mv.scan(
             start_row=_k(0), stop_row=_k(3000), max_versions=5
         ),
         "collect"),
        ("b-topk",
         lambda: similarity.cosine_topk(embs, topk_queries, k=10),
         "collect"),
    ]
    return wl, bench_root


def main() -> int:
    replicas = 10
    n_runs = 2
    args = sys.argv[1:]
    if "--replicas" in args:
        replicas = int(args[args.index("--replicas") + 1])
    if "--runs" in args:
        n_runs = int(args[args.index("--runs") + 1])

    warehouse = tempfile.mkdtemp(prefix="scale_wh_", dir=SCRATCH)
    spark = build_session(
        "scale_probe",
        extra_conf={
            "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEMORY", "24g"),
            "spark.sql.warehouse.dir": warehouse,
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    auto_bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")

    scaled_dir = tempfile.mkdtemp(prefix="scale10_data_", dir=SCRATCH)
    t0 = time.time()
    build_scaled(spark, scaled_dir, replicas)
    print(f"fixture build: {time.time() - t0:.1f}s", file=sys.stderr)

    out = {"sf_dir": SF_DIR, "replicas": replicas, "runs": n_runs,
           "autoBroadcastJoinThreshold": auto_bcast}
    roots = []
    try:
        plans = {}
        all_wl = []
        for tag, d in (("base", SF_DIR), ("x10", scaled_dir)):
            wl, root = make_workloads(spark, d, tag)
            roots.append(root)
            all_wl.extend((tag, name, fn, has_df) for name, fn, has_df in wl)
        samples = {(tag, name): [] for tag, name, _, _ in all_wl}
        # round 0 is an UNTIMED warmup (JIT/codegen/first-scan costs land
        # there, not asymmetrically on whichever scale runs first); rounds
        # are interleaved across BOTH scales so a host-load spike hits one
        # sample of many workloads, not all samples of one scale.
        for rnd in range(n_runs + 1):
            label = "warmup" if rnd == 0 else f"round {rnd}/{n_runs}"
            print(f"--- {label} ---", file=sys.stderr)
            for tag, name, fn, plan_mode in all_wl:
                t0 = time.time()
                df = fn()
                if df is not None:
                    _sink(df)
                dt = time.time() - t0
                if rnd > 0:
                    samples[(tag, name)].append(round(dt, 3))
                print(f"{tag}/{name}: {dt:.2f}s", file=sys.stderr)
                if rnd == 0 and plan_mode == "collect" and df is not None:
                    # untimed: finalize THIS df's adaptive plan
                    n_rows = len(df.collect())
                    flags = _join_flags(_plan(df))
                    flags["rows"] = n_rows
                    plans.setdefault(tag, {})[name] = flags
        scales = {}
        for tag in ("base", "x10"):
            scales[tag] = {
                "timings": {
                    n: min(s) for (t, n), s in samples.items() if t == tag
                },
                "samples": {
                    n: s for (t, n), s in samples.items() if t == tag
                },
            }
        ratios = {
            n: round(
                scales["x10"]["timings"][n]
                / max(scales["base"]["timings"][n], 1e-9), 2)
            for n in scales["base"]["timings"]
        }
        out.update(scales=scales, ratios=ratios, plans=plans)
        print(json.dumps(out))
        return 0
    finally:
        spark.stop()
        shutil.rmtree(scaled_dir, ignore_errors=True)
        shutil.rmtree(warehouse, ignore_errors=True)
        for r in roots:
            shutil.rmtree(r, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
