"""b-sync two-phase prefilter crossover probe (VERDICT r13 item 4).

Measures jobs.sync_table default (direct full-outer diff) vs
hash_prefilter=True (HashTable digests first, full-outer only on rows of
differing buckets — the reference's actual two-phase SyncTable) across
diff DENSITIES and SCALES:

- dense: the bench row's own target (~17%% of rows differ — every one of
  the 1024 buckets is dirty, so the prefilter prunes nothing and pays
  two extra digest passes);
- sparse: 1-in-1000 rows differ (the steady-state replication-repair
  regime the two-phase algorithm exists for);
- 10x: the sparse case over a 10x-replicated orders log.

Interleaved A/B per density (default, prefilter, default, ...), min-of-N
per side. Run on a quiet window; the b-calibrate analog here is the
repeatability of the default side across rounds.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hbase_1_3_0_spark.engine import build_session  # noqa: E402
from hbase_1_3_0_spark.operators import jobs  # noqa: E402
from hbase_1_3_0_spark.sources import fixtures, writer  # noqa: E402
from hbase_1_3_0_spark.sources.kv_encoder import table_to_cells  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCRATCH = "/dev/shm" if os.path.isdir("/dev/shm") else None
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))


def _sink(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = build_session(
        "sync_probe_r14",
        extra_conf={"spark.driver.memory": os.environ.get(
            "SPARK_DRIVER_MEMORY", "24g")},
    )
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="syncprobe_", dir=SCRATCH)
    orders = fixtures.load_table(spark, SF_DIR, "orders")
    writer.write_cells(
        fixtures.kv_cells(spark, SF_DIR, "orders"), f"{root}/orders")
    src1 = writer.read_cells(spark, f"{root}/orders")

    def make_target(rows_df, dense):
        if dense:  # the bench row's own diff shape
            out = rows_df.where(F.col("o_orderkey") % 13 != 0).withColumn(
                "o_totalprice",
                F.when(F.col("o_orderkey") % 11 == 0,
                       F.col("o_totalprice") + 1.0
                       ).otherwise(F.col("o_totalprice")))
        else:  # 1-in-1000 rows touched
            out = rows_df.where(
                F.col("o_orderkey") % 2000 != 0).withColumn(
                "o_totalprice",
                F.when(F.col("o_orderkey") % 2000 == 1,
                       F.col("o_totalprice") + 1.0
                       ).otherwise(F.col("o_totalprice")))
        return table_to_cells(out, ["o_orderkey"])

    # 10x source: replicate orders with shifted keys, persist as cells
    o10 = orders.crossJoin(
        spark.range(10).select(F.col("id").alias("_rep"))
    ).withColumn(
        "o_orderkey",
        F.col("o_orderkey") + F.col("_rep") * F.lit(10_000_000),
    ).drop("_rep")
    writer.write_cells(table_to_cells(o10, ["o_orderkey"]), f"{root}/o10")
    src10 = writer.read_cells(spark, f"{root}/o10")

    cases = [
        ("dense-1x", src1, make_target(orders, dense=True)),
        ("sparse-1x", src1, make_target(orders, dense=False)),
        ("sparse-10x", src10, make_target(o10, dense=False)),
    ]
    results = {}
    for name, src, tgt in cases:
        sides = {
            "default": jobs.sync_table(src, tgt),
            "prefilter": jobs.sync_table(src, tgt, hash_prefilter=True),
        }
        samples = {k: [] for k in sides}
        for _ in range(RUNS):
            for k, df in sides.items():
                spark.sparkContext.setJobDescription(f"sync/{name}/{k}")
                t0 = time.time()
                _sink(df)
                samples[k].append(time.time() - t0)
                spark.sparkContext.setJobDescription(None)
        results[name] = {
            k: {"min": round(min(s), 3), "samples": [round(x, 2) for x in s]}
            for k, s in samples.items()
        }
        print(name, results[name], flush=True)
        # decision-rule sanity: both sides emit the same mutation stream
        a = sides["default"].count()
        b = sides["prefilter"].count()
        print(f"  rows: default={a} prefilter={b} match={a == b}", flush=True)
    import json
    import shutil
    print(json.dumps(results))
    spark.stop()
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
