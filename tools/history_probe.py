"""Streaming near-dup ingest: 10x accepted-history probe (VERDICT r10
next-round #5).

The r8 band-store measurement established the store's win at a
400k-signature accepted history. This probe asks the SCALE question the
batch-side 10x probe (tools/scale_probe.py) asked of the batch
workloads: replay one near-dup micro-batch commit against 400k and
4M-signature accepted histories and measure how per-batch time grows.
Claim under test — with the band store the per-batch probe is
linear-in-BATCH, not in-HISTORY (the history term is a 3-long-column
columnar scan of the persisted (doc_id, band, bucket) table); without
it, re-banding history (posexplode + 16 slice hashes over every
accepted signature, every batch, forever) is the linear-in-history
term that 10x's along with the store.

Usage: python tools/history_probe.py [--rounds N]
Writes one JSON line to stdout; human-readable progress to stderr.
Untimed setup (build stores + backfill band tables) dominates
wall-clock; each timed sample is one idempotent batch_id=1 commit
(dynamic partition overwrite — each sample overwrites the last).
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from hbase_1_3_0_spark.engine import build_session  # noqa: E402
from hbase_1_3_0_spark.sources import fixtures  # noqa: E402
from hbase_1_3_0_spark.streaming import wal as walmod  # noqa: E402

SCRATCH = "/dev/shm" if __import__("os").path.isdir("/dev/shm") else None
SF_DIR = __import__("os").environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
)


def build_history(spark, base: str, n_hist: int) -> None:
    """Synthetic accepted history: n_hist signatures as the compacted
    batch_id=-1 base (the bench's b-neardup-hist fixture shape), plus
    the backfilled band table for the store variant."""
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
            .parquet(f"{base}/{variant}/store")
        )
    walmod.backfill_neardup_band_store(
        spark, f"{base}/store/store", f"{base}/store/bands"
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    spark = build_session("history_probe")
    spark.sparkContext.setLogLevel("ERROR")

    docs = fixtures.load_table(spark, SF_DIR, "documents")
    nd_docs = docs.select("doc_id", "text", "source")
    n_batch = nd_docs.count()

    sizes = {"400k": 400_000, "4M": 4_000_000}
    bases = {}
    for tag, n in sizes.items():
        base = tempfile.mkdtemp(prefix=f"ndhist_{tag}_", dir=SCRATCH)
        print(f"building {tag} history ({n} sigs)...", file=sys.stderr)
        build_history(spark, base, n)
        bases[tag] = base

    samples: dict[str, list[float]] = {}
    for rnd in range(args.rounds):
        for tag in sizes:
            for variant, band in (("store", True), ("reband", False)):
                key = f"{tag}-{variant}"
                base = bases[tag]
                t0 = time.time()
                walmod._neardup_commit_batch(
                    spark,
                    nd_docs,
                    1,
                    out_dir=f"{base}/{variant}/out",
                    store_dir=f"{base}/{variant}/store",
                    threshold=0.8,
                    band_store_dir=(
                        f"{base}/store/bands" if band else None
                    ),
                )
                dt = time.time() - t0
                samples.setdefault(key, []).append(dt)
                print(f"round {rnd + 1}: {key}: {dt:.2f}s", file=sys.stderr)

    timings = {k: round(min(v), 3) for k, v in samples.items()}
    ratios = {
        "store_10x_growth": round(
            timings["4M-store"] / timings["400k-store"], 2
        ),
        "reband_10x_growth": round(
            timings["4M-reband"] / timings["400k-reband"], 2
        ),
        "store_win_at_4M": round(
            timings["4M-reband"] / timings["4M-store"], 2
        ),
    }
    print(json.dumps({
        "probe": "neardup_history_10x",
        "batch_docs": n_batch,
        "timings_min_sec": timings,
        "samples": {k: [round(x, 2) for x in v] for k, v in samples.items()},
        "ratios": ratios,
        "rounds": args.rounds,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
