"""Scan-parallelism floor for CPU-multiplying operators.

Several pipeline operators EXPAND each input row by orders of magnitude
before the first exchange (shingle explodes, rolling-window digests,
query×corpus scoring, per-row regex batteries). Their cost lives in the
map stage, so their wall-clock is bounded by the SCAN's task count — and
a small corpus (few parquet files, single row groups) scans as a handful
of tasks no matter how many cores the session has: a parquet split below
a row-group boundary produces an empty task, so a single-row-group file
is effectively ONE task regardless of how `maxSplitBytes` slices it.
At sf0.1 that left the minhash shingle explode and the substring window
explode running on ONE core of a 32-core session (measured r13:
1.02M shingle rows, 2.0s single-task — the whole stage).

:func:`fan_out_small_scan` raises the floor only when the input is
pathologically under-partitioned relative to the session AND small
enough that the round-robin shuffle it inserts is a rounding error:

- trigger 1: fewer input FILES than cores (each file is at least one
  scan task, so a many-file corpus never takes the branch);
- trigger 2 (r14, VERDICT/ADVICE fix): total input bytes under
  ``cores * spark.sql.files.maxPartitionBytes``. A corpus of a few
  LARGE splittable files (16 x 100 GB on a 2000-core cluster) passes
  trigger 1 but already scans as thousands of byte-range splits — the
  old file-count-only gate would have round-robin-shuffled the whole
  corpus for nothing. The bytes ceiling also bounds the inserted
  shuffle itself to at most ``maxPartitionBytes`` per core.

Both the trigger inputs and the target (``defaultParallelism``) are
DERIVED, not constants (guide §2 "scale-adaptive partitioning"), so no
value is tuned to local[32] and the driver's lower-core bench scales it
automatically. The repartition is deterministic (Spark sorts before
round-robin repartitions, SPARK-23207) and the operators that use it
are partition-order insensitive (integer/hash aggregates, per-row
projections).

WHERE it applies is a measured, per-call-site decision, not a blanket
one (r13 lesson — the r14 paired A/B protocol, alternating fan-out
on/off in one session, showed the lm/dsir tokenize explodes LOSE by the
cost of the extra exchange because their downstream per-row work is
cheap and the next operator shuffles anyway; the shingle/window/regex
sites win 1.5-4x because their map-stage CPU dominates). Call sites:
dedup shingles, substring window digests, cosine_topk corpus,
text_stats regex battery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _should_fan_out(
    n_files: int, total_bytes: int, target: int, max_partition_bytes: int
) -> bool:
    """Pure decision core (unit-testable without a FileSystem): fan out
    iff the scan has fewer files than cores AND the whole input is small
    enough that the added round-robin exchange stays under one
    ``maxPartitionBytes`` of shuffle per core."""
    return 0 < n_files < target and total_bytes < target * max_partition_bytes


def fan_out_small_scan(df: DataFrame) -> DataFrame:
    """Round-robin repartition ``df`` up to the session's default
    parallelism when its file-source backing is both under-partitioned
    (fewer files than cores) and small (bytes under
    ``cores * maxPartitionBytes``); pass every other input through
    untouched — in particular a few-large-files corpus, whose scan
    already splits by byte range."""
    try:
        files = df.inputFiles()
    except Exception:
        return df
    n_files = len(files)
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if n_files <= 0 or n_files >= target:
        return df
    try:
        # size-string-parsed long ("128MB", "1g", ... all normalized)
        max_pb = int(
            spark._jsparkSession.sessionState().conf().filesMaxPartitionBytes()
        )
    except Exception:
        max_pb = 128 * 1024 * 1024
    try:
        jvm = spark._jvm
        hconf = spark._jsc.hadoopConfiguration()
        total = 0
        for f in files:
            p = jvm.org.apache.hadoop.fs.Path(f)
            fs = p.getFileSystem(hconf)
            total += fs.getFileStatus(p).getLen()
    except Exception:
        # size probe failed (exotic filesystem): keep the r13 behavior
        # for a provably-few-files input rather than silently changing
        # the plan shape
        total = 0
    if _should_fan_out(n_files, total, target, max_pb):
        return df.repartition(target)
    return df
