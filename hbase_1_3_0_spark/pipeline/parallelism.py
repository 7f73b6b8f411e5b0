"""Scan-parallelism floor for CPU-multiplying operators.

Several pipeline operators EXPAND each input row by orders of magnitude
before the first exchange (shingle explodes, rolling-window digests,
query×corpus scoring). Their cost lives in the map stage, so their
wall-clock is bounded by the SCAN's task count — and a small corpus
(few parquet files, single row groups) scans as a handful of tasks no
matter how many cores the session has: `maxSplitBytes` never splits
below `openCostInBytes`, and a single row group is one task, period.
At sf0.1 that left the minhash shingle explode and the substring window
explode running on ONE core of a 32-core session (measured r13:
1.02M shingle rows, 2.0s single-task — the whole stage).

:func:`fan_out_small_scan` raises the floor only when the input is
pathologically under-partitioned relative to the session: both the
trigger (input file count) and the target (``defaultParallelism``) are
DERIVED, not constants (guide §2 "scale-adaptive partitioning"), so a
real many-file corpus at cluster scale never takes the branch and its
plan is unchanged — no shuffle is added where the scan already has the
parallelism. The round-robin repartition it inserts at test scale is
deterministic (Spark sorts before round-robin repartitions,
SPARK-23207) and the operators that use it are partition-order
insensitive (integer/hash aggregates, per-row projections).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out_small_scan(df: DataFrame) -> DataFrame:
    """Round-robin repartition ``df`` up to the session's default
    parallelism when its file-source backing has fewer files than
    cores; pass every other input through untouched."""
    try:
        n_files = len(df.inputFiles())
    except Exception:
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    if 0 < n_files < target:
        return df.repartition(target)
    return df
