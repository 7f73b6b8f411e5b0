"""HBase-style Bloom filters (ROW / ROWCOL) as DataFrame-native indexes.

Reference semantics (hbase-1.3.0):
- ``ByteBloomFilter.java:157`` ``computeBitSize``: bits =
  ceil(maxKeys * -ln(err) / ln(2)^2); ``:250`` ``optimalFunctionCount``:
  k = ceil(ln(2) * bits / maxKeys).
- ``ByteBloomFilter.java:372`` ``add``: Kirsch–Mitzenmacher double
  hashing — h1 = hash(key, 0), h2 = hash(key, h1), bit_i =
  (h1 + i*h2) mod bits for i in 0..k-1 (the combinatorial-generation
  trick the reference cites from Kirsch & Mitzenmacher, ESA'06).
- ``CompoundBloomFilterWriter.java``: blooms are built per HFile chunk,
  each chunk sized for ITS key count — mirrored here by building one
  bloom per region with per-region sizing.
- BloomType ROW keys on the row key; ROWCOL on row+family+qualifier
  (``StoreFile.java`` bloom-key assembly).

Spark-first shape: the bloom is a DataFrame of set bit positions
``(region, bit)`` — ~k bits per key, deduped, tiny next to the cell
log (a 1B-key region at err=1% is ~1.2 GB of bits as a parquet table
of longs; per-region tables stay in the tens of MB). Building is ONE
projection (explode k positions) + ONE distinct per region; probing
broadcasts the probe positions against the bit table and needs a key
to hit ALL k of its positions (``count = k``) to schedule a region
read — the same read-path pruning HBase gets from
``StoreFile.passesBloomFilter``.

Engine-neutral hashing so a SQL oracle can replay it exactly: h1/h2
come from md5 hex prefixes (32-bit) rather than the reference's
Murmur (seeded-int Murmur is not reproducible across engines; the
double-hash SCHEME and the sizing math are the contract). Sizing is
fixed-point integer arithmetic (micro-units) so ceil() never straddles
a float ulp between engines.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "sizing_factor_micro",
    "hash_factor_micro",
    "bloom_sizing",
    "bloom_key",
    "build_bloom",
    "bloom_probe",
    "bloom_for_presplit_table",
    "pruned_point_reads",
    "bloom_ingest_update",
    "bloom_store_probe",
    "rebuild_bloom_base",
    "bloom_per_file",
    "pruned_file_reads",
]

#: ln(2)^2 — ByteBloomFilter.LOG2_SQUARED (~0.480453).
_LOG2_SQUARED = math.log(2.0) * math.log(2.0)
#: ln(2) in micro-units, for the fixed-point optimal-k formula.
_LN2_MICRO = round(math.log(2.0) * 1_000_000)


def sizing_factor_micro(error_rate: float) -> int:
    """-ln(err)/ln(2)^2 in micro-units: the per-key bit cost of
    ``computeBitSize`` (ByteBloomFilter.java:157), frozen to an integer
    so both engines compute bit sizes with exact bigint arithmetic."""
    if not 0.0 < error_rate < 1.0:
        raise ValueError("error_rate must be in (0, 1)")
    return round(-math.log(error_rate) / _LOG2_SQUARED * 1_000_000)


def hash_factor_micro() -> int:
    return _LN2_MICRO


def bloom_sizing(keys_per_region: DataFrame, error_rate: float = 0.01) -> DataFrame:
    """Per-region bloom metadata from per-region key counts.

    Input: ``(region, n_keys)``. Output adds ``n_bits`` (fixed-point
    ``computeBitSize``) and ``n_hash`` (fixed-point
    ``optimalFunctionCount`` — ceil(ln2 * floor(bits / keys)), the
    INNER integer division first, exactly as
    ByteBloomFilter.java:250's ``(int)(bitSize / maxKeys)`` truncates
    before the multiply). Ceil division is ``(a + b - 1) div b`` so
    the arithmetic is pure bigint end to end.
    """
    factor = sizing_factor_micro(error_rate)
    # integer ceil-div `(a + b - 1) div b` throughout — `div` (not `/`)
    # keeps the arithmetic in bigint; float division would round the
    # ceil boundary differently per engine once counts get large
    sized = keys_per_region.select(
        "region",
        F.col("n_keys").cast("long").alias("n_keys"),
        F.expr(
            f"(cast(n_keys as bigint) * {factor} + 999999) div 1000000"
        ).alias("n_bits"),
    )
    return sized.select(
        "region",
        "n_keys",
        "n_bits",
        F.expr(
            f"((n_bits div n_keys) * {_LN2_MICRO} + 999999) div 1000000"
        ).alias("n_hash"),
    )


def bloom_key(
    row: Column, family: Column | None = None, qualifier: Column | None = None
) -> Column:
    """The hashed bloom key: ROW keys on the row key alone; ROWCOL on
    row+family+qualifier (StoreFile.java bloom-key assembly). Binary
    columns enter as hex so the key is a deterministic string."""
    parts = [F.hex(row)]
    if family is not None:
        parts += [F.lit("|"), F.hex(family)]
    if qualifier is not None:
        parts += [F.lit("|"), F.hex(qualifier)]
    return F.concat(*parts) if len(parts) > 1 else parts[0]


def _h32(key: Column, salt: str) -> Column:
    """32-bit uniform hash: first 8 md5 hex digits as a long."""
    return F.conv(F.substring(F.md5(F.concat(key, F.lit(salt))), 1, 8), 16, 10).cast(
        "long"
    )


def _positions(key: Column, n_bits: Column, n_hash: Column) -> Column:
    """The k double-hashed bit positions of ``key`` —
    ByteBloomFilter.java:381 ``(h1 + i*h2) mod bits`` with non-negative
    32-bit h1/h2 (no abs() needed)."""
    h1 = _h32(key, "#b1")
    h2 = _h32(key, "#b2")
    return F.transform(
        F.sequence(F.lit(0), (n_hash - 1).cast("int")),
        lambda i: (h1 + i.cast("long") * h2) % n_bits,
    )


def build_bloom(
    keyed: DataFrame,
    sizing: DataFrame,
    *,
    region_col: str = "region",
    key_col: str = "bkey",
) -> DataFrame:
    """Build per-region blooms: ``(region, bit)`` distinct set bits.

    ``keyed`` is ``(region, bkey)`` — one row per DISTINCT bloom key per
    region (callers dedup; ROW blooms add each row key once no matter
    how many cells it has — ByteBloomFilter.add is called per unique
    key by the store writer). ``sizing`` is :func:`bloom_sizing`'s
    output, joined in by region (a broadcast — region metadata is tiny).

    One explode + one distinct; the shuffle key is (region, bit), and
    partial aggregation dedups map-side.
    """
    pos = (
        keyed.join(F.broadcast(sizing), region_col)
        .select(
            region_col,
            F.explode(
                _positions(F.col(key_col), F.col("n_bits"), F.col("n_hash"))
            ).alias("bit"),
        )
        .distinct()
    )
    return pos


def bloom_probe(
    bloom_bits: DataFrame,
    sizing: DataFrame,
    probes: DataFrame,
    *,
    key_col: str = "bkey",
) -> DataFrame:
    """Which regions might contain each probe key?

    ``probes`` is ``(probe_id, bkey)``. Every probe is tested against
    every region's bloom (a get without a known region consults each
    store's bloom — StoreFile.passesBloomFilter per store). Returns
    ``(probe_id, region)`` pairs the bloom canNOT rule out — the regions
    a Get must actually read. No false negatives by construction; false
    positives bounded by the sizing error rate.

    Plan shape: probes × regions is |probes|·|regions| rows of
    positions — probe sets are small (a multi-get batch), so the probe
    side broadcasts into a hash join against the bit table; the bit
    table itself is never shuffled.
    """
    probe_pos = probes.crossJoin(F.broadcast(sizing)).select(
        "probe_id",
        "region",
        F.col("n_hash"),
        F.explode(
            _positions(F.col(key_col), F.col("n_bits"), F.col("n_hash"))
        ).alias("bit"),
    )
    # the PROBE side is the small one (a multi-get batch × regions × k);
    # the bit table stays put and is hash-probed in place
    hits = bloom_bits.join(F.broadcast(probe_pos), ["region", "bit"])
    return (
        hits.groupBy("probe_id", "region", "n_hash")
        .agg(F.count(F.lit(1)).alias("_set"))
        .where(F.col("_set") == F.col("n_hash"))
        .select("probe_id", "region")
    )


def bloom_for_presplit_table(
    spark, path, *, error_rate: float = 0.01
) -> tuple[DataFrame, DataFrame]:
    """Build the ROW bloom family for a pre-split cell log written by
    ``sources.writer.write_cells(split_points=...)`` — the layout whose
    ``region=NNN`` partition directories are the region boundaries.

    Returns ``(bloom_bits, sizing)``. The reference builds one bloom
    chunk per HFile at flush/compaction (CompoundBloomFilterWriter);
    here the unit is the region directory: one scan, ROW keys deduped
    per region (ByteBloomFilter.add is per unique row key), each
    region's chunk sized for ITS key count. Persist both tables next
    to the log and rebuild them in the compaction job exactly like the
    reference rewrites blooms at compaction time.
    """
    from pyspark.sql import functions as F

    cells = spark.read.parquet(str(path))
    keys = (
        cells.select(F.col("region").cast("long").alias("region"), "row")
        .distinct()
        .select("region", bloom_key(F.col("row")).alias("bkey"))
    )
    sizing = bloom_sizing(
        keys.groupBy("region").agg(F.count(F.lit(1)).alias("n_keys")),
        error_rate=error_rate,
    )
    return build_bloom(keys, sizing), sizing


def pruned_point_reads(
    spark, path, probes: DataFrame, bloom_bits: DataFrame, sizing: DataFrame
) -> DataFrame:
    """Multi-get through the bloom: read ONLY the region partitions the
    blooms cannot rule out — StoreFile.passesBloomFilter as a parquet
    PARTITION filter (the IVF-PQ nprobe-partition-pruning precedent).

    ``probes`` is ``(probe_id, row)`` with binary rows. The candidate
    (region, row) verdicts are collected to the driver — bounded by
    |batch| x |regions| and usually far smaller (ideally one region per
    present key plus the false-positive tail), the same class of
    bounded plan parameter as an IVF query's probe list — and become a
    literal ``region IN (...)`` partition predicate plus a broadcast
    semi-join on the row key. Regions the bloom rejects never have
    their files opened (assert via ``df.inputFiles()``).

    Returns the matching cells with their region id.
    """
    from pyspark.sql import functions as F

    keyed = probes.select(
        "probe_id", "row", bloom_key(F.col("row")).alias("bkey")
    )
    maybe = bloom_probe(bloom_bits, sizing, keyed.select("probe_id", "bkey"))
    # bounded: probe batch x surviving regions; materialized once so
    # the region-list read and the semi-join don't re-probe the blooms
    cand = (
        maybe.join(keyed, "probe_id")
        .select("region", "row")
        .distinct()
        .localCheckpoint()
    )
    # only the REGION LIST reaches the driver (bounded by region count)
    regions = sorted(
        r.region for r in cand.select("region").distinct().collect()
    )
    cells = spark.read.parquet(str(path))
    if not regions:
        return cells.where(F.lit(False))
    pruned = cells.where(F.col("region").isin(regions))
    bc = cand.select(
        F.col("region").alias("_r"), F.col("row").alias("_row")
    )
    return pruned.join(
        F.broadcast(bc),
        (pruned["region"] == F.col("_r")) & (pruned["row"] == F.col("_row")),
        "left_semi",
    )


def bloom_ingest_update(
    spark,
    batch_cells: DataFrame,
    batch_id: int,
    *,
    bloom_dir: str,
    region_col: str = "region",
    error_rate: float = 0.01,
) -> None:
    """Streaming bloom maintenance: write THIS batch's bloom chunk.

    The reference writes one bloom chunk per HFile at memstore flush
    (CompoundBloomFilterWriter) and point reads consult every file's
    chunk; the streaming analog is one chunk per MICRO-BATCH, sized
    for the batch's own keys. Layout: ``{bloom_dir}/bits`` holds
    ``(region, bit)`` and ``{bloom_dir}/sizing`` holds the per-region
    chunk metadata, both partitioned by ``batch_id`` and written with
    dynamic partition overwrite — a re-delivered batch rewrites ITS
    OWN partitions in place, the ingest-sink idempotence mechanism
    (streaming/wal.py dedup_ingest_stream precedent).

    ``batch_cells`` needs (region, row); keys dedup per region before
    sizing (ByteBloomFilter.add is per unique key).
    """
    keys = (
        batch_cells.select(
            F.col(region_col).cast("long").alias("region"), "row"
        )
        .distinct()
        .select("region", bloom_key(F.col("row")).alias("bkey"))
    )
    sizing = bloom_sizing(
        keys.groupBy("region").agg(F.count(F.lit(1)).alias("n_keys")),
        error_rate=error_rate,
    ).localCheckpoint()
    bits = build_bloom(keys, sizing)
    (
        bits.withColumn("batch_id", F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(f"{bloom_dir}/bits")
    )
    (
        sizing.withColumn("batch_id", F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(f"{bloom_dir}/sizing")
    )


def bloom_store_probe(spark, bloom_dir: str, probes: DataFrame) -> DataFrame:
    """Probe every chunk of a streaming bloom store: a key is a
    candidate for a region if ANY chunk's bloom passes — exactly the
    CompoundBloomFilter read rule (a union over HFile chunks), so keys
    ingested in any batch are never false-negatived.

    ``probes`` is ``(probe_id, bkey)``. The per-chunk double-hash
    positions depend on that chunk's n_bits, so the probe fans out to
    (probe x batch x region) — still a broadcast-scale frame for
    multi-get batches; the bit store is scanned once, never shuffled.
    Returns distinct ``(probe_id, region)``.
    """
    sizing = spark.read.parquet(f"{bloom_dir}/sizing")
    bits = spark.read.parquet(f"{bloom_dir}/bits")
    probe_pos = probes.crossJoin(F.broadcast(sizing)).select(
        "probe_id",
        "batch_id",
        "region",
        F.col("n_hash"),
        F.explode(
            _positions(F.col("bkey"), F.col("n_bits"), F.col("n_hash"))
        ).alias("bit"),
    )
    hits = bits.join(F.broadcast(probe_pos), ["batch_id", "region", "bit"])
    return (
        hits.groupBy("probe_id", "batch_id", "region", "n_hash")
        .agg(F.count(F.lit(1)).alias("_set"))
        .where(F.col("_set") == F.col("n_hash"))
        .select("probe_id", "region")
        .distinct()
    )


def rebuild_bloom_base(
    spark,
    cells: DataFrame,
    bloom_dir: str,
    *,
    up_to_batch: int,
    region_col: str = "region",
    error_rate: float = 0.01,
) -> None:
    """Compact the streaming bloom store: rebuild ONE base chunk
    (``batch_id=-1``) from the CURRENT table cells and drop the folded
    per-batch chunks. Blooms cannot be merged bit-wise (each chunk has
    its own n_bits), so compaction rebuilds from data — exactly what
    the reference does when a store-file compaction rewrites its bloom.
    Same crash posture as compact_ingest_store: BOTH base partitions
    are written first — sizing before bits, so an orphaned bits chunk
    is at worst extra probe work — and only then are the folded
    partitions of BOTH tables deleted. (Ordering matters: deleting a
    table's folded partitions before the OTHER table's base is written
    would, on a crash in between, leave sizing rows pointing at
    deleted bits chunks — permanent false negatives. With write-all-
    then-delete-all, a crash anywhere leaves redundant or orphaned
    chunks, which only cost extra probe work, never false negatives.)

    ``up_to_batch`` must stay strictly below any batch the stream could
    replay (the ingest-store frontier rule).
    """
    import shutil
    from pathlib import Path as _P

    bloom_dir = str(bloom_dir)
    if "://" in bloom_dir:
        raise ValueError(
            "rebuild_bloom_base deletes folded partitions with local "
            "filesystem APIs; run it against a local/shared-fs path"
        )
    keys = (
        cells.select(F.col(region_col).cast("long").alias("region"), "row")
        .distinct()
        .select("region", bloom_key(F.col("row")).alias("bkey"))
    )
    sizing = bloom_sizing(
        keys.groupBy("region").agg(F.count(F.lit(1)).alias("n_keys")),
        error_rate=error_rate,
    ).localCheckpoint()
    bits = build_bloom(keys, sizing)
    # phase 1: write both bases; with deletion deferred, a crash here
    # leaves an orphan base chunk (sizing without bits probes as a
    # miss on that chunk, bits without sizing is never probed) while
    # every folded chunk is still intact — no key can be lost
    for name, df in (("sizing", sizing), ("bits", bits)):
        (
            df.withColumn("batch_id", F.lit(-1))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(f"{bloom_dir}/{name}")
        )
    # phase 2: only now fold away the superseded batch partitions
    for name in ("bits", "sizing"):
        for p in _P(f"{bloom_dir}/{name}").glob("batch_id=*"):
            bid = int(p.name.split("=")[1])
            if -1 < bid <= up_to_batch:
                shutil.rmtree(p)


def bloom_per_file(spark, path, *, error_rate: float = 0.01):
    """Per-FILE ROW blooms for ANY cell-log layout — the exact
    granularity of the reference (one bloom per HFile,
    CompoundBloomFilterWriter): chunk identity is the parquet file
    path via ``input_file_name()``, so no region partition column is
    required. Returns ``(bloom_bits, sizing)`` with the file path in
    the ``region`` column (the bloom machinery is generic over chunk
    identity — it only groups and joins on it).
    """
    from hbase_1_3_0_spark.cells import CELL_SCHEMA

    cells = spark.read.schema(CELL_SCHEMA).parquet(str(path))
    keys = (
        cells.select(F.input_file_name().alias("region"), "row")
        .distinct()
        .select("region", bloom_key(F.col("row")).alias("bkey"))
    )
    sizing = bloom_sizing(
        keys.groupBy("region").agg(F.count(F.lit(1)).alias("n_keys")),
        error_rate=error_rate,
    )
    return build_bloom(keys, sizing), sizing


def pruned_file_reads(
    spark, probes: DataFrame, bloom_bits: DataFrame, sizing: DataFrame
) -> DataFrame:
    """Multi-get through per-file blooms: open ONLY the parquet files
    whose blooms pass — StoreFile.passesBloomFilter at its native
    granularity. Candidate file paths are collected (bounded by the
    file count, and typically ~1 file per present key) and handed to
    the reader as an explicit path list, so non-candidate files are
    never opened at all; the row-key semi-join then exacts the match.

    ``probes`` is ``(probe_id, row)`` binary rows. Returns matching
    cells. An empty candidate set returns an empty frame with the cell
    schema.
    """
    from hbase_1_3_0_spark.cells import CELL_SCHEMA

    keyed = probes.select(
        "probe_id", "row", bloom_key(F.col("row")).alias("bkey")
    )
    maybe = bloom_probe(bloom_bits, sizing, keyed.select("probe_id", "bkey"))
    cand = (
        maybe.join(keyed, "probe_id")
        .select("region", "row")
        .distinct()
        .localCheckpoint()
    )
    files = sorted(
        r.region for r in cand.select("region").distinct().collect()
    )
    if not files:
        return spark.createDataFrame([], CELL_SCHEMA)
    cells = spark.read.schema(CELL_SCHEMA).parquet(*files)
    rows = cand.select(F.col("row").alias("_row")).distinct()
    return cells.join(
        F.broadcast(rows), cells["row"] == F.col("_row"), "left_semi"
    )
