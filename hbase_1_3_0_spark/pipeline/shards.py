"""Training-shard materialization: packed sequences -> shard files +
an auditable manifest.

The last mile of a training-data pipeline: after packing
(sampling.pack_sequences lays documents on per-stratum token tapes cut
every ``capacity`` tokens), training jobs want FIXED-SIZE SHARDS — a
bounded number of context windows per file — plus a manifest that lets
a consumer (or a re-run) verify every shard without re-reading data:
document count, token count, window count, and an order-independent
document digest per shard.

Scale shape:
- Shard assignment is pure arithmetic on the packing output
  (``shard_id = bin_id div bins_per_shard``) — no new shuffle beyond
  pack_sequences' single stratum-keyed window.
- The data write is ONE ``partitionBy(stratum, shard_id)`` parquet job
  — Spark's committer provides atomic finalize, and a shard is a
  directory a training loader can read independently.
- The manifest is one groupBy over the placements (rows = #shards,
  KB-scale) written next to the data. Its ``doc_digest`` is a bit_xor
  of per-doc md5 longs — order-independent (partition order never
  changes it) and exactly reproducible by any engine with md5
  (the HashTable bucket-digest convention, operators/jobs.py:140).

Verification story: ``shard_manifest`` recomputes the manifest from
the raw corpus in SQL (driver oracle); the writer's pytest reads the
shards BACK and re-derives the manifest from the materialized files —
if a shard lost or duplicated a document, digest or counts diverge.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hbase_1_3_0_spark.pipeline.sampling import pack_sequences

__all__ = ["shard_placements", "shard_manifest", "write_training_shards"]


def shard_placements(
    df: DataFrame,
    *,
    capacity: int = 2048,
    bins_per_shard: int = 16,
    token_col: Column | None = None,
    strata_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """pack_sequences placements + the shard each document STARTS in
    (``shard_id = bin_id div bins_per_shard``). A document whose tokens
    spill into the next window stays in its starting shard — the
    packing contract already accounts spill explicitly (``spill``
    column), so loaders can duplicate boundary windows if they need
    seamless tapes."""
    if bins_per_shard < 1:
        raise ValueError("bins_per_shard must be >= 1")
    placed = pack_sequences(
        df,
        capacity=capacity,
        token_col=token_col,
        strata_col=strata_col,
        id_col=id_col,
    )
    return placed.withColumn(
        "shard_id", F.expr(f"bin_id div {int(bins_per_shard)}")
    )


def shard_manifest(
    placements: DataFrame,
    *,
    strata_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-shard audit row: (stratum, shard_id, n_docs, n_tokens,
    n_bins, doc_digest). ``doc_digest`` = bit_xor over the shard's
    documents of the first 60 md5 bits of the id — order-independent
    and engine-portable."""
    return placements.groupBy(strata_col, "shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.countDistinct("bin_id").alias("n_bins"),
        F.expr(
            f"bit_xor(cast(conv(substring(md5(cast({id_col} as string)),"
            " 1, 15), 16, 10) as long))"
        ).alias("doc_digest"),
    )


def _rm_dir(path: str) -> None:
    """Best-effort recursive delete of a (possibly absent) local dir.
    Remote URI schemes are left to the writer's own overwrite — the
    pre-delete is a local-fs hardening of the manifest contract."""
    if "://" in path:
        return
    import shutil

    shutil.rmtree(path, ignore_errors=True)


def write_training_shards(
    df: DataFrame,
    path: str | Path,
    *,
    capacity: int = 2048,
    bins_per_shard: int = 16,
    token_col: Column | None = None,
    strata_col: str = "source",
    id_col: str = "doc_id",
    mode: str = "overwrite",
) -> DataFrame:
    """Materialize shards + manifest; returns the manifest DataFrame.

    Layout: ``{path}/data`` partitioned by (stratum, shard_id) — one
    independently-loadable directory per shard, written in ONE job
    through Spark's atomic committer; ``{path}/manifest`` is the
    KB-scale audit table. Write ordering makes the manifest the
    certificate for its shards in BOTH directions: on a re-run any
    previous manifest is removed BEFORE the data rewrite starts (a
    reader starting mid-rerun finds no manifest, not a stale one over
    half-rewritten data), and the new manifest is written only AFTER
    the data commits — so a present manifest always describes fully
    committed shards.
    """
    path = str(path)
    if mode == "overwrite":
        # retract the certificate before touching data: a stale
        # manifest over a mid-rewrite data dir would falsely certify
        _rm_dir(f"{path}/manifest")
    placed = shard_placements(
        df,
        capacity=capacity,
        bins_per_shard=bins_per_shard,
        token_col=token_col,
        strata_col=strata_col,
        id_col=id_col,
    )
    joined = df.join(
        placed.select(
            F.col(id_col), "shard_id", "bin_id", "bin_off", "n_tokens"
        ),
        id_col,
    )
    (
        joined.repartition(strata_col, "shard_id")
        .write.mode(mode)
        .partitionBy(strata_col, "shard_id")
        .parquet(f"{path}/data")
    )
    manifest = shard_manifest(placed, strata_col=strata_col, id_col=id_col)
    manifest.write.mode(mode).parquet(f"{path}/manifest")
    return manifest
