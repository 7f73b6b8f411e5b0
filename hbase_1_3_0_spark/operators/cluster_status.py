"""ClusterStatus / ServerLoad / RegionLoad observability rollups.

Reference surface (hbase-client, hbase-1.3.0):

- ``RegionLoad`` (RegionLoad.java:37): per-region metrics —
  stores/storefiles (:62/:69), storefileSizeMB (:76), memStoreSizeMB
  (:83), readRequestsCount (:104), writeRequestsCount (:111), and
  ``getRequestsCount() = read + write`` (:97).
- ``ServerLoad`` (ServerLoad.java): the per-regionserver rollup the
  constructor computes by SUMMING its RegionLoads (:55-70 — stores,
  storefiles, storefile sizes, memstore, read/write request counts),
  plus ``getNumberOfRegions`` (:175) and ``getLoad`` == region count
  (:212-217).
- ``ClusterStatus`` (ClusterStatus.java:65): getServersSize (:133),
  getDeadServers (:140), getRegionsCount = sum of server loads (:155),
  getRequestsCount (:168), and getAverageLoad = total load /
  serversSize as a double (:147-149).

Spark posture: a cluster's region-load table is master metadata (one
row per region — thousands of rows for a petabyte cluster), so these
are plain aggregations; the cluster-level columns ride a
``Window.partitionBy()`` over the (tiny) per-server frame rather than a
driver collect, keeping the whole status one declarative plan. The
engine's own region metadata (``Engine.region_boundaries``, the
balancer/normalizer inputs) produces compatible frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["server_load", "cluster_status", "last_major_compaction_ts"]

#: RegionLoad metric columns summed into ServerLoad (ServerLoad.java:55-70)
_SUM_COLS = (
    ("stores", "stores"),
    ("storefiles", "storefiles"),
    ("storefile_size_mb", "storefile_size_mb"),
    ("memstore_size_mb", "memstore_size_mb"),
    ("read_requests", "read_requests"),
    ("write_requests", "write_requests"),
)


def server_load(region_loads: DataFrame, *, server_col: str = "server") -> DataFrame:
    """ServerLoad rows from a RegionLoad table: one row per server with
    every :data:`_SUM_COLS` metric summed (ServerLoad.java:55-70),
    ``n_regions`` (getNumberOfRegions :175 — also getLoad :212), and
    ``requests`` = read + write (RegionLoad.getRequestsCount :97 summed
    over the server's regions). Missing metric columns are treated as 0
    (protobuf optional-field default)."""
    present = set(region_loads.columns)
    aggs = [F.count("*").cast("long").alias("n_regions")]
    for src, dst in _SUM_COLS:
        col = F.col(src) if src in present else F.lit(0)
        aggs.append(F.sum(col.cast("long")).alias(dst))
    out = region_loads.groupBy(F.col(server_col).alias("server")).agg(*aggs)
    return out.withColumn(
        "requests", (F.col("read_requests") + F.col("write_requests"))
    )


def last_major_compaction_ts(
    region_loads: DataFrame, *, table_col: str = "table_name"
) -> DataFrame:
    """ClusterStatus.getLastMajorCompactionTsForTable (:290): per table,
    the MIN of its regions' lastMajorCompactionTs (the oldest region
    gates the table's "fully major-compacted as of" time), with the
    reference's Long.MAX_VALUE-means-0 sentinel for tables whose
    regions carry no timestamp. Expects a ``last_major_compaction_ts``
    column (0/NULL = never, the protobuf default)."""
    ts = F.coalesce(F.col("last_major_compaction_ts"), F.lit(0)).cast("long")
    return (
        region_loads.groupBy(F.col(table_col).alias("table_name"))
        .agg(F.min(ts).alias("last_major_compaction_ts"))
    )


def cluster_status(
    region_loads: DataFrame,
    *,
    server_col: str = "server",
    servers: list[str] | None = None,
    dead_servers: tuple[str, ...] = (),
) -> DataFrame:
    """The ClusterStatus view: per-server ServerLoad rows with the
    cluster-level columns appended — ``servers_size`` (:133),
    ``dead_servers`` (:140), ``regions_count`` (:155),
    ``requests_count`` (:168), and ``average_load`` = regions_count /
    servers_size as a double (:147-149).

    ``servers`` optionally names the full live-server set (the
    clusterMap key set, the balancer convention) so servers hosting
    ZERO regions still get a row — region_loads alone cannot know they
    exist. In the reference every reporting server IS in liveServers
    (ClusterStatus:133), so a region_loads server absent from
    ``servers`` is a caller error: it raises rather than silently
    dropping that server's regions from the cluster counts.
    ``dead_servers`` is the reference's separate dead list; dead
    servers contribute a count, never rows."""
    per = server_load(region_loads, server_col=server_col)
    if servers is not None:
        # the validation probe below is eager; cache the per-server
        # rollup for its duration so the probe runs off one
        # materialization (master metadata — one row per server)
        per = per.cache()
        live = sorted(set(servers))
        base = per.sparkSession.createDataFrame(
            [(s,) for s in live], "server string"
        )
        try:
            strays = [
                r.server
                for r in per.join(base, "server", "left_anti")
                            .select("server").take(5)
            ]
        finally:
            # release the cache once the eager probe has run: the
            # returned plan re-derives cheaply (one row per server of
            # master metadata), and leaving it pinned would accumulate
            # cached frames across repeated cluster_status calls
            per.unpersist()
        if strays:
            raise ValueError(
                f"region_loads reports servers not in `servers`: {strays} "
                "— every reporting server must be in the live set"
            )
        per = base.join(per, "server", "left").na.fill(0)
    w = Window.partitionBy()  # per-server frame is master metadata
    return per.select(
        "*",
        F.count("*").over(w).cast("int").alias("servers_size"),
        F.lit(len(dead_servers)).cast("int").alias("dead_servers"),
        F.sum("n_regions").over(w).cast("long").alias("regions_count"),
        F.sum("requests").over(w).cast("long").alias("requests_count"),
        (
            F.sum("n_regions").over(w).cast("double")
            / F.count("*").over(w)
        ).alias("average_load"),
    )
