"""SimpleLoadBalancer: cluster-wide region balance planning.

Reference semantics (SimpleLoadBalancer.java:184 ``balanceCluster``,
hbase-1.3.0; BaseLoadBalancer.java:1138 ``needsBalance``):

- Skip when fewer than 2 servers (BaseLoadBalancer MIN_SERVER_BALANCE)
  or when the cluster is within slop: balanced unless
  ``maxLoad > ceil(avg*(1+slop))`` or ``minLoad < floor(avg*(1-slop))``
  (:1151-1154; avg = numRegions/numServers, slop default 0.2 from
  ``hbase.regions.slop``).
- MIN = floor(avg), MAX = ceil(avg) (:212-213).
- Servers are ordered by (load, server name) — ServerAndLoad.java:48;
  regions within a server and the regions-to-move queue are ordered
  newest-first by regionId (RegionInfoComparator.java / RegionPlan
  .RegionPlanComparator — both compare ``r.id - l.id``).
- Phase 1 (:233-262): walk most-loaded servers; each with load > MAX
  sheds its first (load-MAX) regions (newest first) into the move
  queue; BalanceInfo records nextRegionForUnload = numToOffload.
- Phase 2 (:265-316): underloaded list = servers walked least-loaded
  first while ``maxToTake = numRegions-MIN`` has not hit EXACTLY zero,
  taking servers with load < MIN (or load == 0), each with need
  ``MIN-load`` (or 1 when that is 0). Regions are dealt round-robin,
  one per server per sweep, direction alternating each sweep
  (``incr = -incr``), from the queue head (newest). Unmet need after
  the queue drains is ``neededRegions``.
- Phase 3 (:336-355): if neededRegions > 0, walk most-loaded servers
  grabbing ONE region each at index nextRegionForUnload (0 for
  servers that shed nothing) until enough; the walk BREAKS entirely
  at the first server whose index is out of range.
- Phase 4 (:360-379): walk least-loaded servers; break at the first
  with raw load >= MIN; skip those whose load plus phase-2 receipts
  reaches MIN; others take (MIN - count) regions from the queue.
- Phase 5 (:381-398): remaining queue regions go one per server,
  least-loaded first, breaking at the first with count >= MAX.
  (Phase 4/5 receipts do NOT update BalanceInfo — later counts keep
  using load + phase-2 receipts only, mirrored here.)
- Regions left in the queue with no destination are dropped from the
  returned plan list (the reference's diagnostic-warn path).

DOCUMENTED DIVERGENCE: the reference shuffles the underloaded-server
list with a time-seeded Random (:303) so repeat balancer runs spread
young regions differently. This analog keeps the deterministic
(load, server) order for that list — same invariants (every server
ends within [MIN, MAX] where possible, minimal moves), reproducible
output, oracle-checkable; the randomized-equivalence test model uses
the same canonical order.

Every phase linearizes to window functions over a metadata-scale
DataFrame (servers × regions assignments): the sequential
``maxToTake`` walk is a prefix-sum cutoff, the round-robin deal is a
(sweep, ±rank) slot ordering joined to the queue by row_number, and
the phase-4 fill is interval arithmetic on prefix sums — one pass,
no driver loop, no UDF. All tables plan in one job (partitioned by
table), the per-table balanceCluster(tableName, clusterState) form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "balance_cluster",
    "round_robin_assignment",
    "retain_assignment",
    "immediate_assignment",
    "DEFAULT_SLOP",
    "MIN_SERVER_BALANCE",
]

#: hbase.regions.slop default (BaseLoadBalancer.java:1033)
DEFAULT_SLOP = 0.2
#: BaseLoadBalancer.java MIN_SERVER_BALANCE
MIN_SERVER_BALANCE = 2


def balance_cluster(
    assignments: DataFrame,
    *,
    servers: DataFrame | None = None,
    slop: float = DEFAULT_SLOP,
    table_col: str = "table_name",
    server_col: str = "server",
    region_col: str = "region",
    region_id_col: str = "region_id",
) -> DataFrame:
    """Compute RegionPlans for every table at once.

    ``assignments``: one row per region — (table, hosting server,
    region name, regionId creation stamp). ``servers`` optionally
    lists every live server per table (the clusterMap KEY set — an
    empty server has no assignment rows but still counts toward the
    average and receives regions); when omitted, the server set is
    derived from the assignments (no empty servers). Returns
    (table_name, plan_seq, region, source, dest, phase): phase 2/4/5
    marks which assignment pass placed the region, plan_seq is the
    reference's regionsToReturn order (phase-2 deal order, then queue
    order). Tables already balanced (or under 2 servers) emit no rows.
    """
    a = assignments.select(
        F.col(table_col).alias("table_name"),
        F.col(server_col).alias("server"),
        F.col(region_col).alias("region"),
        F.col(region_id_col).cast("long").alias("region_id"),
    )

    wt = Window.partitionBy("table_name")

    counts = a.groupBy("table_name", "server").agg(
        F.count(F.lit(1)).alias("load")
    )
    if servers is None:
        loads = counts
    else:
        loads = (
            servers.select(
                F.col(table_col).alias("table_name"),
                F.col(server_col).alias("server"),
            )
            .distinct()
            .join(counts, ["table_name", "server"], "left")
            .withColumn("load", F.coalesce(F.col("load"), F.lit(0)))
        )
    srv = loads.select(
        "*",
        F.sum("load").over(wt).alias("num_regions"),
        F.count(F.lit(1)).over(wt).alias("num_servers"),
        F.max("load").over(wt).alias("max_load"),
        F.min("load").over(wt).alias("min_load"),
    ).withColumn(
        "avg", F.col("num_regions") / F.col("num_servers")
    )
    srv = srv.select(
        "*",
        F.floor("avg").alias("min_"),
        F.ceil("avg").alias("max_"),
        (
            (F.col("num_servers") >= MIN_SERVER_BALANCE)
            & (
                (F.col("max_load") > F.ceil(F.col("avg") * (1 + slop)))
                | (F.col("min_load") < F.floor(F.col("avg") * (1 - slop)))
            )
        ).alias("_go"),
    ).where("_go")

    asc = Window.partitionBy("table_name").orderBy(
        F.col("load").asc(), F.col("server").asc()
    )
    srv = srv.select(
        "*",
        F.row_number().over(asc).alias("asc_rank"),
        F.greatest(F.col("load") - F.col("max_"), F.lit(0)).alias("ntu"),
    )
    # descendingMap of the (load, name) TreeMap
    desc = Window.partitionBy("table_name").orderBy(
        F.col("load").desc(), F.col("server").desc()
    )
    srv = srv.withColumn("desc_rank", F.row_number().over(desc))
    srv = srv.localCheckpoint(eager=False)

    regions = a.join(
        srv.select(
            "table_name", "server", "load", "ntu", "min_", "max_",
            "num_regions", "asc_rank", "desc_rank",
        ),
        ["table_name", "server"],
    ).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("table_name", "server").orderBy(
                F.col("region_id").desc(), F.col("region").asc()
            )
        ),
    )

    # ---- phase 1: shed down to MAX ------------------------------------
    shed1 = regions.where(F.col("rn") <= F.col("ntu")).select(
        "table_name", "server", "region", "region_id"
    )

    # ---- phase 2: underloaded list + round-robin deal ------------------
    u = srv.where(
        (F.col("load") < F.col("min_")) | (F.col("load") == 0)
    ).select(
        "table_name", "server", "load", "asc_rank",
        F.when(F.col("min_") - F.col("load") > 0, F.col("min_") - F.col("load"))
        .otherwise(F.lit(1))
        .alias("put"),
        (F.col("num_regions") - F.col("min_")).alias("budget"),
    )
    wu = Window.partitionBy("table_name").orderBy("asc_rank")
    u = u.select(
        "*",
        F.coalesce(
            F.sum("put").over(wu.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("cum_before"),
    )
    # the walk stops at the FIRST server whose remaining budget is
    # exactly zero (maxToTake only breaks on == 0; overshoot continues)
    u = u.select(
        "*",
        F.max(
            F.when(F.col("cum_before") == F.col("budget"), 1).otherwise(0)
        )
        .over(wu.rowsBetween(Window.unboundedPreceding, 0))
        .alias("_stop"),
    ).where(F.col("_stop") == 0)
    u = u.withColumn(
        "i_rank",
        F.row_number().over(Window.partitionBy("table_name").orderBy("asc_rank")),
    )
    u = u.localCheckpoint(eager=False)

    # slots: server s receives one region in each of its first `put`
    # sweeps; sweep order alternates direction over the server list
    slots2 = u.select(
        "table_name", "server", "i_rank",
        F.explode(F.sequence(F.lit(1), F.col("put"))).alias("sweep"),
    ).withColumn(
        "slot_seq",
        F.row_number().over(
            Window.partitionBy("table_name").orderBy(
                F.col("sweep").asc(),
                F.when(F.col("sweep") % 2 == 1, F.col("i_rank"))
                .otherwise(-F.col("i_rank"))
                .asc(),
            )
        ),
    )

    wq = Window.partitionBy("table_name").orderBy(
        F.col("region_id").desc(), F.col("region").asc()
    )
    q1 = shed1.withColumn("q", F.row_number().over(wq))

    deal2 = q1.join(
        slots2.select(
            "table_name",
            F.col("server").alias("dest"),
            F.col("slot_seq").alias("q"),
        ),
        ["table_name", "q"],
        "left",
    )
    assigned2 = deal2.where(F.col("dest").isNotNull()).select(
        "table_name", "region", F.col("server").alias("source"), "dest",
        F.lit(2).alias("phase"), F.col("q").alias("ord"),
    )
    assigned2 = assigned2.localCheckpoint(eager=False)

    # per-table phase-2 bookkeeping
    received = assigned2.groupBy("table_name", F.col("dest").alias("server")).agg(
        F.count(F.lit(1)).alias("added")
    )
    t2 = (
        u.groupBy("table_name")
        .agg(F.sum("put").alias("slots"))
        .join(
            assigned2.groupBy("table_name").agg(
                F.count(F.lit(1)).alias("dealt")
            ),
            "table_name",
            "left",
        )
        .select(
            "table_name",
            (F.col("slots") - F.coalesce(F.col("dealt"), F.lit(0))).alias(
                "needed"
            ),
        )
    )

    # ---- phase 3: one extra region from each most-loaded server --------
    s3 = srv.join(t2, "table_name", "left").withColumn(
        "needed", F.coalesce(F.col("needed"), F.lit(0))
    )
    s3 = s3.withColumn(
        "_cut",
        F.min(F.when(F.col("ntu") >= F.col("load"), F.col("desc_rank"))).over(wt),
    )
    elig3 = s3.where(
        (F.col("needed") > 0)
        & (F.col("desc_rank") < F.coalesce(F.col("_cut"), F.lit(2 ** 31)))
    ).withColumn(
        "rn3",
        F.row_number().over(
            Window.partitionBy("table_name").orderBy("desc_rank")
        ),
    ).where(F.col("rn3") <= F.col("needed"))
    want3 = elig3.select(
        F.col("table_name").alias("_t3"),
        F.col("server").alias("_s3"),
        (F.col("ntu") + 1).alias("_want_rn"),
    )
    shed3 = regions.select(
        "table_name", "server", "region", "region_id", "rn"
    ).join(
        want3,
        (F.col("table_name") == F.col("_t3"))
        & (F.col("server") == F.col("_s3"))
        & (F.col("rn") == F.col("_want_rn")),
    ).select("table_name", "server", "region", "region_id")

    # ---- leftover queue = unconsumed phase-1 shed + phase-3 shed -------
    left1 = deal2.where(F.col("dest").isNull()).select(
        "table_name", "server", "region", "region_id"
    )
    queue = left1.unionByName(shed3).withColumn(
        "pos", F.row_number().over(wq)
    )
    queue = queue.localCheckpoint(eager=False)

    # ---- phase 4: fill least-loaded to MIN ------------------------------
    s45 = srv.join(received, ["table_name", "server"], "left").withColumn(
        "added", F.coalesce(F.col("added"), F.lit(0))
    )
    s45 = s45.withColumn(
        "_cut4",
        F.min(F.when(F.col("load") >= F.col("min_"), F.col("asc_rank"))).over(wt),
    )
    f4 = s45.where(
        (F.col("asc_rank") < F.coalesce(F.col("_cut4"), F.lit(2 ** 31)))
        & (F.col("load") + F.col("added") < F.col("min_"))
    ).select(
        "table_name", "server", "asc_rank",
        (F.col("min_") - F.col("load") - F.col("added")).alias("take4"),
    )
    w4 = Window.partitionBy("table_name").orderBy("asc_rank")
    f4 = f4.select(
        "*",
        F.coalesce(
            F.sum("take4").over(w4.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("lo4"),
    )
    assigned4 = queue.join(
        f4.select(
            "table_name", F.col("server").alias("dest"), "lo4",
            (F.col("lo4") + F.col("take4")).alias("hi4"),
        ),
        ["table_name"],
    ).where(
        (F.col("pos") > F.col("lo4")) & (F.col("pos") <= F.col("hi4"))
    ).select(
        "table_name", "region", F.col("server").alias("source"), "dest",
        F.lit(4).alias("phase"), F.col("pos").alias("ord"),
    )

    total4 = f4.groupBy("table_name").agg(F.sum("take4").alias("t4"))

    # ---- phase 5: one each to least-loaded below MAX --------------------
    s5 = s45.withColumn(
        "_cut5",
        F.min(
            F.when(
                F.col("load") + F.col("added") >= F.col("max_"),
                F.col("asc_rank"),
            )
        ).over(wt),
    )
    f5 = s5.where(
        F.col("asc_rank") < F.coalesce(F.col("_cut5"), F.lit(2 ** 31))
    ).withColumn(
        "rn5",
        F.row_number().over(
            Window.partitionBy("table_name").orderBy("asc_rank")
        ),
    )
    assigned5 = queue.join(
        f5.select(
            "table_name", F.col("server").alias("dest"), "rn5"
        ).join(total4, "table_name", "left").select(
            "table_name", "dest",
            (F.coalesce(F.col("t4"), F.lit(0)) + F.col("rn5")).alias("pos"),
        ),
        ["table_name", "pos"],
    ).select(
        "table_name", "region", F.col("server").alias("source"), "dest",
        F.lit(5).alias("phase"), F.col("pos").alias("ord"),
    )

    plans = assigned2.unionByName(assigned4).unionByName(assigned5)
    return plans.select(
        "table_name",
        F.row_number()
        .over(
            Window.partitionBy("table_name").orderBy(
                F.col("phase").asc(), F.col("ord").asc()
            )
        )
        .alias("plan_seq"),
        "region", "source", "dest", "phase",
    )


# -- Bulk assignment (BaseLoadBalancer.java:1197/:1315/:1377) --------------
#
# The AssignmentManager's three placement calls, re-expressed
# relationally. DOCUMENTED DIVERGENCE (same class as balance_cluster's
# shuffle): every place the reference draws from its time-seeded RANDOM
# (the round-robin start offset :1542, the random server pick :1442)
# this analog uses a deterministic substitute — an explicit
# ``start_index`` parameter and an md5-of-region-name pick — so output
# is reproducible and oracle-checkable while preserving the invariants
# (per-server counts within one, retained regions stay put).


def round_robin_assignment(
    regions: DataFrame,
    servers: DataFrame,
    *,
    start_index: int = 0,
    table_col: str = "table_name",
    region_col: str = "region",
    server_col: str = "server",
) -> DataFrame:
    """roundRobinAssignment (:1533): server slot j (from the start
    offset) takes the regions at list indices ≡ j (mod numServers).
    Regions order by name within table, servers by name — the
    reference's caller passes HRegionInfo order. Returns (table_name,
    region, dest)."""
    srv = servers.select(
        F.col(server_col).alias("dest")
    ).distinct().withColumn(
        "_sidx",
        F.row_number().over(Window.orderBy("dest")) - 1,
    ).withColumn("_n", F.count(F.lit(1)).over(Window.partitionBy()))
    r = regions.select(
        F.col(table_col).alias("table_name"),
        F.col(region_col).alias("region"),
    ).withColumn(
        "_ridx",
        F.row_number().over(
            Window.partitionBy("table_name").orderBy("region")
        ) - 1,
    )
    return r.join(
        F.broadcast(srv),
        (F.col("_ridx") % F.col("_n") + start_index) % F.col("_n")
        == F.col("_sidx"),
    ).select("table_name", "region", "dest")


def _md5_pick(region: Column, n: Column) -> Column:
    """Deterministic stand-in for the reference's random server pick:
    md5(region) mod n (first 8 hex chars, the repo's engine-portable
    hash idiom)."""
    return F.pmod(
        F.conv(F.substring(F.md5(region), 1, 8), 16, 10).cast("long"), n
    )


def retain_assignment(
    old_assignments: DataFrame,
    servers: DataFrame,
    *,
    region_col: str = "region",
    host_col: str = "host",
    port_col: str = "port",
    server_col: str = "server",
) -> DataFrame:
    """retainAssignment (:1377): regions return to their old HOSTNAME
    after a cluster restart (start codes change, so matching is by
    host): exactly one live server on the host takes them; with
    several, the exact old (host, port) wins, else a pick among the
    host's servers; hosts with no live server fall back to a
    cluster-wide pick. ``old_assignments``: (region, host, port) of the
    pre-restart location (host NULL = previously unassigned).
    ``servers``: live (server, host, port). Returns (region, dest,
    disposition 'retained' | 'moved_host' | 'random')."""
    live = servers.select(
        F.col(server_col).alias("dest"),
        F.col(host_col).alias("l_host"),
        F.col(port_col).cast("int").alias("l_port"),
    ).distinct()
    n_all = live.count()
    # rank live servers per host (for the md5 pick) and cluster-wide
    per_host = live.withColumn(
        "_hidx",
        F.row_number().over(
            Window.partitionBy("l_host").orderBy("dest")
        ) - 1,
    ).withColumn(
        "_hn", F.count(F.lit(1)).over(Window.partitionBy("l_host"))
    )
    allsrv = live.withColumn(
        "_aidx", F.row_number().over(Window.orderBy("dest")) - 1
    )

    old = old_assignments.select(
        F.col(region_col).alias("region"),
        F.col(host_col).alias("o_host"),
        F.col(port_col).cast("int").alias("o_port"),
    )
    j = old.join(
        F.broadcast(per_host),
        F.col("o_host") == F.col("l_host"),
        "left",
    )
    # per region: does the exact old (host, port) survive? else pick
    # among the host's servers by md5(region) % count
    per_region = j.groupBy("region", "o_host", "o_port").agg(
        F.count("dest").alias("n_local"),
        F.max(F.when(F.col("l_port") == F.col("o_port"), F.col("dest"))).alias(
            "same_port"
        ),
        F.max(F.col("_hn")).alias("hn"),
    )
    picked_local = per_region.where(F.col("n_local") > 0).join(
        F.broadcast(per_host.select("l_host", "dest", "_hidx")),
        (F.col("o_host") == F.col("l_host"))
        & (F.col("_hidx") == _md5_pick(F.col("region"), F.col("hn"))),
    ).select(
        "region",
        F.coalesce(F.col("same_port"), F.col("dest")).alias("dest"),
        F.when(F.col("same_port").isNotNull(), F.lit("retained"))
        .otherwise(F.lit("moved_host"))
        .alias("disposition"),
    )
    homeless = per_region.where(F.col("n_local") == 0).select("region")
    picked_random = homeless.join(
        F.broadcast(allsrv.select("dest", "_aidx")),
        F.col("_aidx") == _md5_pick(F.col("region"), F.lit(n_all)),
    ).select(
        "region", "dest", F.lit("random").alias("disposition")
    )
    return picked_local.unionByName(picked_random)


def immediate_assignment(
    regions: DataFrame,
    servers: DataFrame,
    *,
    region_col: str = "region",
    server_col: str = "server",
) -> DataFrame:
    """immediateAssignment (:1315): one pick per region (the master's
    stop-gap placement for closed regions with no destination); md5
    pick in place of the reference's random. Returns (region, dest)."""
    srv = servers.select(F.col(server_col).alias("dest")).distinct()
    n = srv.count()
    idx = srv.withColumn(
        "_aidx", F.row_number().over(Window.orderBy("dest")) - 1
    )
    return regions.select(F.col(region_col).alias("region")).join(
        F.broadcast(idx),
        F.col("_aidx") == _md5_pick(F.col("region"), F.lit(n)),
    ).select("region", "dest")
