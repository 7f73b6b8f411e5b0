"""SimpleLoadBalancer planning vs a direct Java-loop transliteration.

The pure-Python model below IS the reference walk
(SimpleLoadBalancer.java:184 balanceCluster + BaseLoadBalancer.java:1138
needsBalance): sequential phases 1-5 with the MinMaxPriorityQueue and
BalanceInfo bookkeeping. The one divergence both sides share: the
underloaded-server list keeps its deterministic (load, name) order
instead of the reference's time-seeded shuffle (documented in
operators/balancer.py). Randomized clusters prove the Spark
linearization agrees phase by phase.
"""

from __future__ import annotations

import math
import random

from hbase_1_3_0_spark.operators.balancer import balance_cluster


def _java_walk(cluster: dict, slop: float = 0.2) -> list[tuple]:
    """SimpleLoadBalancer.java:184-426, line for line (shuffle pinned).

    ``cluster``: server -> list of (region, region_id).
    Returns [(region, source, dest, phase), ...] in plan order.
    """
    num_servers = len(cluster)
    if num_servers < 2:
        return []
    loads = {s: len(v) for s, v in cluster.items()}
    num_regions = sum(loads.values())
    avg = num_regions / num_servers
    ceiling = math.ceil(avg * (1 + slop))
    floor_ = math.floor(avg * (1 - slop))
    if not (max(loads.values()) > ceiling or min(loads.values()) < floor_):
        return []
    mx, mn = math.ceil(avg), math.floor(avg)

    by_load = sorted(cluster, key=lambda s: (loads[s], s))
    by_load_desc = list(reversed(by_load))
    # newest first within a server (RegionInfoComparator)
    regs = {
        s: sorted(v, key=lambda r: (-r[1], r[0])) for s, v in cluster.items()
    }

    queue: list[tuple] = []  # (region, region_id, source)

    def pop_newest():
        queue.sort(key=lambda e: (-e[1], e[0]))
        return queue.pop(0)

    plans = []
    bal: dict = {}  # server -> [nextRegionForUnload, numRegionsAdded]

    # phase 1: shed most-loaded down to MAX
    for s in by_load_desc:
        if loads[s] <= mx:
            bal[s] = [0, 0]
            break
        num_off = min(loads[s] - mx, loads[s])
        for r, rid in regs[s][:num_off]:
            queue.append((r, rid, s))
        bal[s] = [num_off, -num_off]

    # phase 2: underloaded list + alternating round-robin deal
    budget = num_regions - mn
    order2, under = [], {}
    for s in by_load:
        if budget == 0:
            break
        if loads[s] >= mn and loads[s] > 0:
            continue
        put = mn - loads[s]
        if put == 0:
            put = 1
        budget -= put
        order2.append(s)
        under[s] = put
    incr = 1
    while queue:
        cnt = 0
        i = 0 if incr > 0 else len(order2) - 1
        while 0 <= i < len(order2):
            if not queue:
                break
            s = order2[i]
            if under[s] != 0:
                r, rid, src = pop_newest()
                plans.append((r, src, s, 2))
                under[s] -= 1
                cnt += 1
                bal.setdefault(s, [0, 0])[1] += 1
            i += incr
        if cnt == 0:
            break
        incr = -incr
    needed = sum(under.values())
    if needed == 0 and not queue:
        return plans

    # phase 3: one more from each most-loaded until enough
    if needed != 0:
        for s in by_load_desc:
            idx = bal[s][0] if s in bal else 0
            if idx >= loads[s]:
                break
            r, rid = regs[s][idx]
            queue.append((r, rid, s))
            needed -= 1
            if needed == 0:
                break

    # phase 4: fill least-loaded to MIN
    for s in by_load:
        rc = loads[s]
        if rc >= mn:
            break
        if s in bal:
            rc += bal[s][1]
        if rc >= mn:
            continue
        taken = 0
        while taken < mn - rc and queue:
            r, rid, src = pop_newest()
            plans.append((r, src, s, 4))
            taken += 1

    # phase 5: leftovers, one per server below MAX
    if queue:
        for s in by_load:
            rc = loads[s]
            if s in bal:
                rc += bal[s][1]
            if rc >= mx:
                break
            r, rid, src = pop_newest()
            plans.append((r, src, s, 5))
            if not queue:
                break
    return plans


def _spark_plans(spark, clusters: dict, **kw) -> dict:
    rows = [
        (t, s, r, rid)
        for t, cluster in clusters.items()
        for s, v in cluster.items()
        for r, rid in v
    ]
    df = spark.createDataFrame(
        rows, "table_name string, server string, region string, region_id long"
    )
    srv = spark.createDataFrame(
        [(t, s) for t, cluster in clusters.items() for s in cluster],
        "table_name string, server string",
    )
    out: dict = {t: [] for t in clusters}
    got = balance_cluster(df, servers=srv, **kw).collect()
    for r in sorted(got, key=lambda r: (r.table_name, r.plan_seq)):
        out[r.table_name].append((r.region, r.source, r.dest, r.phase))
    return out


def test_matches_java_walk_on_random_clusters(spark):
    rng = random.Random(4242)
    clusters = {}
    for t in range(30):
        n_servers = rng.randint(1, 9)
        cluster = {}
        rid_base = rng.randint(0, 1000)
        ids = list(range(rid_base, rid_base + 200))
        rng.shuffle(ids)
        it = iter(ids)
        for i in range(n_servers):
            n = rng.randint(0, 14)
            cluster[f"s{i:02d}"] = [
                (lambda x: (f"r{x:05d}", x))(next(it)) for _ in range(n)
            ]
        clusters[f"t{t:02d}"] = cluster
    got = _spark_plans(spark, clusters)
    for t, cluster in clusters.items():
        assert got[t] == _java_walk(cluster), f"mismatch for {t}"


def test_balanced_cluster_no_plans(spark):
    cluster = {
        "s0": [("r1", 1), ("r2", 2)],
        "s1": [("r3", 3), ("r4", 4)],
    }
    assert _spark_plans(spark, {"t": cluster})["t"] == []
    assert _java_walk(cluster) == []


def test_single_server_skipped(spark):
    cluster = {"s0": [(f"r{i}", i) for i in range(10)]}
    assert _spark_plans(spark, {"t": cluster})["t"] == []


def test_sheds_newest_regions_first(spark):
    # s0 overloaded: sheds its two NEWEST (largest region_id) regions
    cluster = {
        "s0": [("r1", 1), ("r2", 2), ("r3", 3), ("r4", 4), ("r5", 5),
               ("r6", 6)],
        "s1": [],
        "s2": [],
    }
    plans = _spark_plans(spark, {"t": cluster})["t"]
    assert plans == _java_walk(cluster)
    shed = {p[0] for p in plans}
    assert "r6" in shed and "r5" in shed  # newest moved
    # every server ends within [MIN, MAX] = [2, 2]
    end = {s: len(v) for s, v in cluster.items()}
    for r, src, dst, _ in plans:
        end[src] -= 1
        end[dst] += 1
    assert all(v == 2 for v in end.values())


def test_phase3_and_4_when_deal_falls_short(spark):
    # loads 7,3,2,0,0 -> avg 2.4, MIN 2, MAX 3: shed 4+0, needs 2+2+1(=0
    # -> put 1 each)... exercises the second pass
    cluster = {
        "s0": [(f"a{i}", 100 + i) for i in range(7)],
        "s1": [(f"b{i}", 200 + i) for i in range(3)],
        "s2": [(f"c{i}", 300 + i) for i in range(2)],
        "s3": [],
        "s4": [],
    }
    plans = _spark_plans(spark, {"t": cluster})["t"]
    model = _java_walk(cluster)
    assert plans == model
    phases = {p[3] for p in plans}
    assert 2 in phases


def test_empty_server_gets_one_when_min_zero(spark):
    # 3 servers, 2 regions: avg .67 -> MIN 0, MAX 1; empty servers are
    # eligible with put=1 (the load==0 / regionsToPut==0 -> 1 branch)
    cluster = {
        "s0": [("r1", 1), ("r2", 2)],
        "s1": [],
        "s2": [],
    }
    plans = _spark_plans(spark, {"t": cluster})["t"]
    assert plans == _java_walk(cluster)


def test_multi_table_one_pass(spark):
    rng = random.Random(7)
    clusters = {}
    for t in range(4):
        cluster = {}
        ids = list(range(1, 61))
        rng.shuffle(ids)
        it = iter(ids)
        for i in range(4):
            cluster[f"s{i}"] = [
                (lambda x: (f"r{x:03d}", x))(next(it))
                for _ in range(rng.randint(0, 12))
            ]
        clusters[f"t{t}"] = cluster
    got = _spark_plans(spark, clusters)
    for t, cluster in clusters.items():
        assert got[t] == _java_walk(cluster), t
