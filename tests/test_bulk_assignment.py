"""Bulk assignment trio (BaseLoadBalancer.java:1197 roundRobin, :1377
retain, :1315 immediate) — decision tables + invariants. Random draws
are replaced by deterministic substitutes (explicit start_index; md5
pick), documented in operators/balancer.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from hbase_1_3_0_spark.operators.balancer import (
    immediate_assignment,
    retain_assignment,
    round_robin_assignment,
)


def _regions(spark, names, table="t"):
    return spark.createDataFrame(
        [(table, r) for r in names], "table_name string, region string"
    )


def _servers(spark, names):
    return spark.createDataFrame([(s,) for s in names], "server string")


def test_round_robin_stride(spark):
    regions = _regions(spark, [f"r{i:02d}" for i in range(10)])
    servers = _servers(spark, ["s0", "s1", "s2"])
    got = {
        r.region: r.dest
        for r in round_robin_assignment(regions, servers).collect()
    }
    # server slot j takes regions at indices ≡ j (mod 3)
    for i in range(10):
        assert got[f"r{i:02d}"] == f"s{i % 3}"
    # per-server counts within ceil/floor
    counts = {}
    for d in got.values():
        counts[d] = counts.get(d, 0) + 1
    assert sorted(counts.values()) == [3, 3, 4]


def test_round_robin_start_offset(spark):
    regions = _regions(spark, [f"r{i}" for i in range(6)])
    servers = _servers(spark, ["s0", "s1", "s2"])
    got = {
        r.region: r.dest
        for r in round_robin_assignment(
            regions, servers, start_index=2
        ).collect()
    }
    # region index 0 lands on slot (0+2)%3 = s2 (the rotated start)
    assert got["r0"] == "s2" and got["r1"] == "s0" and got["r2"] == "s1"


def test_round_robin_per_table(spark):
    regions = _regions(spark, ["a", "b", "c"], table="t1").unionByName(
        _regions(spark, ["a", "b", "c"], table="t2")
    )
    servers = _servers(spark, ["s0", "s1"])
    rows = round_robin_assignment(regions, servers).collect()
    per_table = {}
    for r in rows:
        per_table.setdefault(r.table_name, {})[r.region] = r.dest
    # each table deals independently from index 0
    assert per_table["t1"] == per_table["t2"]


def _live(spark, rows):
    return spark.createDataFrame(rows, "server string, host string, port int")


def test_retain_assignment_decision_table(spark):
    # live cluster after restart: h1 has one server (new start code),
    # h2 has two (ports 22 and 23), h3 vanished
    live = _live(spark, [
        ("h1,22,999", "h1", 22),
        ("h2,22,999", "h2", 22),
        ("h2,23,999", "h2", 23),
        ("h4,22,999", "h4", 22),
    ])
    old = spark.createDataFrame(
        [
            ("r_single", "h1", 22),     # one live server, same port -> it
            ("r_single2", "h1", 30),    # one live server, new port -> it
            ("r_sameport", "h2", 23),   # port survives -> that server
            ("r_newport", "h2", 77),    # host lives, port gone -> pick
            ("r_gone", "h3", 22),       # host gone -> cluster-wide pick
            ("r_unassigned", None, None),  # never assigned -> pick
        ],
        "region string, host string, port int",
    )
    got = {
        r.region: (r.dest, r.disposition)
        for r in retain_assignment(old, live).collect()
    }
    assert got["r_single"] == ("h1,22,999", "retained")
    assert got["r_single2"] == ("h1,22,999", "moved_host")
    assert got["r_sameport"] == ("h2,23,999", "retained")
    assert got["r_newport"][0] in ("h2,22,999", "h2,23,999")
    assert got["r_newport"][1] == "moved_host"
    assert got["r_gone"][1] == "random"
    assert got["r_unassigned"][1] == "random"
    # every region assigned exactly once
    assert len(got) == 6


def test_retain_assignment_is_deterministic(spark):
    live = _live(spark, [(f"h{i},22,1", f"h{i}", 22) for i in range(5)])
    old = spark.createDataFrame(
        [(f"r{i}", None, None) for i in range(40)],
        "region string, host string, port int",
    )
    a = {r.region: r.dest for r in retain_assignment(old, live).collect()}
    b = {r.region: r.dest for r in retain_assignment(old, live).collect()}
    assert a == b
    # the md5 pick spreads across servers
    assert len(set(a.values())) > 1


def test_immediate_assignment(spark):
    regions = spark.createDataFrame(
        [(f"r{i}",) for i in range(30)], "region string"
    )
    servers = _servers(spark, ["s0", "s1", "s2"])
    got = {r.region: r.dest for r in immediate_assignment(
        regions, servers).collect()}
    assert len(got) == 30
    assert set(got.values()) <= {"s0", "s1", "s2"}
    assert len(set(got.values())) == 3  # spread
