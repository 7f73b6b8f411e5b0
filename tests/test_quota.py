"""RateLimiter replay + aligned-window throttle decision tables.

The pinned cases mirror the reference's own
TestRateLimiter.java:113-146 (fixed-interval overconsumption and
resource availability) and :90-109 (average-interval pro-rating),
re-expressed as request timelines since the replay admits-then-consumes
(checkQuota-then-grab, DefaultOperationQuota.java:59) rather than
consuming blind.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from hbase_1_3_0_spark.operators import quota
from hbase_1_3_0_spark.operators.quota import (
    _walk_average,
    _walk_fixed,
    replay_rate_limiter,
    throttle_fixed_window,
)


# ---- pure-walk decision tables (the reference's semantics) -------------


def test_fixed_burst_and_refill():
    # limit 10/sec: 11 at t=0 -> 10 allowed, 11th waits to the refill
    rows = [(0, 1)] * 11 + [(1000, 1), (1500, 1)]
    got = _walk_fixed(rows, 10, 1000)
    assert [g[0] for g in got[:10]] == [True] * 10
    assert got[10] == (False, 0, 1000)  # nextRefill=1000, now=0
    # t=1000 refills the full limit (anchor moves to 2000)
    assert got[11] == (True, 9, 0)
    # t=1500 is inside the 1000->2000 epoch: no refill, still avail
    assert got[12] == (True, 8, 0)


def test_fixed_epoch_anchored_at_first_request():
    # first request at t=700 anchors the epoch at 1700, NOT at 1000
    rows = [(700, 1)] * 10 + [(1200, 1), (1700, 1)]
    got = _walk_fixed(rows, 10, 1000)
    assert all(g[0] for g in got[:10])
    assert got[10] == (False, 0, 500)  # 1700 - 1200
    assert got[11][0] is True  # refill fires exactly at the anchor


def test_fixed_resource_availability():
    # TestRateLimiter.java:137: consume 3 of 10, then 10 must wait for
    # the next epoch
    rows = [(0, 3), (1, 10), (1000, 10)]
    got = _walk_fixed(rows, 10, 1000)
    assert got[0] == (True, 7, 0)
    assert got[1] == (False, 7, 999)
    assert got[2] == (True, 0, 0)


def test_average_pro_rated_refill():
    # limit 10/sec: drain at t=0; +100ms pro-rates exactly 1 unit
    # (TestRateLimiter.java:90 overconsumption arithmetic: 100ms/unit)
    rows = [(0, 10), (100, 1), (150, 1), (300, 2)]
    got = _walk_average(rows, 10, 1000)
    assert got[0] == (True, 0, 0)
    assert got[1] == (True, 0, 0)  # floor(100/1000*10)=1, consumed
    # 50ms later: floor(.5)=0 refilled, wait = (1-0)*1000/10 = 100
    assert got[2] == (False, 0, 100)
    # elapsed 200ms from the last refill anchor (t=100): 2 units
    assert got[3] == (True, 0, 0)


def test_average_full_refill_after_unit():
    rows = [(0, 10), (1100, 10)]
    got = _walk_average(rows, 10, 1000)
    assert got == [(True, 0, 0), (True, 0, 0)]


# ---- Spark replay == the walk, per key ---------------------------------


def test_replay_matches_walk_random(spark):
    rng = random.Random(88)
    reqs, expected = [], {}
    rid = 0
    for key in ["u0", "u1", "u2", "u3"]:
        t, rows = 0, []
        for _ in range(60):
            t += rng.randint(0, 700)
            rows.append((t, rng.randint(1, 4)))
        for ts, amt in rows:
            rid += 1
            reqs.append((rid, key, ts, amt))
        expected[key] = rows
    df = spark.createDataFrame(
        reqs, "req_id long, key string, ts_ms long, amount long"
    )
    for policy, walk in [("fixed", _walk_fixed), ("average", _walk_average)]:
        got = replay_rate_limiter(
            df, limit=8, tunit_ms=1000, policy=policy
        ).collect()
        by_key: dict = {}
        for r in sorted(got, key=lambda r: (r.key, r.ts_ms, r.req_id)):
            by_key.setdefault(r.key, []).append(
                (r.allowed, r.avail_after, r.wait_ms)
            )
        for key, rows in expected.items():
            assert by_key[key] == walk(rows, 8, 1000), (policy, key)


def test_replay_unknown_policy(spark):
    df = spark.createDataFrame(
        [(1, "k", 0, 1)], "req_id long, key string, ts_ms long, amount long"
    )
    with pytest.raises(ValueError):
        replay_rate_limiter(df, limit=1, tunit_ms=1000, policy="nope")


# ---- aligned-window batch admission -------------------------------------


def _win_requests(spark):
    rows = []
    rid = 0
    for key, n, base in [("a", 7, 0), ("b", 3, 10)]:
        for i in range(n):
            rid += 1
            rows.append(
                (rid, key, f"2024-01-01 00:00:{base + i:02d}.500")
            )
    return spark.createDataFrame(
        rows, "req_id long, key string, ts string"
    ).select("req_id", "key", F.col("ts").cast("timestamp_ntz").alias("ts"))


def test_window_throttle_limit_and_wait(spark):
    df = _win_requests(spark)
    got = {
        r.req_id: r
        for r in throttle_fixed_window(
            df, limit=5, window="1 minute"
        ).collect()
    }
    # key a: 7 requests in one minute -> first 5 allowed
    assert [got[i].allowed for i in range(1, 8)] == [True] * 5 + [False] * 2
    # wait_s: request 6 at 00:00:05.5 -> 54s to the next minute
    assert got[6].wait_s == 54
    assert got[7].wait_s == 53
    assert all(got[i].wait_s == 0 for i in range(1, 6))
    # key b untouched by key a's budget
    assert all(got[i].allowed for i in range(8, 11))


def test_window_throttle_agrees_with_replay_on_boundary_traffic(spark):
    # when every epoch starts with a request AT the aligned boundary,
    # the reference's request-anchored refill IS the aligned window:
    # both paths must produce identical verdicts
    rows = []
    rid = 0
    for minute in range(3):
        for i in range(4):  # 4 requests per minute, limit 3
            rid += 1
            rows.append((rid, "k", minute * 60_000 + i * 1000))
    df_ms = spark.createDataFrame(
        rows, "req_id long, key string, ts_ms long"
    )
    rep = replay_rate_limiter(
        df_ms.withColumn("amount", F.lit(1)),
        limit=3, tunit_ms=60_000, policy="fixed",
    ).collect()
    win = throttle_fixed_window(
        df_ms.select(
            "req_id", "key",
            F.timestamp_millis(F.col("ts_ms"))
            .cast("timestamp_ntz").alias("ts"),
        ),
        limit=3, window="1 minute",
    ).collect()
    rv = {r.req_id: r.allowed for r in rep}
    wv = {r.req_id: r.allowed for r in win}
    assert rv == wv
    assert sorted(rv.values()).count(False) == 3  # one throttled per minute


# ---- composed DefaultOperationQuota replay -------------------------------


def _reqs(spark, rows):
    return spark.createDataFrame(
        rows,
        "req_id long, ts_ms long, user string, table_name string, "
        "namespace string, num_writes int, num_reads int, num_scans int",
    )


def test_composed_matches_single_scope_replay(spark):
    # ONLY a per-user req_num limiter configured: the composed replay
    # must equal replay_rate_limiter with amount=1 per request
    rows, rid = [], 0
    rng = random.Random(5)
    for user in ["u0", "u1"]:
        t = 0
        for _ in range(40):
            t += rng.randint(0, 600)
            rid += 1
            rows.append((rid, t, user, "t1", "ns1", 1, 0, 0))
    df = _reqs(spark, rows)
    limits = [("user", u, "req_num", 5, 1000) for u in ["u0", "u1"]]
    composed = {
        r.req_id: r.allowed
        for r in quota.check_quota_replay(df, limits).collect()
    }
    single = {
        r.req_id: r.allowed
        for r in replay_rate_limiter(
            df.select(
                "req_id", F.col("user").alias("key"), "ts_ms",
                F.lit(1).alias("amount"),
            ),
            limit=5, tunit_ms=1000, policy="fixed",
        ).collect()
    }
    assert composed == single


def test_composed_scopes_and_no_consume_on_deny(spark):
    # user u0: 100 write-bytes/sec (= 1 mutation/sec at the 100-byte
    # estimate); table t1: 3 reqs/sec shared across users
    limits = [
        ("user", "u0", "write_size", 100, 1000),
        ("table", "t1", "req_num", 3, 1000),
    ]
    rows = [
        # t=0: u0 writes once (user write budget gone, table 1/3)
        (1, 0, "u0", "t1", "ns", 1, 0, 0),
        # u0 second write -> denied at USER scope
        (2, 0, "u0", "t1", "ns", 1, 0, 0),
        # u1 reads twice: table now 3/3 (denied req did NOT consume)
        (3, 0, "u1", "t1", "ns", 0, 1, 0),
        (4, 0, "u1", "t1", "ns", 0, 1, 0),
        # u1 third read -> denied at TABLE scope
        (5, 0, "u1", "t1", "ns", 0, 1, 0),
        # other table unaffected
        (6, 0, "u1", "t2", "ns", 0, 1, 0),
        # next second: user budget refills
        (7, 1000, "u0", "t1", "ns", 1, 0, 0),
    ]
    got = {
        r.req_id: (r.allowed, r.scope, r.reason)
        for r in quota.check_quota_replay(_reqs(spark, rows), limits).collect()
    }
    assert got[1] == (True, None, None)
    assert got[2] == (False, "user", "write_size")
    assert got[3] == (True, None, None)
    assert got[4] == (True, None, None)
    assert got[5] == (False, "table", "req_num")
    assert got[6] == (True, None, None)
    assert got[7] == (True, None, None)


def test_composed_scan_estimate_and_namespace(spark):
    # namespace read_size 1000 bytes/sec: one scan (=1000) fits, a scan
    # plus a get (1100) does not
    limits = [("namespace", "ns", "read_size", 1000, 1000)]
    rows = [
        (1, 0, "u", "t", "ns", 0, 0, 1),     # 1000 read-bytes: exact fit
        (2, 10, "u", "t", "ns", 0, 1, 0),    # +100 -> denied
        (3, 1000, "u", "t", "ns", 0, 1, 1),  # 1100 > limit even fresh
        (4, 2000, "u", "t", "ns", 0, 0, 1),  # fits again after refill
    ]
    got = {
        r.req_id: (r.allowed, r.reason, r.wait_ms)
        for r in quota.check_quota_replay(_reqs(spark, rows), limits).collect()
    }
    assert got[1] == (True, None, 0)
    assert got[2][0] is False and got[2][1] == "read_size"
    # 1100 can NEVER fit a 1000 limit: still denied right after refill
    assert got[3][0] is False
    assert got[4] == (True, None, 0)


def test_composed_unknown_config(spark):
    df = _reqs(spark, [(1, 0, "u", "t", "ns", 1, 0, 0)])
    with pytest.raises(ValueError):
        quota.check_quota_replay(df, [("user", "u", "nope", 1, 1000)])
    with pytest.raises(ValueError):
        quota.check_quota_replay(df, [("galaxy", "u", "req_num", 1, 1000)])


def test_close_adjustment_overdraw_and_refund(spark):
    # user write_size 300 bytes/sec; estimates are 100/mutation
    limits = [("user", "u", "write_size", 300, 1000)]
    rows = [
        # estimated 100 but actually moved 300: budget drains fully
        (1, 0, "u", "t", "ns", 1, 0, 0, 300, 0),
        # the overdraw is visible: the next estimated-100 write denies
        (2, 10, "u", "t", "ns", 1, 0, 0, 100, 0),
        # next second: estimated 100, actually 10 -> 90 refunded
        (3, 1000, "u", "t", "ns", 1, 0, 0, 10, 0),
        (4, 1010, "u", "t", "ns", 1, 0, 0, 100, 0),
        (5, 1020, "u", "t", "ns", 1, 0, 0, 100, 0),
        # 290 actually consumed of 300: one more 100-estimate still fits?
        # avail = 300 - 10 - 100 - 100 = 90 < 100 -> denied
        (6, 1030, "u", "t", "ns", 1, 0, 0, 100, 0),
    ]
    df = spark.createDataFrame(
        rows,
        "req_id long, ts_ms long, user string, table_name string, "
        "namespace string, num_writes int, num_reads int, num_scans int, "
        "actual_write_bytes long, actual_read_bytes long",
    )
    got = {
        r.req_id: r.allowed
        for r in quota.check_quota_replay(
            df, limits, track_actual_sizes=True
        ).collect()
    }
    assert got == {1: True, 2: False, 3: True, 4: True, 5: True, 6: False}
    # WITHOUT tracking, request 2 would also deny (estimate consumed
    # 100 of 300 -> 200 left >= 100 allowed!) — show the contrast
    got2 = {
        r.req_id: r.allowed
        for r in quota.check_quota_replay(
            df.drop("actual_write_bytes", "actual_read_bytes"), limits
        ).collect()
    }
    assert got2[2] is True  # estimate-only: 200 bytes still available


def test_settings_change_preserves_consumed_quota(spark):
    """TestQuotaState.java:85-110 testQuotaStateUpdateGlobalThrottle as
    a replay: a user consumes 3 of a 3/min quota; the quota grows to
    11/min mid-stream — RateLimiter.update credits the DIFFERENCE, so
    exactly 8 more admit in the same window; then the quota is removed
    and everything admits (bypass)."""
    from hbase_1_3_0_spark.operators import quota

    reqs = spark.createDataFrame(
        # 3 requests under the old quota, then 10 after the update at
        # t=5000, then 5 after the removal at t=20000 (same tunit win)
        [(i, 100 + i, "u", "t", "default", 1, 0, 0) for i in range(3)]
        + [(10 + i, 6000 + i, "u", "t", "default", 1, 0, 0)
           for i in range(10)]
        + [(30 + i, 21000 + i, "u", "t", "default", 1, 0, 0)
           for i in range(5)],
        "req_id long, ts_ms long, user string, table_name string, "
        "namespace string, num_writes int, num_reads int, num_scans int",
    )
    got = {
        r.req_id: r.allowed
        for r in quota.check_quota_replay(
            reqs,
            [("user", "u", "req_num", 3, 60_000)],
            settings_changes=[
                (5_000, "user", "u", {"req_num": (11, 60_000)}),
                (20_000, "user", "u", None),
            ],
        ).collect()
    }
    assert all(got[i] for i in range(3))          # 3 admitted
    admitted_after_grow = [got[10 + i] for i in range(10)]
    assert admitted_after_grow == [True] * 8 + [False] * 2  # +8, not 11
    assert all(got[30 + i] for i in range(5))     # removed -> bypass


def test_settings_change_update_remove_add_tables(spark):
    """TestQuotaState.java:140-177 testQuotaStateUpdateTableThrottle
    shape: table A's quota grows (difference credited), table B's is
    removed (opens to bypass), table C's appears mid-stream (enforced
    from its change on)."""
    from hbase_1_3_0_spark.operators import quota

    def burst(base_id, ts, table, n):
        return [(base_id + i, ts + i, "u", table, "default", 1, 0, 0)
                for i in range(n)]

    reqs = spark.createDataFrame(
        burst(0, 100, "A", 1)            # consume 1 of A's 1/min
        + burst(10, 6000, "A", 3)        # after A grows 1->3: +2 admit
        + burst(20, 6100, "B", 3)        # after B removed: all admit
        + burst(30, 6200, "C", 3),       # after C added at 2/min: 2 admit
        "req_id long, ts_ms long, user string, table_name string, "
        "namespace string, num_writes int, num_reads int, num_scans int",
    )
    limits = [
        ("table", "A", "req_num", 1, 60_000),
        ("table", "B", "req_num", 1, 60_000),
    ]
    ch = [
        (5_000, "table", "A", {"req_num": (3, 60_000)}),
        (5_000, "table", "B", None),
        (5_000, "table", "C", {"req_num": (2, 60_000)}),
    ]
    got = {
        r.req_id: r.allowed
        for r in quota.check_quota_replay(
            reqs, limits, settings_changes=ch
        ).collect()
    }
    assert got[0] is True
    assert [got[10 + i] for i in range(3)] == [True, True, False]
    assert [got[20 + i] for i in range(3)] == [True, True, True]
    assert [got[30 + i] for i in range(3)] == [True, True, False]
