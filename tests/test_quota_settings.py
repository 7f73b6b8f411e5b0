"""MasterQuotaManager settings CRUD + operation-quota resolution.

Decision tables mirror MasterQuotaManager.java:297 setQuota /
:389 applyThrottle / :462 validateTimedQuota, QuotaSettingsFactory,
QuotaRetriever/QuotaFilter, and the RegionServerQuotaManager.java:85 /
UserQuotaState.java:184 resolution order.
"""

from __future__ import annotations

import pytest

from hbase_1_3_0_spark.operators.quota_settings import (
    MasterQuotaManager,
    QuotaSettings,
    bypass_globals,
    remove_quota,
    resolve_operation_quota,
    throttle_namespace,
    throttle_table,
    throttle_user,
    unthrottle_table,
    unthrottle_user,
)


def _limits(mgr, **kw):
    return {
        (r["user"], r["table"], r["namespace"], r["throttle_type"]):
            r["soft_limit"]
        for r in mgr.list_quotas(**kw)
    }


def test_set_quota_upserts_components():
    m = MasterQuotaManager()
    m.set_quota(throttle_user("bob", "REQUEST_NUMBER", 100, "SECONDS"))
    m.set_quota(throttle_user("bob", "WRITE_SIZE", 2048, "MINUTES"))
    # upsert replaces the same component (applyThrottle setReqNum)
    m.set_quota(throttle_user("bob", "REQUEST_NUMBER", 50, "SECONDS"))
    got = _limits(m)
    assert got == {
        ("bob", None, None, "REQUEST_NUMBER"): 50,
        ("bob", None, None, "WRITE_SIZE"): 2048,
    }


def test_typed_clear_removes_one_component():
    m = MasterQuotaManager()
    m.set_quota(throttle_user("bob", "REQUEST_NUMBER", 100, "SECONDS"))
    m.set_quota(throttle_user("bob", "WRITE_SIZE", 2048, "MINUTES"))
    # typed request with no limit clears only that component (:395 else)
    m.set_quota(QuotaSettings(user="bob", throttle_type="WRITE_SIZE"))
    assert _limits(m) == {("bob", None, None, "REQUEST_NUMBER"): 100}


def test_read_number_clear_quirk_clears_req_num():
    """MasterQuotaManager.java:431-437 — the READ_NUMBER case's
    clear branch calls clearReqNum(), not clearReadNum(). Replicated
    deliberately for 1.3.0 parity."""
    m = MasterQuotaManager()
    m.set_quota(throttle_user("bob", "REQUEST_NUMBER", 100, "SECONDS"))
    m.set_quota(throttle_user("bob", "READ_NUMBER", 10, "SECONDS"))
    m.set_quota(QuotaSettings(user="bob", throttle_type="READ_NUMBER"))
    # READ_NUMBER survives; REQUEST_NUMBER is gone
    assert _limits(m) == {("bob", None, None, "READ_NUMBER"): 10}


def test_unthrottle_clears_all_and_deletes_empty_row():
    m = MasterQuotaManager()
    m.set_quota(throttle_table("t1", "REQUEST_SIZE", 4096, "SECONDS"))
    m.set_quota(throttle_table("t1", "WRITE_NUMBER", 5, "SECONDS"))
    m.set_quota(unthrottle_table("t1"))
    assert m.list_quotas() == []  # delete-if-empty (:316)


def test_remove_all_and_scoped_user_rows():
    m = MasterQuotaManager()
    m.set_quota(throttle_user("bob", "REQUEST_NUMBER", 10, "SECONDS",
                              table="t1"))
    m.set_quota(throttle_user("bob", "REQUEST_NUMBER", 20, "SECONDS",
                              namespace="ns1"))
    m.set_quota(throttle_user("bob", "REQUEST_NUMBER", 30, "SECONDS"))
    assert len(m.list_quotas()) == 3  # three distinct owner scopes
    m.set_quota(remove_quota(user="bob", table="t1"))
    got = _limits(m)
    assert ("bob", "t1", None, "REQUEST_NUMBER") not in got
    assert got[("bob", None, "ns1", "REQUEST_NUMBER")] == 20
    m.set_quota(unthrottle_user("bob"))  # global scope only
    assert ("bob", None, None, "REQUEST_NUMBER") not in _limits(m)
    assert got[("bob", None, "ns1", "REQUEST_NUMBER")] == 20


def test_validate_limit_and_bypass_lifecycle():
    m = MasterQuotaManager()
    with pytest.raises(ValueError, match="greater then 0"):
        m.set_quota(throttle_user("bob", "REQUEST_NUMBER", 0, "SECONDS"))
    m.set_quota(bypass_globals("bob", True))
    assert m.list_quotas()[0]["quota_type"] == "GLOBAL_BYPASS"
    m.set_quota(bypass_globals("bob", False))
    assert m.list_quotas() == []  # clearing bypass empties the row
    with pytest.raises(ValueError, match="user-global"):
        m.set_quota(QuotaSettings(user="bob", table="t1",
                                  quota_type="GLOBAL_BYPASS", bypass=True))


def test_list_quotas_filters():
    m = MasterQuotaManager()
    m.set_quota(throttle_user("alice", "REQUEST_NUMBER", 1, "SECONDS"))
    m.set_quota(throttle_user("bob", "REQUEST_NUMBER", 2, "SECONDS"))
    m.set_quota(throttle_table("orders", "REQUEST_NUMBER", 3, "SECONDS"))
    m.set_quota(throttle_namespace("ns1", "REQUEST_NUMBER", 4, "SECONDS"))
    assert {r["user"] for r in m.list_quotas(user_regex="a.*")} == {"alice"}
    assert [r["table"] for r in m.list_quotas(table_regex="ord.*")] == [
        "orders"
    ]
    assert [r["namespace"] for r in m.list_quotas(namespace_regex="ns1")] == [
        "ns1"
    ]


def test_quota_retriever_filter_reference_decision_table():
    """The EXACT TestQuotaAdmin.java:149 testQuotaRetrieverFilter table:
    scope-implying filters (a bare table/namespace filter matches ONLY
    that scope's rows, never user-owned ones), the MUST_PASS_ONE union
    of table+namespace constraints under a user filter, anchored
    regexes, and the unthrottle teardown counts."""
    m = MasterQuotaManager()
    tables = ["T0", "T01", "NS0:T2"]
    namespaces = ["NS0", "NS01", "NS2"]
    users = ["User0", "User01", "User2"]
    for u in users:
        m.set_quota(throttle_user(u, "REQUEST_NUMBER", 1, "MINUTES"))
        for t in tables:
            m.set_quota(
                throttle_user(u, "REQUEST_NUMBER", 2, "MINUTES", table=t)
            )
        for ns in namespaces:
            m.set_quota(
                throttle_user(u, "REQUEST_NUMBER", 3, "MINUTES",
                              namespace=ns)
            )
    assert len(m.list_quotas()) == 21
    for t in tables:
        m.set_quota(throttle_table(t, "REQUEST_NUMBER", 4, "MINUTES"))
    assert len(m.list_quotas()) == 24
    for ns in namespaces:
        m.set_quota(throttle_namespace(ns, "REQUEST_NUMBER", 5, "MINUTES"))
    assert len(m.list_quotas()) == 27

    def n(**kw):
        return len(m.list_quotas(**kw))

    assert n(user_regex="User0") == 7
    assert n(user_regex="User") == 0  # anchored: no partial match
    assert n(user_regex="User.*") == 21
    assert n(user_regex="User.*", table_regex="T0") == 3
    assert n(user_regex="User.*", table_regex="NS.*") == 3  # 'NS0:T2'
    assert n(user_regex="User.*", table_regex="T") == 0
    assert n(user_regex="User.*", table_regex="T.*") == 6
    assert n(user_regex="User.*", namespace_regex="NS0") == 3
    assert n(user_regex="User.*", namespace_regex="NS") == 0
    assert n(user_regex="User.*", namespace_regex="NS.*") == 9
    # table + namespace under a user filter UNION (MUST_PASS_ONE)
    assert n(user_regex="User.*", table_regex="T0",
             namespace_regex="NS0") == 6
    # bare table/namespace filters match ONLY that scope's rows
    assert n(table_regex="T0") == 1
    assert n(table_regex="T") == 0
    assert n(table_regex="T.*") == 2
    assert n(table_regex=".*T.*") == 3
    assert n(namespace_regex="NS0") == 1
    assert n(namespace_regex="NS") == 0
    assert n(namespace_regex="NS.*") == 3

    for u in users:
        m.set_quota(unthrottle_user(u))
        for t in tables:
            m.set_quota(unthrottle_user(u, table=t))
        for ns in namespaces:
            m.set_quota(unthrottle_user(u, namespace=ns))
    assert len(m.list_quotas()) == 6
    for t in tables:
        m.set_quota(unthrottle_table(t))
    assert len(m.list_quotas()) == 3


def test_persistence_roundtrip(tmp_path):
    p = tmp_path / "quotas.json"
    m = MasterQuotaManager(p)
    m.set_quota(throttle_user("bob", "REQUEST_NUMBER", 9, "SECONDS",
                              table="t1"))
    m.set_quota(bypass_globals("root", True))
    m2 = MasterQuotaManager(p)
    assert m2.list_quotas() == m.list_quotas()


def test_persistence_roundtrip_delimiter_names(tmp_path):
    # names containing '|' (the old key delimiter) must round-trip —
    # keys persist as JSON arrays, not '|'.join
    p = tmp_path / "quotas.json"
    m = MasterQuotaManager(p)
    m.set_quota(throttle_user("a|b", "REQUEST_NUMBER", 5, "SECONDS",
                              table="t|x"))
    m2 = MasterQuotaManager(p)
    assert m2.list_quotas() == m.list_quotas()
    got = m2.list_quotas()
    assert len(got) == 1
    assert got[0]["user"] == "a|b" and got[0]["table"] == "t|x"


def test_persistence_reads_legacy_pipe_keys(tmp_path):
    import json

    p = tmp_path / "quotas.json"
    p.write_text(json.dumps({
        "bob|t1|": {"throttle": {"REQUEST_NUMBER": [9, "SECONDS"]},
                    "bypass_globals": False},
    }))
    m = MasterQuotaManager(p)
    row = m.list_quotas()[0]
    assert row["user"] == "bob" and row["table"] == "t1"
    assert row["soft_limit"] == 9


def test_persistence_reads_legacy_pipe_key_starting_with_bracket(tmp_path):
    # A pre-r10 pipe-joined key whose first segment begins with '[' is
    # NOT JSON — the loader must fall back to the pipe split instead of
    # raising JSONDecodeError (ADVICE r10).
    import json

    p = tmp_path / "quotas.json"
    p.write_text(json.dumps({
        "[admin|t1|": {"throttle": {"REQUEST_NUMBER": [4, "SECONDS"]},
                       "bypass_globals": False},
    }))
    m = MasterQuotaManager(p)
    row = m.list_quotas()[0]
    assert row["user"] == "[admin" and row["table"] == "t1"
    assert row["soft_limit"] == 4


def test_replay_limits_feed():
    from hbase_1_3_0_spark.operators.quota import LIMITER_KINDS

    m = MasterQuotaManager()
    m.set_quota(throttle_user("bob", "REQUEST_NUMBER", 10, "SECONDS"))
    m.set_quota(throttle_table("t1", "WRITE_SIZE", 4096, "MINUTES"))
    m.set_quota(throttle_namespace("ns1", "READ_NUMBER", 7, "HOURS"))
    # scoped user overrides are resolution-time only, not replay feed
    m.set_quota(throttle_user("bob", "REQUEST_NUMBER", 1, "SECONDS",
                              table="t1"))
    got = sorted(m.replay_limits())
    assert got == [
        ("namespace", "ns1", "read_num", 7, 3_600_000),
        ("table", "t1", "write_size", 4096, 60_000),
        ("user", "bob", "req_num", 10, 1_000),
    ]
    assert all(k[2] in LIMITER_KINDS for k in got)


def test_replay_limits_drive_check_quota_replay(spark):
    """Stored settings feed the enforcement replay end-to-end: a user
    REQUEST_NUMBER 2/sec admits two ops in a window and throttles the
    third at scope 'user'."""
    from hbase_1_3_0_spark.operators.quota import check_quota_replay

    m = MasterQuotaManager()
    m.set_quota(throttle_user("bob", "REQUEST_NUMBER", 2, "SECONDS"))
    reqs = spark.createDataFrame(
        [(i, 1000 * 0 + i, "bob", "t1", "default", 1, 0, 0)
         for i in range(3)],
        "req_id long, ts_ms long, user string, table_name string, "
        "namespace string, num_writes int, num_reads int, num_scans int",
    )
    out = {r.req_id: (r.allowed, r.scope)
           for r in check_quota_replay(reqs, m.replay_limits()).collect()}
    assert out[0][0] is True
    assert out[1][0] is True
    assert out[2] == (False, "user")


def test_resolution_precedence(spark):
    """UserQuotaState.getTableLimiter: user+table > user+namespace >
    user-global, scope-level precedence; bypassGlobals drops table/ns
    limiters; noop iff every consulted limiter is bypass."""
    m = MasterQuotaManager()
    m.set_quota(throttle_user("u1", "REQUEST_NUMBER", 10, "SECONDS",
                              table="t_a"))
    m.set_quota(throttle_user("u1", "REQUEST_NUMBER", 20, "SECONDS",
                              namespace="ns0"))
    m.set_quota(throttle_user("u0", "REQUEST_NUMBER", 50, "SECONDS"))
    m.set_quota(throttle_user("u2", "REQUEST_NUMBER", 77, "SECONDS"))
    m.set_quota(bypass_globals("u2", True))
    m.set_quota(throttle_table("t_a", "REQUEST_NUMBER", 100, "SECONDS"))
    m.set_quota(throttle_namespace("ns1", "REQUEST_NUMBER", 500, "SECONDS"))
    # scope-level precedence, not per-component: a WRITE_SIZE-only
    # user+table limiter still wins the whole user limiter slot
    m.set_quota(throttle_user("u0", "WRITE_SIZE", 9, "SECONDS",
                              table="t_b"))

    reqs = spark.createDataFrame(
        [("u1", "t_a", "ns1"), ("u1", "t_b", "ns0"), ("u1", "t_c", "ns1"),
         ("u0", "t_a", "ns1"), ("u0", "t_b", "ns0"), ("u2", "t_a", "ns1"),
         ("u3", "t_a", "ns1"), ("u3", "t_c", "ns9")],
        "user string, table_name string, namespace string",
    )
    out = {
        (r.user, r.table_name): r.asDict()
        for r in resolve_operation_quota(
            reqs, m.settings_df(spark)
        ).collect()
    }
    r = out[("u1", "t_a")]
    assert (r["user_scope"], r["user_req_num"]) == ("table", 10)
    assert (r["table_req_num"], r["ns_req_num"]) == (100, 500)
    r = out[("u1", "t_b")]
    assert (r["user_scope"], r["user_req_num"]) == ("namespace", 20)
    r = out[("u1", "t_c")]
    # u1 has no user-global throttle: the slot falls to the (bypass)
    # global limiter, but t_c's namespace quota keeps the op quota'd
    assert (r["user_scope"], r["user_req_num"]) == ("none", None)
    assert r["ns_req_num"] == 500 and r["noop"] is False
    r = out[("u0", "t_b")]
    # the t_b WRITE_SIZE-only limiter wins the slot; its req_num is NULL
    assert (r["user_scope"], r["user_req_num"]) == ("table", None)
    r = out[("u2", "t_a")]
    assert r["bypass_globals"] is True
    assert (r["user_scope"], r["user_req_num"]) == ("global", 77)
    assert r["table_req_num"] is None and r["ns_req_num"] is None
    r = out[("u3", "t_a")]
    assert r["user_scope"] == "none" and r["noop"] is False  # table+ns apply
    r = out[("u3", "t_c")]
    assert r["user_scope"] == "none" and r["noop"] is True


def test_throttle_type_lifecycle_reference_case():
    """TestQuotaAdmin.java:60 testThrottleType: two typed throttles +
    bypassGlobals = 3 rows; unthrottleUser drops both throttle
    components (bypass row remains); bypassGlobals(false) empties."""
    m = MasterQuotaManager()
    m.set_quota(throttle_user("u", "READ_NUMBER", 6, "MINUTES"))
    m.set_quota(throttle_user("u", "WRITE_NUMBER", 12, "MINUTES"))
    m.set_quota(bypass_globals("u", True))
    rows = m.list_quotas()
    assert len(rows) == 3
    by_limit = {r["soft_limit"]: r for r in rows if r["quota_type"] == "THROTTLE"}
    assert by_limit[6]["throttle_type"] == "READ_NUMBER"
    assert by_limit[12]["throttle_type"] == "WRITE_NUMBER"
    assert all(r["time_unit"] == "MINUTES" for r in by_limit.values())
    assert sum(r["quota_type"] == "GLOBAL_BYPASS" for r in rows) == 1
    m.set_quota(unthrottle_user("u"))
    assert len(m.list_quotas()) == 1
    m.set_quota(bypass_globals("u", False))
    assert m.list_quotas() == []
