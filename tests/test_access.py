"""AccessController grant-model decision tables
(TableAuthManager.java:419-459 authorizeUser supersession order;
TablePermission.java:215-235 implies matching; AccessController.java
:299-345 permissionGranted families-map rule)."""

from __future__ import annotations

import pytest

from hbase_1_3_0_spark.operators import access

GRANT_SCHEMA = (
    "subject string, namespace string, table_name string, family string, "
    "qualifier string, action string"
)
MEMBER_SCHEMA = "user string, group_name string"
REQ_SCHEMA = (
    "req_id long, user string, namespace string, table_name string, "
    "family string, qualifier string, action string"
)
OP_SCHEMA = (
    "op_id long, user string, namespace string, table_name string, "
    "family string, qualifier string, action string"
)


@pytest.fixture()
def world(spark):
    grants = spark.createDataFrame(
        [
            # admin: global READ+WRITE
            ("admin", None, None, None, None, "READ"),
            ("admin", None, None, None, None, "WRITE"),
            # nsuser: namespace-level READ on ns1
            ("nsuser", "ns1", None, None, None, "READ"),
            # tuser: whole-table READ on ns1:t1
            ("tuser", None, "ns1:t1", None, None, "READ"),
            # famuser: family-scoped READ on ns1:t1 d only
            ("famuser", None, "ns1:t1", "d", None, "READ"),
            # quser: qualifier-scoped READ on ns1:t1 d:q1 only
            ("quser", None, "ns1:t1", "d", "q1", "READ"),
            # @ops group: WRITE on ns1:t1
            ("@ops", None, "ns1:t1", None, None, "WRITE"),
        ],
        GRANT_SCHEMA,
    )
    members = spark.createDataFrame(
        [("gwen", "ops"), ("admin", "unrelated")], MEMBER_SCHEMA
    )
    return grants, members


def _verdicts(out):
    return {
        r.req_id: (r.allowed, r.level) for r in out.collect()
    }


def test_authorize_supersession_and_implies(spark, world):
    grants, members = world
    reqs = spark.createDataFrame(
        [
            # global beats everything, any table/ns
            (1, "admin", "ns9", "ns9:tx", None, None, "READ"),
            # namespace grant covers any table in ns1...
            (2, "nsuser", "ns1", "ns1:t2", "d", "q", "READ"),
            # ...but not other namespaces
            (3, "nsuser", "ns2", "ns2:t1", None, None, "READ"),
            # table grant covers family'd and whole-table requests
            (4, "tuser", "ns1", "ns1:t1", None, None, "READ"),
            (5, "tuser", "ns1", "ns1:t1", "d", "q9", "READ"),
            # family-scoped grant does NOT authorize whole-table
            # (TablePermission.implies: grant.family != null and
            # request.family == null -> no match)
            (6, "famuser", "ns1", "ns1:t1", None, None, "READ"),
            (7, "famuser", "ns1", "ns1:t1", "d", "anyq", "READ"),
            (8, "famuser", "ns1", "ns1:t1", "e", None, "READ"),
            # qualifier-scoped: only the named column
            (9, "quser", "ns1", "ns1:t1", "d", "q1", "READ"),
            (10, "quser", "ns1", "ns1:t1", "d", "q2", "READ"),
            (11, "quser", "ns1", "ns1:t1", "d", None, "READ"),
            # group grant via membership; action must match
            (12, "gwen", "ns1", "ns1:t1", None, None, "WRITE"),
            (13, "gwen", "ns1", "ns1:t1", None, None, "READ"),
            # no grants at all
            (14, "nobody", "ns1", "ns1:t1", None, None, "READ"),
        ],
        REQ_SCHEMA,
    )
    got = _verdicts(access.authorize(reqs, grants, members))
    assert got == {
        1: (True, "global"),
        2: (True, "namespace"),
        3: (False, None),
        4: (True, "table"),
        5: (True, "table"),
        6: (False, None),
        7: (True, "table"),
        8: (False, None),
        9: (True, "table"),
        10: (False, None),
        11: (False, None),
        12: (True, "table"),
        13: (False, None),
        14: (False, None),
    }


def test_op_permission_granted_families_map(spark, world):
    grants, members = world
    ops = spark.createDataFrame(
        [
            # op 1: tuser scans families d+e -> table-level short-circuit
            (1, "tuser", "ns1", "ns1:t1", "d", None, "READ"),
            (1, "tuser", "ns1", "ns1:t1", "e", None, "READ"),
            # op 2: famuser touches only d -> family-level pass
            (2, "famuser", "ns1", "ns1:t1", "d", "qa", "READ"),
            (2, "famuser", "ns1", "ns1:t1", "d", "qb", "READ"),
            # op 3: famuser touches d AND e -> e fails, op denied
            # ("all families must pass", AccessController.java:327)
            (3, "famuser", "ns1", "ns1:t1", "d", None, "READ"),
            (3, "famuser", "ns1", "ns1:t1", "e", None, "READ"),
            # op 4: quser touches only d:q1 -> qualifier fallback allows
            (4, "quser", "ns1", "ns1:t1", "d", "q1", "READ"),
            # op 5: quser touches d:q1 + d:q2 -> q2 fails the fallback
            (5, "quser", "ns1", "ns1:t1", "d", "q1", "READ"),
            (5, "quser", "ns1", "ns1:t1", "d", "q2", "READ"),
            # op 6: quser touches whole family d (no qualifier list) ->
            # no family grant, no qualifiers to fall back on -> denied
            (6, "quser", "ns1", "ns1:t1", "d", None, "READ"),
        ],
        OP_SCHEMA,
    )
    got = {
        r.op_id: (r.allowed, r.reason)
        for r in access.op_permission_granted(ops, grants, members).collect()
    }
    assert got == {
        1: (True, "table"),
        2: (True, "families"),
        3: (False, None),
        4: (True, "families"),
        5: (False, None),
        6: (False, None),
    }
