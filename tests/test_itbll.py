"""IntegrationTestBigLinkedList analog (operators/itbll.py).

Pins the Generator/Verify semantics of the reference's flagship
at-scale correctness harness (hbase-it/src/test/java/org/apache/hadoop/
hbase/test/IntegrationTestBigLinkedList.java): circular prev-pointer
lists, the two-phase first-node persist (:465-491), and the
VerifyReducer classification (:1121-1196) — REFERENCED / UNREFERENCED /
UNDEFINED / EXTRAREFERENCES — against a pure-Python replay.
"""

from __future__ import annotations

import pytest

from tests._prop_budget import ex
from pyspark.sql import functions as F

from hbase_1_3_0_spark.catalog import TableMeta
from hbase_1_3_0_spark.cells import CELL_SCHEMA
from hbase_1_3_0_spark.functions import codecs
from hbase_1_3_0_spark.operators import itbll
from hbase_1_3_0_spark.sources.kv_encoder import table_to_cells
from hbase_1_3_0_spark.table import Table


def _py_chains(keys: list[int], n_lists: int) -> dict[int, int]:
    """Pure-Python Generator replay: key -> prev of the closed circles."""
    prev: dict[int, int] = {}
    for g in range(n_lists):
        members = sorted(k for k in keys if k % n_lists == g)
        for i, k in enumerate(members):
            prev[k] = members[i - 1]  # i=0 wraps to the last member
    return prev


def _py_verify(nodes: dict[int, int | None]) -> dict[int, str]:
    """Pure-Python VerifyReducer replay over (key -> prev) visible nodes."""
    refs: dict[int, int] = {}
    for _k, p in nodes.items():
        if p is not None:
            refs[p] = refs.get(p, 0) + 1
    out: dict[int, str] = {}
    for k in set(nodes) | set(refs):
        defined, nrefs = k in nodes, refs.get(k, 0)
        if defined and nrefs > 0:
            out[k] = itbll.REFERENCED
        elif defined:
            out[k] = itbll.UNREFERENCED
        else:
            out[k] = itbll.UNDEFINED
    return out


def test_generate_chains_closed_circles(spark):
    keys = list(range(1, 41))
    df = spark.createDataFrame([(k,) for k in keys], "c_custkey long")
    got = {
        r.key: (r.list_id, r.prev)
        for r in itbll.generate_chains(df, "c_custkey", n_lists=7).collect()
    }
    model = _py_chains(keys, 7)
    assert {k: p for k, (_g, p) in got.items()} == model
    for k, (g, _p) in got.items():
        assert g == k % 7


def test_verify_full_circle_all_referenced(spark):
    keys = list(range(1, 41))
    df = spark.createDataFrame([(k,) for k in keys], "key long")
    chain = itbll.generate_chains(df, n_lists=5)
    verdicts = itbll.verify_chains(chain)
    got = {r.key: r.status for r in verdicts.collect()}
    assert got == {k: itbll.REFERENCED for k in keys}
    counts = {r.status: r.n for r in itbll.verify_counts(verdicts).collect()}
    assert counts == {itbll.REFERENCED: 40}


def test_verify_with_kills_matches_python_model(spark):
    keys = list(range(1, 101))
    killed = {k for k in keys if k % 9 == 0}
    chain = _py_chains(keys, 11)
    visible = {k: chain[k] for k in keys if k not in killed}
    model = _py_verify(dict(visible))
    df = spark.createDataFrame(
        [(k, p) for k, p in visible.items()], "key long, prev long"
    )
    got = {r.key: r.status for r in itbll.verify_chains(df).collect()}
    assert got == model
    # the harness's pass criterion: zero UNDEFINED == no data loss;
    # here data WAS lost, so UNDEFINED must equal the killed keys that
    # are still referenced by a surviving node
    expected_undefined = {
        k for k in killed if any(p == k for p in visible.values())
    }
    assert {k for k, s in got.items() if s == itbll.UNDEFINED} == (
        expected_undefined
    )


def test_verify_null_prev_emits_no_reference(spark):
    """VerifyMapper.java:1031-1036: an unset prev produces no reference
    — the pointed-to key must not appear via that node."""
    df = spark.createDataFrame(
        [(1, 2), (2, None), (3, 1)], "key long, prev long"
    )
    got = {r.key: (r.status, r.nrefs) for r in itbll.verify_chains(df).collect()}
    assert got == {
        1: (itbll.REFERENCED, 1),
        2: (itbll.REFERENCED, 1),
        3: (itbll.UNREFERENCED, 0),
    }


def test_verify_extra_references_counted(spark):
    """VerifyReducer.java:1184-1191: references beyond the first on a
    defined node roll into EXTRAREFERENCES; an undefined key with many
    referencers still counts ONE UNDEFINED (:1155-1166)."""
    df = spark.createDataFrame(
        [(1, 2), (2, 1), (3, 1), (4, 1), (5, 99), (6, 99)],
        "key long, prev long",
    )
    verdicts = itbll.verify_chains(df)
    got = {r.key: (r.status, r.nrefs) for r in verdicts.collect()}
    assert got[1] == (itbll.REFERENCED, 3)
    assert got[99] == (itbll.UNDEFINED, 2)
    counts = {
        r.status: (r.n, r.extra_references)
        for r in itbll.verify_counts(verdicts).collect()
    }
    assert counts[itbll.REFERENCED] == (2, 2)  # key 1 has 2 extras
    assert counts[itbll.UNDEFINED] == (1, 0)
    assert counts[itbll.UNREFERENCED] == (4, 0)  # keys 3, 4, 5, 6


def test_two_phase_persist_closes_circle_through_read_view(spark):
    """Generator's first-node rewrite (persist :481): phase-1 put with
    the NO_KEY sentinel, phase-2 re-put with the closing prev — the
    read view must return the newer version, so verify sees closed
    circles (all REFERENCED)."""
    keys = list(range(1, 13))
    df = spark.createDataFrame([(k,) for k in keys], "key long")
    chain = itbll.generate_chains(df, n_lists=3)
    first = F.col("prev") >= F.col("key")
    p1 = table_to_cells(
        chain.select(
            "key",
            F.when(first, F.lit(-1).cast("long"))
            .otherwise(F.col("prev")).alias("prev"),
        ),
        ["key"], ["prev"], ts=1_000, seq=0,
    )
    p2 = table_to_cells(
        chain.where(first).select("key", "prev"),
        ["key"], ["prev"], ts=2_000, seq=1,
    )
    t = Table(
        TableMeta(name="itbll_two_phase"),
        spark.createDataFrame([], CELL_SCHEMA),
        now_ms=10_000,
    )
    t = t.put(p1).put(p2)
    nodes = t.scan().select(
        codecs.decode_key_num(F.col("row")).alias("key"),
        codecs.decode_value(F.col("value"), "bigint").alias("prev"),
    ).withColumn("prev", F.when(F.col("prev") >= 0, F.col("prev")))
    got = {r.key: r.status for r in itbll.verify_chains(nodes).collect()}
    assert got == {k: itbll.REFERENCED for k in keys}


def test_loop_multiple_generations_then_verify(spark):
    """The reference's Loop job (IntegrationTestBigLinkedList Loop
    :1430): run the Generator N times — each run lays its own circular
    lists over a DISJOINT key space — then one Verify over the union
    table. Two generations plus kills: verdicts must match the
    pure-Python replay over the combined node set, and each
    generation's chains stay independent (no cross-generation refs)."""
    gen1 = list(range(1, 41))
    gen2 = list(range(1001, 1041))
    chain1 = _py_chains(gen1, 5)
    chain2 = _py_chains(gen2, 5)
    combined = {**chain1, **chain2}
    killed = {9, 18, 1005, 1010}
    visible = {k: v for k, v in combined.items() if k not in killed}
    model = _py_verify(dict(visible))

    df1 = itbll.generate_chains(
        spark.createDataFrame([(k,) for k in gen1], "key long"), n_lists=5
    ).select("key", "prev")
    df2 = itbll.generate_chains(
        spark.createDataFrame([(k,) for k in gen2], "key long"), n_lists=5
    ).select("key", "prev")
    union = df1.unionByName(df2).where(
        ~F.col("key").isin(*sorted(killed))
    )
    got = {r.key: r.status for r in itbll.verify_chains(union).collect()}
    assert got == model
    # generations never reference each other: every UNDEFINED key is a
    # killed key of its own generation
    undef = {k for k, s in got.items() if s == itbll.UNDEFINED}
    assert undef <= killed


# ---------------------------------------------------------------------------
# property: random node subsets (holes anywhere) must match the
# pure-Python VerifyReducer replay — the randomized layer the reference
# drives with its ChaosMonkey-under-Loop runs
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(
    max_examples=ex(12), deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    keys=st.sets(st.integers(min_value=1, max_value=60), min_size=2,
                 max_size=40),
    kill_bits=st.integers(min_value=0, max_value=(1 << 20) - 1),
    n_lists=st.integers(min_value=1, max_value=7),
)
def test_verify_random_chains_and_kills_matches_model(
    spark, keys, kill_bits, n_lists
):
    keys = sorted(keys)
    chain = _py_chains(keys, n_lists)
    killed = {k for i, k in enumerate(keys) if (kill_bits >> (i % 20)) & 1}
    visible = {k: chain[k] for k in keys if k not in killed}
    model = _py_verify(dict(visible))
    if not visible:
        return
    df = spark.createDataFrame(
        [(k, p) for k, p in visible.items()], "key long, prev long"
    )
    got = {r.key: r.status for r in itbll.verify_chains(df).collect()}
    assert got == model
