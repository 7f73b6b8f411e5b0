"""SimpleRegionNormalizer planning vs a direct Java-loop transliteration.

The pure-Python model below IS the reference walk
(SimpleRegionNormalizer.java:104 computePlanForTable): sequential, with
the consumed-neighbor skip. The Spark implementation is the
gaps-and-islands linearization — randomized size vectors prove the two
agree on every alternation edge case.
"""

from __future__ import annotations

import random

import pytest

from hbase_1_3_0_spark.operators.normalizer import normalization_plan


def _java_walk(
    sizes: list[float],
    *,
    split_enabled: bool = True,
    merge_enabled: bool = True,
    min_regions: int = 3,
) -> list[tuple]:
    """SimpleRegionNormalizer.java:104-186, line for line."""
    if len(sizes) < min_regions:
        return []
    avg = sum(sizes) / len(sizes)
    plans = []
    i = 0
    while i < len(sizes):
        if sizes[i] > 2 * avg:
            if split_enabled:
                plans.append(("SPLIT", i, None))
        else:
            if i == len(sizes) - 1:
                break
            if merge_enabled and sizes[i] + sizes[i + 1] < avg:
                plans.append(("MERGE", i, i + 1))
                i += 1
        i += 1
    # splits-first stable sort (:79 planComparator)
    return [p for p in plans if p[0] == "SPLIT"] + [
        p for p in plans if p[0] == "MERGE"
    ]


def _spark_plans(spark, sizes_by_table, **kw):
    rows = [
        (t, i, s)
        for t, sizes in sizes_by_table.items()
        for i, s in enumerate(sizes)
    ]
    df = spark.createDataFrame(
        rows, "table_name string, region long, size_mb double"
    )
    out = {}
    for r in normalization_plan(df, **kw).collect():
        out.setdefault(r.table_name, []).append(
            (r.plan_seq, r.plan_type, r.region_a, r.region_b)
        )
    return {
        t: [(p[1], p[2], p[3]) for p in sorted(v)] for t, v in out.items()
    }


def test_matches_java_walk_on_random_tables(spark):
    rng = random.Random(42)
    tables = {}
    for t in range(12):
        n = rng.randint(3, 14)
        # mix tiny / average / huge regions so splits, merges, and
        # multi-region eligibility runs all occur
        tables[f"t{t}"] = [
            float(rng.choice([1, 2, 3, 50, 60, 400, 900])) for _ in range(n)
        ]
    got = _spark_plans(spark, tables)
    for t, sizes in tables.items():
        want = [(p[0], p[1], p[2]) for p in _java_walk(sizes)]
        assert got.get(t, []) == want, (t, sizes)


def test_consumed_neighbor_alternation(spark):
    # four consecutive merge-eligible regions: greedy pairs (0,1) and
    # (2,3) — never (1,2)
    sizes = {"t": [10.0, 10.0, 10.0, 10.0, 1000.0]}
    got = _spark_plans(spark, sizes)["t"]
    # region 4 is over 2x avg (split); the four eligible small regions
    # pair greedily as (0,1) and (2,3) — never (1,2)
    assert got == [("SPLIT", 4, None), ("MERGE", 0, 1), ("MERGE", 2, 3)]


def test_splits_sort_before_merges(spark):
    sizes = {"t": [5.0, 5.0, 800.0, 5.0, 5.0, 100.0]}
    rows = _spark_plans(spark, sizes)["t"]
    want = [(p[0], p[1], p[2]) for p in _java_walk(sizes["t"])]
    assert rows == want
    assert rows[0][0] == "SPLIT"


def test_min_region_count_guard(spark):
    assert _spark_plans(spark, {"small": [1.0, 1000.0]}) == {}


def test_disable_flags(spark):
    sizes = {"t": [5.0, 5.0, 800.0, 5.0, 5.0, 100.0]}
    no_split = _spark_plans(spark, sizes, split_enabled=False)["t"]
    assert no_split == [
        (p[0], p[1], p[2])
        for p in _java_walk(sizes["t"], split_enabled=False)
    ]
    assert all(p[0] == "MERGE" for p in no_split)
    no_merge = _spark_plans(spark, sizes, merge_enabled=False)["t"]
    assert all(p[0] == "SPLIT" for p in no_merge)
    with pytest.raises(ValueError):
        normalization_plan(
            spark.createDataFrame(
                [("t", 0, 1.0)], "table_name string, region long, size_mb double"
            ),
            split_enabled=False,
            merge_enabled=False,
        )


def test_last_region_never_starts_merge(spark):
    # tiny tail pair would qualify by size, but the walk breaks at the
    # last region (Java :166)
    sizes = {"t": [100.0, 100.0, 1.0]}
    walked = _java_walk(sizes["t"])
    got = _spark_plans(spark, sizes).get("t", [])
    assert got == [(p[0], p[1], p[2]) for p in walked]
    assert all(p[1] != 2 for p in got)
