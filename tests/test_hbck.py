"""hbck region-chain checks vs a transliteration of the Java walk.

The model below IS HBaseFsck.java:2972 checkRegionChain over
RegionSplitCalculator coverage, line for line (split set = starts +
non-empty ends + the +inf sentinel; coverage = interval stab plus the
region's own start key; per-key n² pair loop). Randomized region sets
drive every error class through both implementations.
"""

from __future__ import annotations

import random

from hbase_1_3_0_spark.operators.hbck import region_chain_check


def _rg(r):
    return f"{r[0]}|{r[1]}"


def _java_chain_check(regions: list[tuple[str, str]]) -> set[tuple]:
    """checkRegionChain for one table; ('' = empty key). Returns the
    deduped error set in this repo's canonical row shape."""
    valid = [(s, e) for s, e in regions if e == "" or s <= e]
    splits: set = set()
    has_inf = False
    for s, e in valid:
        splits.add(s)
        if e == "":
            has_inf = True
        else:
            splits.add(e)
    ordered: list = sorted(splits) + ([None] if has_inf else [])

    def covers(r, k):
        s, e = r
        return s == k or (s <= k and (e == "" or k < e))

    errs: set[tuple] = set()
    prev = None
    for idx, k in enumerate(ordered):
        if k is None:  # the +inf sentinel: empty coverage, no hole
            prev = None
            continue
        ranges = [r for r in valid if covers(r, k)]
        if idx == 0 and k != "":
            for r in ranges:
                errs.add(("FIRST_REGION_STARTKEY_NOT_EMPTY", k, _rg(r), None))
        for r in ranges:
            if r[1] != "" and r[0] == r[1]:
                errs.add(("DEGENERATE_REGION", r[0], _rg(r), None))
        if len(ranges) > 1:
            for i in range(len(ranges)):
                for j in range(i + 1, len(ranges)):
                    r1, r2 = sorted([ranges[i], ranges[j]], key=_rg)
                    code = (
                        "DUPE_STARTKEYS"
                        if r1[0] == r2[0]
                        else "OVERLAP_IN_REGION_CHAIN"
                    )
                    errs.add((code, k, _rg(r1), _rg(r2)))
        elif len(ranges) == 0:
            if idx + 1 < len(ordered) and ordered[idx + 1] is not None:
                errs.add(("HOLE_IN_REGION_CHAIN", k, None, None))
        prev = k
    if prev is not None:
        errs.add(("LAST_REGION_ENDKEY_NOT_EMPTY", prev, None, None))
    return errs


def _spark_check(spark, tables: dict[str, list[tuple[str, str]]]) -> dict:
    rows = [(t, s, e) for t, rs in tables.items() for s, e in rs]
    df = spark.createDataFrame(
        rows, "table_name string, start_key string, end_key string"
    )
    out: dict[str, set] = {}
    for r in region_chain_check(df).collect():
        out.setdefault(r.table_name, set()).add(
            (r.error_code, r.split_key, r.region_a, r.region_b)
        )
    return out


def test_healthy_chain_reports_nothing(spark):
    tables = {"ok": [("", "10"), ("10", "20"), ("20", "")]}
    assert _spark_check(spark, tables) == {}


def test_each_error_class(spark):
    tables = {
        "hole": [("", "10"), ("20", "")],
        "dupe": [("", "10"), ("10", "30"), ("10", "20"), ("30", "")],
        "overlap": [("", "15"), ("10", "30"), ("30", "")],
        "degen": [("", "10"), ("10", "10"), ("10", "")],
        "edges": [("05", "10"), ("10", "20")],
        "backwards": [("", "10"), ("30", "10"), ("10", "")],
    }
    got = _spark_check(spark, tables)
    for t, rs in tables.items():
        assert got.get(t, set()) == _java_chain_check(rs), t
    assert any(c == "HOLE_IN_REGION_CHAIN" for c, *_ in got["hole"])
    assert any(c == "DUPE_STARTKEYS" for c, *_ in got["dupe"])
    assert any(c == "OVERLAP_IN_REGION_CHAIN" for c, *_ in got["overlap"])
    assert any(c == "DEGENERATE_REGION" for c, *_ in got["degen"])
    assert {c for c, *_ in got["edges"]} >= {
        "FIRST_REGION_STARTKEY_NOT_EMPTY",
        "LAST_REGION_ENDKEY_NOT_EMPTY",
    }
    # the backwards region never enters the chain; the remaining
    # regions form a healthy '' -> 10 -> '' cover, so nothing reports
    assert got.get("backwards", set()) == _java_chain_check(
        tables["backwards"]
    )


def test_matches_java_walk_on_random_tables(spark):
    rng = random.Random(7)
    tables = {}
    for t in range(20):
        n = rng.randint(1, 8)
        regs = []
        for _ in range(n):
            a, b = rng.randint(0, 30), rng.randint(0, 30)
            s = "" if rng.random() < 0.15 else f"{a:02d}"
            e = "" if rng.random() < 0.15 else f"{b:02d}"
            regs.append((s, e))
        tables[f"t{t}"] = regs
    got = _spark_check(spark, tables)
    for t, rs in tables.items():
        assert got.get(t, set()) == _java_chain_check(rs), (t, rs)
