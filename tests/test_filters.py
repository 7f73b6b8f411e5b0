"""Filter algebra: per-filter verdicts + FilterList composition + ParseFilter DSL.

Ports the scenario classes of the reference's filter suite (TestFilter.java,
TestFilterList, TestSingleColumnValueFilter, TestDependentColumnFilter,
TestColumnRangeFilter, TestFuzzyRowFilterEndToEnd — SURVEY.md §5) onto the
customer KV fixture.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hbase_1_3_0_spark.catalog import FamilyMeta, TableMeta
from hbase_1_3_0_spark.filters import ast
from hbase_1_3_0_spark.filters.parser import parse_filter
from hbase_1_3_0_spark.functions import codecs
from hbase_1_3_0_spark.sources import kv_encoder
from hbase_1_3_0_spark.table import Scan, Table
from tests.conftest import load


def key(n: int) -> bytes:
    return str(n).zfill(codecs.KEY_SEGMENT_WIDTH).encode()


@pytest.fixture(scope="module")
def tbl(spark, sf_dir):
    df = load(spark, sf_dir, "customer")
    cells = kv_encoder.table_to_cells(df, ["c_custkey"])
    meta = TableMeta(name="cust_filters", families=(FamilyMeta(name="d"),))
    return Table(meta, cells, now_ms=2_000_000), df


def rows_of(df_cells) -> set[bytes]:
    return {bytes(r.row) for r in df_cells.select("row").distinct().collect()}


def keys_where(df, cond: str) -> set[bytes]:
    return {key(r.c_custkey) for r in df.where(cond).select("c_custkey").collect()}


def test_row_filter_binary(tbl):
    t, df = tbl
    out = t.scan(Scan(filter=ast.RowFilter(ast.CompareOp.LESS, ast.BinaryComparator(key(10)))))
    assert rows_of(out) == keys_where(df, "c_custkey < 10")


def test_qualifier_and_value_filter(tbl):
    t, df = tbl
    out = t.scan(Scan(filter=ast.FilterList("MUST_PASS_ALL", [
        ast.QualifierFilter(ast.CompareOp.EQUAL, ast.BinaryComparator(b"c_mktsegment")),
        ast.ValueFilter(ast.CompareOp.EQUAL, ast.BinaryComparator(b"BUILDING")),
    ])))
    assert rows_of(out) == keys_where(df, "c_mktsegment = 'BUILDING'")
    assert out.select("qualifier").distinct().count() == 1


def test_value_filter_regex_and_substring(tbl):
    t, df = tbl
    out = t.scan(Scan(
        columns=(("d", b"c_mktsegment"),),
        filter=ast.ValueFilter(ast.CompareOp.EQUAL, ast.RegexStringComparator("^BUILD")),
    ))
    assert rows_of(out) == keys_where(df, "c_mktsegment LIKE 'BUILD%'")
    out2 = t.scan(Scan(
        columns=(("d", b"c_mktsegment"),),
        filter=ast.ValueFilter(ast.CompareOp.EQUAL, ast.SubstringComparator("build")),
    ))
    assert rows_of(out2) == keys_where(df, "c_mktsegment LIKE '%BUILD%'")


def test_scvf_whole_row_semantics(tbl):
    t, df = tbl
    f = ast.SingleColumnValueFilter(
        "d", b"c_mktsegment", ast.CompareOp.EQUAL, ast.BinaryComparator(b"AUTOMOBILE")
    )
    out = t.scan(Scan(filter=f))
    assert rows_of(out) == keys_where(df, "c_mktsegment = 'AUTOMOBILE'")
    # whole rows are returned (all qualifiers present)
    nq = out.select("qualifier").distinct().count()
    assert nq == len(df.columns)


def test_scvf_filter_if_missing(tbl, spark):
    t, df = tbl
    # filter on a column that exists nowhere: filter_if_missing=False keeps all
    f_keep = ast.SingleColumnValueFilter(
        "d", b"nope", ast.CompareOp.EQUAL, ast.BinaryComparator(b"x"),
        filter_if_missing=False,
    )
    f_drop = ast.SingleColumnValueFilter(
        "d", b"nope", ast.CompareOp.EQUAL, ast.BinaryComparator(b"x"),
        filter_if_missing=True,
    )
    assert t.scan(Scan(filter=f_keep)).select("row").distinct().count() == df.count()
    assert t.scan(Scan(filter=f_drop)).count() == 0


def test_scvf_exclude_drops_tested_column(tbl, spark):
    t, df = tbl
    f = ast.SingleColumnValueExcludeFilter(
        "d", b"c_mktsegment", ast.CompareOp.EQUAL, ast.BinaryComparator(b"AUTOMOBILE")
    )
    out = t.scan(Scan(filter=f))
    quals = {bytes(r.qualifier) for r in out.select("qualifier").distinct().collect()}
    assert b"c_mktsegment" not in quals and len(quals) == len(df.columns) - 1


def test_prefix_filter(tbl, spark):
    t, df = tbl
    # keys are zero-padded: prefix of 18 zeros + '1' matches custkey 10..19 and 1
    prefix = b"0" * 17 + b"1"
    out = t.scan(Scan(filter=ast.PrefixFilter(prefix)))
    exp = {key(k) for k in range(200) if str(k).zfill(19).startswith(prefix.decode())}
    exp &= keys_where(df, "c_custkey >= 0")
    assert rows_of(out) == exp and len(exp) > 0


def test_column_prefix_filters(tbl):
    t, df = tbl
    out = t.scan(Scan(filter=ast.ColumnPrefixFilter(b"c_n")))
    quals = {bytes(r.qualifier) for r in out.select("qualifier").distinct().collect()}
    assert quals == {b"c_name", b"c_nationkey"}
    out2 = t.scan(Scan(filter=ast.MultipleColumnPrefixFilter([b"c_a", b"c_m"])))
    quals2 = {bytes(r.qualifier) for r in out2.select("qualifier").distinct().collect()}
    assert quals2 == {b"c_acctbal", b"c_mktsegment"}


def test_column_range_filter(tbl):
    t, _ = tbl
    out = t.scan(Scan(filter=ast.ColumnRangeFilter(b"c_acctbal", True, b"c_mktsegment", True)))
    quals = {bytes(r.qualifier) for r in out.select("qualifier").distinct().collect()}
    assert quals == {b"c_acctbal", b"c_custkey", b"c_mktsegment"}


def test_column_pagination_and_count(tbl):
    t, _ = tbl
    out = t.scan(Scan(filter=ast.ColumnPaginationFilter(limit=2, offset=1)))
    quals = sorted({bytes(r.qualifier) for r in out.select("qualifier").distinct().collect()})
    assert quals == [b"c_custkey", b"c_mktsegment"]
    out2 = t.scan(Scan(filter=ast.ColumnCountGetFilter(1)))
    quals2 = {bytes(r.qualifier) for r in out2.select("qualifier").distinct().collect()}
    assert quals2 == {b"c_acctbal"}


def test_page_filter_exact_global(tbl, spark):
    t, df = tbl
    out = t.scan(Scan(filter=ast.PageFilter(7)))
    got = sorted(rows_of(out))
    lo = df.agg(F.min("c_custkey")).first()[0]
    assert got == [key(k) for k in range(lo, lo + 7)]


def test_inclusive_stop_filter(tbl):
    t, _ = tbl
    out = t.scan(Scan(start_row=key(5), filter=ast.InclusiveStopFilter(key(8))))
    assert sorted(rows_of(out)) == [key(5), key(6), key(7), key(8)]


def test_timestamps_filter(tbl):
    t, _ = tbl
    assert t.scan(Scan(filter=ast.TimestampsFilter([kv_encoder.DEFAULT_TS]))).count() > 0
    assert t.scan(Scan(filter=ast.TimestampsFilter([123]))).count() == 0


def test_key_only_and_first_key_only(tbl, spark):
    t, df = tbl
    out = t.scan(Scan(filter=ast.KeyOnlyFilter()))
    assert out.where(F.col("value").isNotNull()).count() == 0
    out2 = t.scan(Scan(filter=ast.FirstKeyOnlyFilter()))
    assert out2.count() == df.count()  # one cell per row
    quals = {bytes(r.qualifier) for r in out2.select("qualifier").distinct().collect()}
    assert quals == {b"c_acctbal"}  # first qualifier in sort order
    # len_as_val: value is the 4-byte BE length of the original value
    out3 = t.scan(Scan(
        columns=(("d", b"c_mktsegment"),), filter=ast.KeyOnlyFilter(len_as_val=True)
    ))
    r = out3.select(codecs.decode_int_be(F.col("value")).alias("n")).first()
    assert r.n in {len("BUILDING"), len("AUTOMOBILE"), len("MACHINERY"),
                   len("HOUSEHOLD"), len("FURNITURE")}


def test_fuzzy_row_filter(tbl, spark):
    t, df = tbl
    # fix the last byte to '7' (every custkey ending in 7), wildcard elsewhere
    pattern = b"\x00" * 18 + b"7"
    mask = b"\x01" * 18 + b"\x00"
    out = t.scan(Scan(filter=ast.FuzzyRowFilter([(pattern, mask)])))
    assert rows_of(out) == keys_where(df, "c_custkey % 10 = 7")


def test_multi_row_range_filter(tbl, spark):
    t, df = tbl
    f = ast.MultiRowRangeFilter([
        ast.RowRange(key(5), True, key(8), False),
        ast.RowRange(key(20), True, key(22), True),
    ])
    out = t.scan(Scan(filter=f))
    assert rows_of(out) == {key(5), key(6), key(7), key(20), key(21), key(22)}


def test_multi_row_range_many_ranges_binary_search_path(tbl, spark):
    """>16 merged disjoint ranges takes the O(log R) parity binary
    search (compiler._multi_row_range_pred element_at fold); results
    must equal the brute-force union, including exclusive starts /
    inclusive stops and an open-ended tail."""
    t, df = tbl
    ranges = [
        ast.RowRange(key(4 * i), bool(i % 2), key(4 * i + 2), bool(i % 3))
        for i in range(30)
    ]
    ranges.append(ast.RowRange(key(140), True, None, False))
    out = rows_of(t.scan(Scan(filter=ast.MultiRowRangeFilter(ranges))))

    def member(k: bytes) -> bool:
        for r in ranges:
            lo_ok = k >= r.start_row if r.start_inclusive else k > r.start_row
            hi_ok = (
                r.stop_row is None
                or (k <= r.stop_row if r.stop_inclusive else k < r.stop_row)
            )
            if lo_ok and hi_ok:
                return True
        return False

    want = {k for k in rows_of(t.scan(Scan())) if member(k)}
    assert out == want and len(out) > 0


def test_random_row_filter_deterministic_and_row_consistent(tbl, spark):
    t, df = tbl
    out = t.scan(Scan(filter=ast.RandomRowFilter(0.35, seed=7)))
    a = rows_of(out)
    b = rows_of(t.scan(Scan(filter=ast.RandomRowFilter(0.35, seed=7))))
    assert a == b
    n = df.count()
    assert 0.15 * n < len(a) < 0.6 * n
    # row-consistency: every surviving row keeps all its cells
    cnt = out.groupBy("row").count().select("count").distinct().collect()
    assert len(cnt) == 1


def test_skip_filter(tbl, spark):
    t, df = tbl
    # SKIP: drop any row where some cell fails value != 'BUILDING'
    # (i.e. keep only rows with NO cell equal to BUILDING)
    f = ast.SkipFilter(
        ast.ValueFilter(ast.CompareOp.NOT_EQUAL, ast.BinaryComparator(b"BUILDING"))
    )
    out = t.scan(Scan(filter=f))
    assert rows_of(out) == keys_where(df, "c_mktsegment <> 'BUILDING'")


def test_while_match_filter(tbl, spark):
    t, df = tbl
    # scan while rowkey < key(9): passing prefix ends at first failing row
    f = ast.WhileMatchFilter(
        ast.RowFilter(ast.CompareOp.LESS, ast.BinaryComparator(key(9)))
    )
    out = t.scan(Scan(filter=f))
    lo = df.agg(F.min("c_custkey")).first()[0]
    assert rows_of(out) == {key(k) for k in range(lo, 9)}


def test_dependent_column_filter(spark):
    from hbase_1_3_0_spark.cells import CELL_SCHEMA, TYPE_PUT

    rows = [
        (b"r1", "d", b"ref", 100, TYPE_PUT, b"x", 0),
        (b"r1", "d", b"a", 100, TYPE_PUT, b"same-ts", 0),
        (b"r1", "d", b"b", 200, TYPE_PUT, b"other-ts", 0),
        (b"r2", "d", b"a", 100, TYPE_PUT, b"no-ref-row", 0),
    ]
    cells = spark.createDataFrame(rows, CELL_SCHEMA)
    meta = TableMeta(name="dep", families=(FamilyMeta(name="d", max_versions=5),))
    t = Table(meta, cells, now_ms=0)
    out = t.scan(Scan(max_versions=5, filter=ast.DependentColumnFilter("d", b"ref")))
    got = sorted((bytes(r.row), bytes(r.qualifier)) for r in out.collect())
    assert got == [(b"r1", b"a"), (b"r1", b"ref")]
    out2 = t.scan(Scan(
        max_versions=5,
        filter=ast.DependentColumnFilter("d", b"ref", drop_dependent_column=True),
    ))
    got2 = sorted((bytes(r.row), bytes(r.qualifier)) for r in out2.collect())
    assert got2 == [(b"r1", b"a")]


def test_filter_list_or_composition(tbl, spark):
    t, df = tbl
    f = ast.FilterList("MUST_PASS_ONE", [
        ast.SingleColumnValueFilter("d", b"c_mktsegment", ast.CompareOp.EQUAL,
                                    ast.BinaryComparator(b"AUTOMOBILE")),
        ast.SingleColumnValueFilter("d", b"c_mktsegment", ast.CompareOp.EQUAL,
                                    ast.BinaryComparator(b"MACHINERY")),
    ])
    out = t.scan(Scan(filter=f))
    assert rows_of(out) == keys_where(df, "c_mktsegment IN ('AUTOMOBILE','MACHINERY')")


def test_parse_filter_dsl_end_to_end(tbl, spark):
    t, df = tbl
    s = ("SingleColumnValueFilter ('d', 'c_mktsegment', =, 'binary:BUILDING') "
         "AND PageFilter (5)")
    out = t.scan(Scan(filter=s))
    got = sorted(rows_of(out))
    exp = sorted(keys_where(df, "c_mktsegment = 'BUILDING'"))[:5]
    assert got == exp


def test_parse_filter_precedence_and_paren(spark, tbl):
    t, df = tbl
    s = ("(QualifierFilter (=, 'binary:c_mktsegment') AND "
         "ValueFilter (=, 'substring:auto')) OR "
         "(QualifierFilter (=, 'binary:c_mktsegment') AND "
         "ValueFilter (=, 'substring:machi'))")
    out = t.scan(Scan(filter=s))
    assert rows_of(out) == keys_where(df, "c_mktsegment IN ('AUTOMOBILE','MACHINERY')")


def test_parse_filter_skip_and_while(tbl, spark):
    t, df = tbl
    out = t.scan(Scan(filter="SKIP ValueFilter (!=, 'binary:BUILDING')"))
    assert rows_of(out) == keys_where(df, "c_mktsegment <> 'BUILDING'")
    out2 = t.scan(Scan(filter="WHILE RowFilter (<, 'binary:%s')" % key(5).decode()))
    lo = df.agg(F.min("c_custkey")).first()[0]
    assert rows_of(out2) == {key(k) for k in range(lo, 5)}


def test_parse_filter_quote_escaping(spark):
    f = parse_filter("ValueFilter (=, 'binary:it''s')")
    assert f == ast.ValueFilter(ast.CompareOp.EQUAL, ast.BinaryComparator(b"it's"))


def test_dsl_roundtrip_fuzz():
    """parse_filter(to_dsl(f)) == f over random DSL-expressible trees."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from tests._prop_budget import ex

    from hbase_1_3_0_spark.filters import ast as fa
    from hbase_1_3_0_spark.filters.parser import parse_filter, to_dsl

    comparator_st = st.one_of(
        st.sampled_from(["abc", "it's", "x,y", "p(q)"]).map(
            lambda s: fa.BinaryComparator(s.encode())
        ),
        st.sampled_from(["ab", "z"]).map(
            lambda s: fa.BinaryPrefixComparator(s.encode())
        ),
        st.sampled_from(["needle", "N'dle"]).map(fa.SubstringComparator),
        st.integers(min_value=-99, max_value=99).map(fa.LongComparator),
        st.just(fa.NullComparator()),
    )
    ops = [o for o in fa.CompareOp.ALL if o != fa.CompareOp.NO_OP]
    leaf_st = st.one_of(
        st.builds(
            lambda cls, op, c: cls(op=op, comparator=c),
            st.sampled_from(
                [fa.RowFilter, fa.FamilyFilter, fa.QualifierFilter, fa.ValueFilter]
            ),
            st.sampled_from(ops),
            comparator_st,
        ),
        st.integers(min_value=1, max_value=50).map(fa.PageFilter),
        st.sampled_from([b"r1", b"qq"]).map(fa.PrefixFilter),
        st.builds(
            fa.ColumnPaginationFilter,
            st.integers(min_value=1, max_value=5),
            st.integers(min_value=0, max_value=5),
        ),
        st.lists(
            st.integers(min_value=1, max_value=9), min_size=1, max_size=3
        ).map(fa.TimestampsFilter),
        st.builds(
            lambda fam, q, op, c, m, l: fa.SingleColumnValueFilter(
                fam, q, op, c, filter_if_missing=m, latest_version_only=l
            ),
            st.just("d"),
            st.sampled_from([b"qa", b"qb"]),
            st.sampled_from(ops),
            comparator_st,
            st.booleans(),
            st.booleans(),
        ),
    )
    tree_st = st.recursive(
        leaf_st,
        lambda ch: st.one_of(
            # min 2 children: a 1-element FilterList is semantically its
            # child and the DSL (like the HBase shell) cannot spell it
            st.builds(
                lambda op, fs: fa.FilterList(op, tuple(fs)),
                st.sampled_from(["MUST_PASS_ALL", "MUST_PASS_ONE"]),
                st.lists(ch, min_size=2, max_size=3),
            ),
            ch.map(fa.SkipFilter),
            ch.map(fa.WhileMatchFilter),
        ),
        max_leaves=8,
    )

    @settings(max_examples=ex(300), deadline=None)
    @given(f=tree_st)
    def roundtrip(f):
        assert parse_filter(to_dsl(f)) == f

    roundtrip()
