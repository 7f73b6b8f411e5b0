"""ParseFilter DSL pinned to the reference's own TestParseFilter.java:
the EXACT filter strings (whitespace quirks, missing spaces around AND,
tab prefixes, doubled-quote escapes) and the exact tree shapes the
reference asserts — FilterList operator + child order, SKIP binding
tighter than AND tighter than OR, comparator types and payloads, and
the rejection cases. Pure parser tests, no SparkSession."""

from __future__ import annotations

import pytest

from hbase_1_3_0_spark.filters import ast
from hbase_1_3_0_spark.filters.parser import parse_filter


def test_compound_filter1():
    # TestParseFilter.java:398 — note the missing space before AND
    f = parse_filter(" (PrefixFilter ('realtime')AND  FirstKeyOnlyFilter())")
    assert isinstance(f, ast.FilterList)
    assert f.operator == "MUST_PASS_ALL"
    assert isinstance(f.filters[0], ast.PrefixFilter)
    assert f.filters[0].prefix == b"realtime"
    assert isinstance(f.filters[1], ast.FirstKeyOnlyFilter)


def test_compound_filter2():
    # :413 — OR of (AND list) and FamilyFilter; MUST_PASS_ONE on top
    f = parse_filter(
        "(PrefixFilter('realtime') AND QualifierFilter (>=, 'binary:e'))"
        "OR FamilyFilter (=, 'binary:qualifier') "
    )
    assert isinstance(f, ast.FilterList)
    assert f.operator == "MUST_PASS_ONE"
    inner, fam = f.filters
    assert isinstance(inner, ast.FilterList)
    assert inner.operator == "MUST_PASS_ALL"
    assert isinstance(inner.filters[0], ast.PrefixFilter)
    assert inner.filters[0].prefix == b"realtime"
    q = inner.filters[1]
    assert isinstance(q, ast.QualifierFilter)
    assert q.op == ast.CompareOp.GREATER_OR_EQUAL
    assert isinstance(q.comparator, ast.BinaryComparator)
    assert q.comparator.value == b"e"
    assert isinstance(fam, ast.FamilyFilter)
    assert fam.op == ast.CompareOp.EQUAL
    assert isinstance(fam.comparator, ast.BinaryComparator)
    assert fam.comparator.value == b"qualifier"


def test_compound_filter3():
    # :448 — AND binds before OR; SKIP wraps only the FamilyFilter
    f = parse_filter(
        " ColumnPrefixFilter ('realtime')AND  "
        "FirstKeyOnlyFilter() OR SKIP FamilyFilter(=, 'substring:hihi')"
    )
    assert isinstance(f, ast.FilterList) and f.operator == "MUST_PASS_ONE"
    inner, skip = f.filters
    assert isinstance(inner, ast.FilterList)
    assert inner.operator == "MUST_PASS_ALL"
    assert isinstance(inner.filters[0], ast.ColumnPrefixFilter)
    assert isinstance(inner.filters[1], ast.FirstKeyOnlyFilter)
    assert isinstance(skip, ast.SkipFilter)
    fam = skip.wrapped
    assert isinstance(fam, ast.FamilyFilter)
    assert fam.op == ast.CompareOp.EQUAL
    assert isinstance(fam.comparator, ast.SubstringComparator)
    assert fam.comparator.substr == "hihi"


def test_compound_filter4():
    # :482 — flat three-way OR, SKIP child last
    f = parse_filter(
        " ColumnPrefixFilter ('realtime') OR "
        "FirstKeyOnlyFilter() OR SKIP FamilyFilter(=, 'substring:hihi')"
    )
    assert isinstance(f, ast.FilterList) and f.operator == "MUST_PASS_ONE"
    kinds = [type(c) for c in _flat_or(f)]
    assert kinds == [
        ast.ColumnPrefixFilter, ast.FirstKeyOnlyFilter, ast.SkipFilter,
    ]


def _flat_or(f):
    out = []
    for c in f.filters:
        if isinstance(c, ast.FilterList) and c.operator == "MUST_PASS_ONE":
            out.extend(_flat_or(c))
        else:
            out.append(c)
    return out


def test_precedence1():
    # :550 — parenthesized (A AND B OR C): AND groups first
    f = parse_filter(
        " (PrefixFilter ('realtime')AND  FirstKeyOnlyFilter()"
        " OR KeyOnlyFilter())"
    )
    assert isinstance(f, ast.FilterList) and f.operator == "MUST_PASS_ONE"
    inner, key_only = f.filters
    assert isinstance(inner, ast.FilterList)
    assert inner.operator == "MUST_PASS_ALL"
    assert isinstance(inner.filters[0], ast.PrefixFilter)
    assert inner.filters[0].prefix == b"realtime"
    assert isinstance(inner.filters[1], ast.FirstKeyOnlyFilter)
    assert isinstance(key_only, ast.KeyOnlyFilter)


def test_precedence2():
    # :573 — SKIP binds tighter than AND: (A AND SKIP B) OR C
    f = parse_filter(
        " PrefixFilter ('realtime')AND  SKIP FirstKeyOnlyFilter()"
        "OR KeyOnlyFilter()"
    )
    assert isinstance(f, ast.FilterList) and f.operator == "MUST_PASS_ONE"
    inner, key_only = f.filters
    assert isinstance(inner, ast.FilterList)
    assert inner.operator == "MUST_PASS_ALL"
    assert isinstance(inner.filters[0], ast.PrefixFilter)
    skip = inner.filters[1]
    assert isinstance(skip, ast.SkipFilter)
    assert isinstance(skip.wrapped, ast.FirstKeyOnlyFilter)
    assert isinstance(key_only, ast.KeyOnlyFilter)


def test_unescaped_quotes():
    # :598/:607/:616 — '' inside a quoted token is a literal quote
    f = parse_filter("InclusiveStopFilter ('row''3')")
    assert isinstance(f, ast.InclusiveStopFilter)
    assert f.stop_row == b"row'3"
    f = parse_filter("InclusiveStopFilter ('row''3''')")
    assert f.stop_row == b"row'3'"
    f = parse_filter("\tInclusiveStopFilter ('''')")  # tab prefix, :616
    assert f.stop_row == b"'"


def test_correct_and_incorrect_filter_strings():
    # :625 "()" rejected; :637 "(FirstKeyOnlyFilter())" unwraps
    with pytest.raises(ValueError):
        parse_filter("()")
    f = parse_filter("(FirstKeyOnlyFilter())")
    assert isinstance(f, ast.FirstKeyOnlyFilter)


def test_incorrect_compare_operator_and_comparator():
    # :511 '>>' rejected; :522 RowFilter with a LongComparator rejected?
    # the reference rejects UNKNOWN comparator kinds at parse time —
    # here 'unknowntype:x' must fail the same way
    with pytest.raises(ValueError):
        parse_filter("RowFilter ('>>' , 'binary:region')")
    with pytest.raises(ValueError):
        parse_filter("RowFilter (>, 'unknowntype:region')")


def test_simple_filters_reference_payloads():
    # the :56-:295 battery of single-filter strings, payloads asserted
    f = parse_filter("PrefixFilter('row')")
    assert isinstance(f, ast.PrefixFilter) and f.prefix == b"row"
    f = parse_filter("ColumnPrefixFilter('qualifier')")
    assert isinstance(f, ast.ColumnPrefixFilter)
    f = parse_filter("MultipleColumnPrefixFilter('qualifier1', 'qualifier2')")
    assert isinstance(f, ast.MultipleColumnPrefixFilter)
    f = parse_filter("PageFilter(4)")
    assert isinstance(f, ast.PageFilter) and f.page_size == 4
    f = parse_filter("ColumnPaginationFilter(4, 6)")
    assert isinstance(f, ast.ColumnPaginationFilter)
    assert (f.limit, f.offset) == (4, 6)
    f = parse_filter("TimestampsFilter(9223372036854775806, 6)")
    assert isinstance(f, ast.TimestampsFilter)
    assert 9223372036854775806 in f.timestamps
    f = parse_filter("RowFilter ( =,   'binary:regionse')")
    assert isinstance(f, ast.RowFilter)
    assert f.comparator.value == b"regionse"
    f = parse_filter("QualifierFilter (=, 'regexstring:pre*')")
    assert isinstance(f, ast.QualifierFilter)
    assert isinstance(f.comparator, ast.RegexStringComparator)
    f = parse_filter("ValueFilter (!=, 'binaryprefix:valu')")
    assert isinstance(f, ast.ValueFilter)
    assert f.op == ast.CompareOp.NOT_EQUAL
    assert isinstance(f.comparator, ast.BinaryPrefixComparator)


def test_fuzzy_row_membership_reference_vectors(spark):
    """FuzzyRowFilter membership pinned to TestFuzzyRowFilter.java's
    satisfiesNoUnsafe vectors (:31-75; mask 0 = fixed, 1 = fuzzy —
    ours is the same new-format convention). The reference's YES rows
    must pass our compiled predicate; NEXT_EXISTS rows (current row
    fails, a later one may match) must be excluded — the seek hint
    itself is LSM-iterator machinery with no batch analog, which is
    the documented divergence on the AST class."""
    from hbase_1_3_0_spark.filters.ast import FuzzyRowFilter
    from hbase_1_3_0_spark.filters.compiler import apply_filter

    # (row, fuzzy pattern, mask, reference verdict YES?)
    vectors = [
        (b"\x01\x80\x01\x00\x01", b"\x01\x00\x01", b"\x00\x01\x00", True),
        (b"\x01\x80\x02\x00\x01", b"\x01\x00\x01", b"\x00\x01\x00", False),
        (b"\x01\x02\x01\x03\x03", b"\x01\x02\x00\x03", b"\x00\x00\x01\x00",
         True),
        (b"\x01\x01\x01\x03\x00", b"\x01\x02\x00\x03", b"\x00\x00\x01\x00",
         False),
        (b"\x01\x01\x01\x03\x00", b"\x01\xf5\x00\x03", b"\x00\x00\x01\x00",
         False),
        (b"\x01\x02\x01\x00\x01", b"\x00\x01\x02", b"\x01\x00\x00", False),
    ]
    from hbase_1_3_0_spark.cells import CELL_SCHEMA

    rows = [(r, "d", b"q", 1, 4, b"v", 0) for r, _, _, _ in vectors]
    cells = spark.createDataFrame(rows, CELL_SCHEMA)
    for row, patt, mask, want in vectors:
        out = apply_filter(
            cells, FuzzyRowFilter(pairs=[(patt, mask)])
        ).select("row").collect()
        got = any(bytes(r.row) == row for r in out)
        assert got is want, (row.hex(), patt.hex(), mask.hex(), want)


def test_multi_row_range_sort_and_merge_reference_table():
    """sortAndMerge pinned to TestMultiRowRangeFilter.java:109-228 —
    outcomes stated in our normalized half-open form ([s, e) with
    e=None = +inf; inclusivity absorbed by byte-successor arithmetic,
    so e.g. the reference's stop-inclusive [10,20] merging with
    start-exclusive (20, inf) is the half-open pair (b10, b20+\\x00)
    meeting (b20+\\x00, None)). Empty bytes = open boundary."""
    from hbase_1_3_0_spark.filters.ast import (
        MultiRowRangeFilter,
        RowRange,
    )
    from hbase_1_3_0_spark.filters.compiler import _sort_and_merge_ranges

    def b(n):
        return bytes([n])

    def merge(*rs):
        return _sort_and_merge_ranges([RowRange(*r) for r in rs])

    # testMergeAndSortWithEmptyStartRow (:109)
    assert merge((b"", True, b(20), False), (b(15), True, b(40), False)) \
        == [(b"", b(40))]
    # testMergeAndSortWithEmptyStopRow (:120)
    assert merge((b(10), True, b(20), False), (b(15), True, b"", False),
                 (b(30), True, b(70), False)) == [(b(10), None)]
    # testMergeAndSortWithEmptyStartRowAndStopRow (:132)
    assert merge((b(10), True, b(20), False), (b"", True, b"", False),
                 (b(30), True, b(70), False)) == [(b"", None)]
    # testMergeAndSortWithoutOverlap (:160)
    assert merge((b(10), True, b(20), False), (b(30), True, b(40), False),
                 (b(60), True, b(70), False)) == [
        (b(10), b(20)), (b(30), b(40)), (b(60), b(70))]
    # testMergeAndSortWithOverlap (:174)
    assert merge(
        (b(10), True, b(20), False), (b(15), True, b(40), False),
        (b(20), True, b(30), False), (b(30), True, b(50), False),
        (b(30), True, b(70), False), (b(90), True, b(100), False),
        (b(95), True, b(100), False),
    ) == [(b(10), b(70)), (b(90), b(100))]
    # testMergeAndSortWithStartRowInclusive (:191)
    assert merge((b(10), True, b(20), False), (b(20), True, b"", False)) \
        == [(b(10), None)]
    # testMergeAndSortWithRowExclusive (:203) — NOT merged
    assert merge((b(10), True, b(20), False), (b(20), False, b"", False)) \
        == [(b(10), b(20)), (b(20) + b"\x00", None)]
    # testMergeAndSortWithRowInclusive (:216) — merged across the seam
    assert merge((b(10), True, b(20), True), (b(20), False, b"", False)) \
        == [(b(10), None)]

    # constructor rejections (:144 WithoutRange, :150 WithInvalidRange)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="No ranges"):
        MultiRowRangeFilter([])
    with _pytest.raises(ValueError, match="Invalid range"):
        MultiRowRangeFilter([
            RowRange(b(10), True, b(20), False),
            RowRange(b(80), True, b(20), False),  # start > stop
            RowRange(b(30), True, b(70), False),
        ])
    # start == stop is valid ONLY with an inclusive stop (isValid :508)
    MultiRowRangeFilter([RowRange(b(10), True, b(10), True)])
    with _pytest.raises(ValueError, match="Invalid range"):
        MultiRowRangeFilter([RowRange(b(10), True, b(10), False)])


def test_bit_comparator_reference_vectors(spark):
    """BitComparator pinned to TestBitComparator.java's full vector
    table (:48-74): Equal (compareTo 0, i.e. a ValueFilter(=) match)
    iff lengths agree and some byte of (value bitop mask) is non-zero —
    including the length-mismatch rows (ones vs 5-byte data3)."""
    from hbase_1_3_0_spark.cells import CELL_SCHEMA
    from hbase_1_3_0_spark.filters.ast import (
        BitComparator,
        CompareOp,
        ValueFilter,
    )
    from hbase_1_3_0_spark.filters.compiler import apply_filter

    zeros = bytes([0] * 6)
    ones = bytes([1] * 6)
    data0 = bytes([0, 1, 2, 4, 8, 15])
    data1 = bytes([15, 0, 0, 0, 0, 0])
    data2 = bytes([0, 0, 0, 0, 0, 15])
    data3 = bytes([15] * 5)
    E, NE = True, False
    vectors = [
        (zeros, ones, "AND", NE), (data1, ones, "AND", E),
        (data1, data0, "AND", NE), (data2, data1, "AND", NE),
        (ones, data0, "AND", E), (ones, data3, "AND", NE),
        (ones, zeros, "OR", E), (zeros, zeros, "OR", NE),
        (data1, zeros, "OR", E), (data2, data1, "OR", E),
        (ones, data3, "OR", NE),
        (ones, zeros, "XOR", E), (zeros, zeros, "XOR", NE),
        (ones, ones, "XOR", NE), (data2, data1, "XOR", E),
        (ones, data3, "XOR", NE),
    ]
    rows = [
        (bytes([i]), "d", b"q", 1, 4, data, 0)
        for i, (data, _, _, _) in enumerate(vectors)
    ]
    cells = spark.createDataFrame(rows, CELL_SCHEMA)
    for i, (data, mask, op, want) in enumerate(vectors):
        out = apply_filter(
            cells,
            ValueFilter(op=CompareOp.EQUAL,
                        comparator=BitComparator(mask, op)),
        ).select("row").collect()
        got = any(bytes(r.row) == bytes([i]) for r in out)
        assert got is want, (i, data.hex(), mask.hex(), op, want)


def test_long_comparator_reference_values(spark):
    """TestLongComparator.java's value ladder (MIN_VALUE through
    MAX_VALUE) driven through the compiled ValueFilter: for every pair
    i > j, the cell holding values[j] compares LESS than
    LongComparator(values[i]) — pinning signed two's-complement
    decoding of the 8-byte big-endian payload (a raw byte compare would
    sort negatives ABOVE positives)."""
    import struct

    from hbase_1_3_0_spark.cells import CELL_SCHEMA
    from hbase_1_3_0_spark.filters.ast import (
        CompareOp,
        LongComparator,
        ValueFilter,
    )
    from hbase_1_3_0_spark.filters.compiler import apply_filter

    values = [-(2**63), -10_000_000_000, -1_000_000, 0, 1_000_000,
              10_000_000_000, 2**63 - 1]
    rows = [
        (bytes([j]), "d", b"q", 1, 4, struct.pack(">q", v), 0)
        for j, v in enumerate(values)
    ]
    cells = spark.createDataFrame(rows, CELL_SCHEMA)

    def included(op, pivot):
        out = apply_filter(
            cells,
            ValueFilter(op=op, comparator=LongComparator(pivot,
                                                         codec="be8")),
        ).select("row").collect()
        return sorted(r.row[0] for r in out)

    for i in range(1, len(values)):
        assert included(CompareOp.LESS, values[i]) == list(range(i))
    assert included(CompareOp.GREATER, values[0]) == list(range(1, 7))
    assert included(CompareOp.EQUAL, values[3]) == [3]


def test_null_comparator_reference_cases(spark):
    """TestNullComparator.java: compareTo(null) == 0 (EQUAL matches),
    compareTo(non-null) == 1 (EQUAL excludes, NOT_EQUAL includes)."""
    from hbase_1_3_0_spark.cells import CELL_SCHEMA
    from hbase_1_3_0_spark.filters.ast import (
        CompareOp,
        NullComparator,
        ValueFilter,
    )
    from hbase_1_3_0_spark.filters.compiler import apply_filter

    rows = [
        (b"\x01", "d", b"q", 1, 4, None, 0),
        (b"\x02", "d", b"q", 1, 4, bytes([0, 1, 2, 3, 4, 5]), 0),
    ]
    cells = spark.createDataFrame(rows, CELL_SCHEMA)
    eq = apply_filter(
        cells, ValueFilter(op=CompareOp.EQUAL, comparator=NullComparator())
    ).select("row").collect()
    assert [bytes(r.row) for r in eq] == [b"\x01"]
    ne = apply_filter(
        cells,
        ValueFilter(op=CompareOp.NOT_EQUAL, comparator=NullComparator()),
    ).select("row").collect()
    assert [bytes(r.row) for r in ne] == [b"\x02"]
