"""Filter AST — the complete HBase 1.3.0 filter algebra as dataclasses.

Mirrors hbase-client/.../filter/ (SURVEY.md §2.2): the per-cell verdict
contract of Filter.java:58 plus the row-level hooks (filterRow,
filterAllRemaining) become, in Spark, (a) boolean Column expressions —
possibly window-based for row-level verdicts — and (b) whole-DataFrame
transforms for the order-dependent filters (PageFilter, WhileMatchFilter).
The compiler lives in :mod:`hbase_1_3_0_spark.filters.compiler`.

The ReturnCode seek hints (SEEK_NEXT_USING_HINT etc., Filter.java:151-176)
are *physical* instructions; their Spark analog is Catalyst predicate
pushdown + parquet min/max skipping, so the AST only carries logical
semantics (SURVEY.md §4).
"""

from __future__ import annotations

from dataclasses import dataclass, field

__all__ = [
    "CompareOp",
    "Comparator",
    "BinaryComparator",
    "BinaryPrefixComparator",
    "BitComparator",
    "LongComparator",
    "NullComparator",
    "RegexStringComparator",
    "SubstringComparator",
    "Filter",
    "FilterList",
    "RowFilter",
    "FamilyFilter",
    "QualifierFilter",
    "ValueFilter",
    "SingleColumnValueFilter",
    "SingleColumnValueExcludeFilter",
    "DependentColumnFilter",
    "PrefixFilter",
    "ColumnPrefixFilter",
    "MultipleColumnPrefixFilter",
    "ColumnRangeFilter",
    "ColumnPaginationFilter",
    "ColumnCountGetFilter",
    "PageFilter",
    "InclusiveStopFilter",
    "TimestampsFilter",
    "KeyOnlyFilter",
    "FirstKeyOnlyFilter",
    "FirstKeyValueMatchingQualifiersFilter",
    "FuzzyRowFilter",
    "MultiRowRangeFilter",
    "RowRange",
    "RandomRowFilter",
    "SkipFilter",
    "WhileMatchFilter",
]


class CompareOp:
    """CompareFilter.CompareOp (CompareFilter.java:55-69)."""

    LESS = "LESS"
    LESS_OR_EQUAL = "LESS_OR_EQUAL"
    EQUAL = "EQUAL"
    NOT_EQUAL = "NOT_EQUAL"
    GREATER_OR_EQUAL = "GREATER_OR_EQUAL"
    GREATER = "GREATER"
    NO_OP = "NO_OP"

    ALL = (LESS, LESS_OR_EQUAL, EQUAL, NOT_EQUAL, GREATER_OR_EQUAL, GREATER, NO_OP)


# ---------------------------------------------------------------------------
# Comparators (ByteArrayComparable.java:32 subclasses)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Comparator:
    pass


@dataclass(frozen=True)
class BinaryComparator(Comparator):
    """Bytes.compareTo semantics — unsigned lexicographic (BinaryComparator.java:35)."""

    value: bytes


@dataclass(frozen=True)
class BinaryPrefixComparator(Comparator):
    """Compare only up to len(prefix) bytes (BinaryPrefixComparator.java:36)."""

    value: bytes


@dataclass(frozen=True)
class BitComparator(Comparator):
    """Bitwise op against a mask; EQUAL <=> value length == mask length AND
    (operand bitop mask) has a non-zero byte (BitComparator.java:112-118).
    Arbitrary mask lengths; compiled to per-byte JVM expressions."""

    value: bytes
    bit_op: str = "AND"  # AND | OR | XOR


@dataclass(frozen=True)
class LongComparator(Comparator):
    """Numeric comparison of an encoded long (LongComparator.java:34).

    ``codec``: 'be8' = 8-byte big-endian (Bytes.toBytes(long)); 'utf8' =
    canonical decimal string (this engine's fixture value codec)."""

    value: int
    codec: str = "be8"


@dataclass(frozen=True)
class NullComparator(Comparator):
    """EQUAL <=> value is absent (NullComparator.java:35)."""


# java.util.regex.Pattern flag bits (the public Pattern constants) — the
# reference's RegexStringComparator constructors take this bit mask
# verbatim (RegexStringComparator.java:113-137) and the no-flags
# constructor defaults to DOTALL (:97-99).
PATTERN_UNIX_LINES = 0x01
PATTERN_CASE_INSENSITIVE = 0x02
PATTERN_COMMENTS = 0x04
PATTERN_MULTILINE = 0x08
PATTERN_LITERAL = 0x10
PATTERN_DOTALL = 0x20
PATTERN_UNICODE_CASE = 0x40
PATTERN_CANON_EQ = 0x80
PATTERN_UNICODE_CHARACTER_CLASS = 0x100


@dataclass(frozen=True)
class RegexStringComparator(Comparator):
    """Regex find() over the decoded value (RegexStringComparator.java:76).

    Both reference engines parse *Java* regex syntax — the JONI engine is
    constructed with ``Syntax.Java`` (RegexStringComparator.java:338), NOT
    Ruby syntax — so both compile to Spark ``rlike`` (java.util.regex on
    the JVM). The observable engine deltas ARE emulated:

    * ``flags``: JAVA honors the full Pattern mask; JONI keeps only
      CASE_INSENSITIVE / DOTALL / MULTILINE and silently drops the rest
      (patternToJoniFlags, RegexStringComparator.java:380-396) — so e.g.
      LITERAL or COMMENTS under JONI changes match results.
    * ``charset``: JAVA = any JVM charset (Charset.forName, :296), JONI =
      jcodings EncodingDB lookup (:417-424). This engine implements the
      two the reference javadoc names (UTF-8 default, ISO-8859-1 for
      arbitrary bytes, :143-145) and rejects others explicitly.
    * JONI lacks the JVM-runtime property classes ``\\p{javaXxx}``
      (java.util.regex-only extension); compiling one under JONI raises.

    Default flags = DOTALL, matching the reference's 1-arg constructor."""

    pattern: str
    flags: int = PATTERN_DOTALL
    engine: str = "JAVA"  # JAVA | JONI (EngineType, :85-89)
    charset: str = "UTF-8"


@dataclass(frozen=True)
class SubstringComparator(Comparator):
    """Case-insensitive substring match (SubstringComparator.java:46)."""

    substr: str


# ---------------------------------------------------------------------------
# Filters
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Filter:
    pass


@dataclass(frozen=True)
class FilterList(Filter):
    """MUST_PASS_ALL (AND, lazy) / MUST_PASS_ONE (OR) tree (FilterList.java:56)."""

    operator: str  # MUST_PASS_ALL | MUST_PASS_ONE
    filters: tuple[Filter, ...]

    def __init__(self, operator: str, filters) -> None:
        object.__setattr__(self, "operator", operator)
        object.__setattr__(self, "filters", tuple(filters))


@dataclass(frozen=True)
class _CompareFilter(Filter):
    op: str = CompareOp.EQUAL
    comparator: Comparator = field(default_factory=lambda: NullComparator())


@dataclass(frozen=True)
class RowFilter(_CompareFilter):
    """Compare the entire row key (RowFilter.java:49)."""


@dataclass(frozen=True)
class FamilyFilter(_CompareFilter):
    """Compare the column family (FamilyFilter.java:50)."""


@dataclass(frozen=True)
class QualifierFilter(_CompareFilter):
    """Compare the qualifier (QualifierFilter.java:50)."""


@dataclass(frozen=True)
class ValueFilter(_CompareFilter):
    """Compare the cell value (ValueFilter.java:48)."""


@dataclass(frozen=True)
class SingleColumnValueFilter(Filter):
    """Row-level verdict from one column's (latest) value
    (SingleColumnValueFilter.java:73)."""

    family: str
    qualifier: bytes
    op: str
    comparator: Comparator
    filter_if_missing: bool = False
    latest_version_only: bool = True


@dataclass(frozen=True)
class SingleColumnValueExcludeFilter(SingleColumnValueFilter):
    """Same, but the tested column is excluded from the output
    (SingleColumnValueExcludeFilter.java:46)."""


@dataclass(frozen=True)
class DependentColumnFilter(Filter):
    """Inter-column timestamp matching: keep cells whose ts appears on the
    reference column in the same row (DependentColumnFilter.java:50)."""

    family: str
    qualifier: bytes
    drop_dependent_column: bool = False
    op: str | None = None
    comparator: Comparator | None = None


@dataclass(frozen=True)
class PrefixFilter(Filter):
    """Rows with the given key prefix (PrefixFilter.java:40)."""

    prefix: bytes


@dataclass(frozen=True)
class ColumnPrefixFilter(Filter):
    """Qualifiers with one prefix (ColumnPrefixFilter.java:43)."""

    prefix: bytes


@dataclass(frozen=True)
class MultipleColumnPrefixFilter(Filter):
    """Qualifiers matching any of N prefixes (MultipleColumnPrefixFilter.java:42)."""

    prefixes: tuple[bytes, ...]

    def __init__(self, prefixes) -> None:
        object.__setattr__(self, "prefixes", tuple(prefixes))


@dataclass(frozen=True)
class ColumnRangeFilter(Filter):
    """Qualifier in [min, max] with inclusivity flags (ColumnRangeFilter.java:52)."""

    min_column: bytes | None = None
    min_inclusive: bool = True
    max_column: bytes | None = None
    max_inclusive: bool = False


@dataclass(frozen=True)
class ColumnPaginationFilter(Filter):
    """Per-row LIMIT/OFFSET over columns (ColumnPaginationFilter.java:43).

    ``column_offset`` is the byte[] bookmark variant
    (ColumnPaginationFilter.java:77): pagination starts at the first column
    (in (family, qualifier) order) whose qualifier >= ``column_offset`` and
    returns ``limit`` columns from there, possibly spanning families.
    Mutually exclusive with ``offset``."""

    limit: int
    offset: int = 0
    column_offset: bytes | None = None


@dataclass(frozen=True)
class ColumnCountGetFilter(Filter):
    """First N columns of each row (ColumnCountGetFilter.java:41)."""

    limit: int


@dataclass(frozen=True)
class PageFilter(Filter):
    """Row LIMIT (PageFilter.java:45). HBase applies it per-region (client may
    see up to pageSize x regions, PageFilter.java:75-80); this engine applies
    the *exact global* semantics: first ``page_size`` rows in row-key order."""

    page_size: int


@dataclass(frozen=True)
class InclusiveStopFilter(Filter):
    """Make the scan stop row inclusive (InclusiveStopFilter.java:43)."""

    stop_row: bytes


@dataclass(frozen=True)
class TimestampsFilter(Filter):
    """Cells whose ts is in an explicit set (TimestampsFilter.java:45)."""

    timestamps: tuple[int, ...]

    def __init__(self, timestamps) -> None:
        object.__setattr__(self, "timestamps", tuple(timestamps))


@dataclass(frozen=True)
class KeyOnlyFilter(Filter):
    """Strip values (KeyOnlyFilter.java:46); ``len_as_val`` returns the value
    length as a 4-byte int instead."""

    len_as_val: bool = False


@dataclass(frozen=True)
class FirstKeyOnlyFilter(Filter):
    """Only the first cell of each row (FirstKeyOnlyFilter.java:39)."""


@dataclass(frozen=True)
class FirstKeyValueMatchingQualifiersFilter(Filter):
    """Row's cells up to (and including) the first whose qualifier is in the
    set (FirstKeyValueMatchingQualifiersFilter.java:49)."""

    qualifiers: tuple[bytes, ...]

    def __init__(self, qualifiers) -> None:
        object.__setattr__(self, "qualifiers", tuple(qualifiers))


@dataclass(frozen=True)
class FuzzyRowFilter(Filter):
    """Row-key mask match (FuzzyRowFilter.java:62): per (pattern, mask) pair,
    mask byte 0 = position must equal pattern byte, 1 = wildcard."""

    pairs: tuple[tuple[bytes, bytes], ...]

    def __init__(self, pairs) -> None:
        object.__setattr__(self, "pairs", tuple((bytes(p), bytes(m)) for p, m in pairs))


@dataclass(frozen=True)
class RowRange:
    """MultiRowRangeFilter.RowRange (MultiRowRangeFilter.java:420)."""

    start_row: bytes | None = None
    start_inclusive: bool = True
    stop_row: bytes | None = None
    stop_inclusive: bool = False


@dataclass(frozen=True)
class MultiRowRangeFilter(Filter):
    """Union of row ranges in one pass (MultiRowRangeFilter.java:54).

    Constructor-time validation mirrors sortAndMerge (:254): an empty
    list raises "No ranges found.", and any range failing
    RowRange.isValid (:508 — valid iff start or stop is empty, start <
    stop, or start == stop with an inclusive stop) raises, exactly as
    TestMultiRowRangeFilter's testMultiRowRangeWithoutRange /
    WithInvalidRange expect."""

    ranges: tuple[RowRange, ...]

    def __init__(self, ranges) -> None:
        ranges = tuple(ranges)
        if not ranges:
            raise ValueError("No ranges found.")
        bad = [r for r in ranges if not _row_range_valid(r)]
        if bad:
            raise ValueError(f"Invalid range: {bad[0]!r}")
        object.__setattr__(self, "ranges", ranges)


def _row_range_valid(r: "RowRange") -> bool:
    """RowRange.isValid (MultiRowRangeFilter.java:508)."""
    start = r.start_row or b""
    stop = r.stop_row or b""
    return (
        start == b"" or stop == b"" or start < stop
        or (start == stop and r.stop_inclusive)
    )


@dataclass(frozen=True)
class RandomRowFilter(Filter):
    """Include each row with probability ``chance`` (RandomRowFilter.java:38).
    Deterministic per row key given ``seed`` (so the verdict is row-consistent
    and reproducible — unlike the reference's Random.nextFloat)."""

    chance: float
    seed: int = 42


@dataclass(frozen=True)
class SkipFilter(Filter):
    """Drop the whole row if the wrapped filter rejects ANY cell in it
    (SkipFilter.java:56)."""

    wrapped: Filter


@dataclass(frozen=True)
class WhileMatchFilter(Filter):
    """Scan terminates at the first row the wrapped filter rejects — the
    result is the passing prefix in row-key order (WhileMatchFilter.java:43)."""

    wrapped: Filter
