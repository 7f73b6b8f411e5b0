"""Byte-encoding helpers — the `Bytes` / `OrderedBytes` analog, as Column exprs.

Reference encodings (SURVEY.md §1.3):
- ``Bytes`` big-endian fixed-width encodings (Bytes.java:529/:562/:762/:1068).
  Counters are 8-byte big-endian longs (used by Increment, HRegion.java:7665).
- ``OrderedBytes`` order-preserving encodings for composite row keys
  (OrderedBytes.java:271, types/Struct.java).

Everything here is a JVM-side Column expression (no Python UDFs): encoding and
decoding stay inside whole-stage codegen so KV fixtures can be built from
100 TB of parquet without leaving the executor JVM.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TWO_POW_64 = 18446744073709551616  # 2**64
_LONG_MAX = (1 << 63) - 1

# ---------------------------------------------------------------------------
# Bytes.toBytes(long) analog: 8-byte big-endian two's complement
# ---------------------------------------------------------------------------


def encode_long_be(col: Column) -> Column:
    """long -> 8-byte big-endian binary (Bytes.toBytes(long), Bytes.java:562).

    ``hex`` of a LongType yields the two's-complement big-endian hex string;
    left-padding to 16 nibbles and ``unhex`` gives the exact 8-byte encoding.
    """
    return F.unhex(F.lpad(F.hex(col.cast(T.LongType())), 16, "0"))


def decode_long_be(col: Column) -> Column:
    """8-byte big-endian binary -> long (Bytes.toLong, Bytes.java:578)."""
    unsigned = F.conv(F.hex(col), 16, 10).cast(T.DecimalType(22, 0))
    # literals > Long.MAX_VALUE must travel as strings
    two_pow_64 = F.lit(str(_TWO_POW_64)).cast(T.DecimalType(22, 0))
    signed = F.when(
        unsigned > F.lit(_LONG_MAX).cast(T.DecimalType(22, 0)),
        unsigned - two_pow_64,
    ).otherwise(unsigned)
    return signed.cast(T.LongType())


def encode_int_be(col: Column) -> Column:
    """int -> 4-byte big-endian binary (Bytes.toBytes(int), Bytes.java:762)."""
    lo32 = col.cast(T.LongType()).bitwiseAND(F.lit(0xFFFFFFFF))
    return F.unhex(F.lpad(F.hex(lo32), 8, "0"))


def decode_int_be(col: Column) -> Column:
    unsigned = F.conv(F.hex(col), 16, 10).cast(T.LongType())
    return (
        F.when(unsigned > F.lit(0x7FFFFFFF), unsigned - F.lit(0x100000000))
        .otherwise(unsigned)
        .cast(T.IntegerType())
    )


# ---------------------------------------------------------------------------
# Strings: UTF-8 (Bytes.toBytes(String), Bytes.java:529)
# ---------------------------------------------------------------------------


def encode_string(col: Column) -> Column:
    return F.encode(col.cast(T.StringType()), "UTF-8")


def decode_string(col: Column) -> Column:
    """Binary -> string for comparator/regex evaluation.

    A CAST, not decode(): Spark 4's ANSI ``decode`` raises
    MALFORMED_CHARACTER_CODING on invalid UTF-8, but the reference's
    string comparators do ``new String(value)`` which never throws
    (RegexStringComparator.java:296, SubstringComparator.java:46) — a
    scan with a substring filter must not abort because one cell holds
    non-text bytes. The cast keeps raw bytes in the UTF8String, so
    contains/rlike still match byte-wise."""
    return col.cast("string")


# ---------------------------------------------------------------------------
# Order-preserving composite row keys (the OrderedBytes / Struct analog).
#
# Non-negative integral segments are encoded as fixed-width zero-padded
# decimal ASCII; string segments pass through. Segments join with 0x7c ('|'),
# which sorts below digits' successors consistently for fixed-width segments.
# Unsigned-lexicographic order over the resulting bytes == field-wise numeric
# order, mirroring OrderedBytes.encodeNumeric / types/Struct.java:67 composite
# sort semantics, while staying decodable with builtin split/cast.
# ---------------------------------------------------------------------------

KEY_SEGMENT_WIDTH = 19  # enough for any non-negative int64
KEY_SEPARATOR = "|"


def key_segment_num(col: Column) -> Column:
    """Non-negative integer -> fixed-width sortable decimal string segment."""
    return F.lpad(col.cast(T.StringType()), KEY_SEGMENT_WIDTH, "0")


def ordered_key(*segments: Column) -> Column:
    """Compose segments into a sortable binary row key."""
    if len(segments) == 1:
        return F.encode(segments[0], "UTF-8")
    return F.encode(F.concat_ws(KEY_SEPARATOR, *segments), "UTF-8")


def ordered_key_num(*cols: Column) -> Column:
    """Numeric composite key: each column padded, joined, UTF-8 encoded."""
    return ordered_key(*[key_segment_num(c) for c in cols])


def decode_key_segment(row: Column, index: int) -> Column:
    """Extract segment ``index`` (0-based) of an ordered key as a string."""
    return F.split(F.decode(row, "UTF-8"), "\\" + KEY_SEPARATOR).getItem(index)


def decode_key_num(row: Column, index: int = 0) -> Column:
    """Extract a numeric segment back to LongType."""
    return decode_key_segment(row, index).cast(T.LongType())


# ---------------------------------------------------------------------------
# Signed / fractional order-preserving segments — the OrderedBytes numeric
# scheme (OrderedBytes.java:768 encodes sign + complement so negatives sort
# before positives and composite Struct keys order field-wise,
# types/Struct.java:67). Here the same total order comes from a fixed-point
# bias: scale to an integer, add 10^19 (covers the whole int64 range), and
# render fixed-width — unsigned-lexicographic order over the digits equals
# numeric order, and the segment decodes with builtin arithmetic.
# ---------------------------------------------------------------------------

ORDERED_SIGNED_WIDTH = 20
_SIGNED_BIAS = 10**19


def key_segment_signed(col: Column, *, scale: int = 0) -> Column:
    """Signed numeric -> fixed-width order-preserving decimal segment.

    ``scale`` is the number of fractional digits preserved (fixed-point):
    ``scale=2`` encodes -123.45 as the biased integer -12345 + 10^19.
    Valid for the entire signed-64-bit scaled range."""
    c = col.cast(T.DoubleType()) * F.lit(10**scale) if scale else col
    scaled = F.round(c).cast(T.DecimalType(38, 0))
    biased = scaled + F.lit(str(_SIGNED_BIAS)).cast(T.DecimalType(38, 0))
    return F.lpad(biased.cast(T.StringType()), ORDERED_SIGNED_WIDTH, "0")


def encode_signed_segment(value: float | int, *, scale: int = 0) -> bytes:
    """Driver-side literal form of :func:`key_segment_signed` — for building
    scan range boundaries over signed composite keys."""
    scaled = round(value * 10**scale)
    return f"{scaled + _SIGNED_BIAS:0{ORDERED_SIGNED_WIDTH}d}".encode()


def decode_key_signed(row: Column, index: int = 0, *, scale: int = 0) -> Column:
    """Extract a signed fixed-point segment back to a numeric column
    (LongType for scale=0, DoubleType otherwise)."""
    seg = decode_key_segment(row, index).cast(T.DecimalType(38, 0))
    unbiased = seg - F.lit(str(_SIGNED_BIAS)).cast(T.DecimalType(38, 0))
    if scale == 0:
        return unbiased.cast(T.LongType())
    return (unbiased.cast(T.DoubleType()) / F.lit(10**scale)).cast(T.DoubleType())


def encode_ordered_long(col: Column) -> Column:
    """Signed long -> 8 bytes whose unsigned-lexicographic order equals
    numeric order — the OrderedBytes int64 sign-bit-flip scheme
    (OrderedBytes.java:768): XOR the sign bit, emit big-endian."""
    flipped = col.cast(T.LongType()).bitwiseXOR(F.lit(-(1 << 63)))
    return F.unhex(F.lpad(F.hex(flipped), 16, "0"))


def decode_ordered_long(col: Column) -> Column:
    """Inverse of :func:`encode_ordered_long`."""
    unsigned = F.conv(F.hex(col), 16, 10).cast(T.DecimalType(22, 0))
    half = F.lit(str(1 << 63)).cast(T.DecimalType(22, 0))
    return (unsigned - half).cast(T.LongType())


# ---------------------------------------------------------------------------
# Canonical value codec for typed fixtures: values round-trip through their
# canonical string rendering (decodable with a plain cast). Raw-fidelity
# binary values use the *_be codecs above.
# ---------------------------------------------------------------------------


def encode_value(col: Column) -> Column:
    """Any atomic column -> canonical UTF-8 binary value."""
    return F.encode(col.cast(T.StringType()), "UTF-8")


def decode_value(col: Column, datatype: T.DataType | str) -> Column:
    """Canonical binary value -> typed column.

    ``try_cast`` semantics: a cell whose bytes don't parse as the target
    type decodes to NULL instead of aborting the whole scan (Spark 4's
    ANSI cast throws on malformed input; a distributed scan must tolerate
    one stray non-numeric cell in a dynamically-typed family — null then
    fails whatever comparison consumes it, the reference's
    per-cell-verdict behavior). The binary->string step is a cast too:
    ANSI decode() rejects non-UTF8 bytes."""
    dt = T._parse_datatype_string(datatype) if isinstance(datatype, str) else datatype
    return col.cast(T.StringType()).try_cast(dt)
