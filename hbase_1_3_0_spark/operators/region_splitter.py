"""RegionSplitter pre-split algorithms — HexStringSplit + UniformSplit.

Reference: hbase-server/src/main/java/org/apache/hadoop/hbase/util/
RegionSplitter.java (HexStringSplit :887, UniformSplit :1040) and the
byte-space midpoint walk it delegates to, hbase-common Bytes.java
iterateOnSplits (:1732).

Users pre-split a table before every bulk load; these two algorithms
are the stock boundary generators (``-c N <table> HexStringSplit`` /
``UniformSplit`` in the reference CLI). The boundary computation is
client-side metadata math in the reference and stays driver-side pure
Python here — a boundary list is O(num_regions) keys, never data-
sized. The generated boundaries feed ``TableMeta.split_points``
(catalog.py:47), which the cell-log writer turns into range-partition
boundaries (sources/writer.py) — i.e. the pre-split IS the parquet
layout, exactly as a region boundary is an HFile boundary.

For the driver oracle, :func:`split_boundaries` re-states the same
arithmetic as a DataFrame over ``spark.range`` with pure JVM integer
expressions, so DuckDB can mirror it exactly (hex/uniform boundary
math is integer division + hex formatting in both engines).

Semantics pinned to the reference's own unit tests
(TestRegionSplitter.java:132-213):

- HexStringSplit keys are LOWERCASE hex strings left-padded to the
  last-row width (BigInteger.toString(16) is lowercase);
  ``split(3) -> ["55555555", "aaaaaaaa"]``, region-pair midpoint
  ``split("10000000","30000000") -> "20000000"``.
- UniformSplit keys are raw bytes; ``split(3)`` -> 0x55*8, 0xAA*8;
  ``split(b"aaa", b"aab") -> b"aaa\\x80"`` (the zero-extension
  recursion when the gap is smaller than the fan-out).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "hex_string_split",
    "hex_split_region",
    "uniform_split",
    "uniform_split_region",
    "split_boundaries",
]

_HEX_FIRST = "00000000"
_HEX_LAST = "FFFFFFFF"
_UNIFORM_FIRST = b""
_UNIFORM_LAST = b"\xff" * 8


# -- HexStringSplit ---------------------------------------------------------


def _hex_to_int(row: str | bytes) -> int:
    if isinstance(row, bytes):
        row = row.decode("ascii")
    return int(row, 16) if row else 0


def _int_to_hex_key(value: int, pad: int) -> bytes:
    # BigInteger.toString(16) + leftPad('0', rowComparisonLength)
    return format(value, "x").rjust(pad, "0").encode("ascii")


def hex_string_split(
    num_regions: int,
    *,
    first_row: str = _HEX_FIRST,
    last_row: str = _HEX_LAST,
) -> list[bytes]:
    """HexStringSplit.split(n) (RegionSplitter.java:904): n-1 ASCII-hex
    boundaries at ``first + i * ((last - first + 1) div n)`` — the last
    region absorbs the slop, exactly as the reference notes."""
    first, last = _hex_to_int(first_row), _hex_to_int(last_row)
    if last <= first:
        raise ValueError(
            f"last row ({last_row}) is configured less than first row "
            f"({first_row})"
        )
    key_range = last - first + 1
    if key_range < num_regions:
        raise ValueError(
            f"split granularity ({num_regions}) is greater than the range "
            f"({key_range})"
        )
    size = key_range // num_regions
    pad = len(last_row)
    return [
        _int_to_hex_key(first + size * i, pad) for i in range(1, num_regions)
    ]


def hex_split_region(
    start: str | bytes, end: str | bytes, *, pad: int = 8
) -> bytes:
    """HexStringSplit.split(start, end): the hex midpoint
    ``(start + end) div 2`` of one region (RegionSplitter.java:897,
    split2 :975) — the rolling-split primitive."""
    e = _hex_to_int(end)
    if e == 0:
        raise ValueError("end row must be non-zero")
    return _int_to_hex_key(abs(_hex_to_int(start) + e) // 2, pad)


# -- UniformSplit (byte-space walk, Bytes.iterateOnSplits parity) -----------


def _iterate_on_splits(
    a: bytes, b: bytes, inclusive: bool, num: int
) -> list[bytes]:
    """Interior points of Bytes.iterateOnSplits(a, b, inclusive, num)
    (Bytes.java:1732): pad the shorter key with trailing zeros, view
    both as big-endian integers behind a {1, 0} header (keeps leading
    zero bytes significant), divide the gap into num+1 equal intervals
    (floor), and re-materialize each interior point by stripping the
    header the way BigInteger.toByteArray lays it out. When the gap is
    too small for the fan-out, recurse with one more zero byte of
    resolution — that is how ``split(b"aaa", b"aab")`` yields
    ``b"aaa\\x80"``."""
    if len(a) < len(b):
        a = a + b"\x00" * (len(b) - len(a))
    elif len(b) < len(a):
        b = b + b"\x00" * (len(a) - len(b))
    if a >= b:
        raise ValueError("b <= a")
    if num <= 0:
        raise ValueError("num cannot be <= 0")
    start = int.from_bytes(b"\x01\x00" + a, "big")
    stop = int.from_bytes(b"\x01\x00" + b, "big")
    diff = stop - start + (1 if inclusive else 0)
    if diff < num + 1:
        return _iterate_on_splits(a + b"\x00", b + b"\x00", inclusive, num)
    interval = diff // (num + 1)
    out = []
    for i in range(1, num + 1):
        cur = start + interval * i
        raw = cur.to_bytes((cur.bit_length() + 7) // 8, "big")
        out.append(raw[2:] if raw[1] == 0 else raw[1:])
    return out


def uniform_split(
    num_regions: int,
    *,
    first_row: bytes = _UNIFORM_FIRST,
    last_row: bytes = _UNIFORM_LAST,
) -> list[bytes]:
    """UniformSplit.split(numRegions) (RegionSplitter.java:1049):
    numRegions-1 raw-byte boundaries dividing [first, last] INCLUSIVE
    into equal intervals — with the 8x0xFF default, boundary i is the
    8-byte big-endian value ``i * (2^64 div numRegions)``."""
    if last_row <= first_row:
        raise ValueError("last row is configured less than first row")
    return _iterate_on_splits(first_row, last_row, True, num_regions - 1)


def uniform_split_region(start: bytes, end: bytes) -> bytes:
    """UniformSplit.split(start, end) = Bytes.split(start, end, 1)[1]
    (RegionSplitter.java:1045): the byte-space midpoint of one
    region."""
    return _iterate_on_splits(start, end, False, 1)[0]


def rolling_split_points(
    points: tuple[bytes, ...] | list[bytes], algo: str
) -> list[bytes]:
    """RegionSplitter's rolling split (`-r`, RegionSplitter.java:436
    rollingSplit): split EVERY region of a pre-split table at its
    algorithm midpoint, doubling the region count. Input is the
    table's current boundary list; output is the merged boundary list
    (old boundaries + one midpoint per region, outermost regions
    bounded by the algorithm's firstRow/lastRow). The reference
    performs the same per-region `split(start, end)` calls, just
    throttled against live regionservers — the boundary math is
    identical and is all that exists here (adoption is the engine's
    range-repartition rewrite)."""
    bounds = sorted(points)
    if algo == "hex":
        lo, hi = _HEX_FIRST, _HEX_LAST.lower()
        edges = [lo.encode()] + list(bounds) + [hi.encode()]
        mids = [
            hex_split_region(edges[i], edges[i + 1], pad=len(_HEX_LAST))
            for i in range(len(edges) - 1)
        ]
    elif algo == "uniform":
        edges = [_UNIFORM_FIRST] + list(bounds) + [_UNIFORM_LAST]
        mids = [
            uniform_split_region(edges[i], edges[i + 1])
            for i in range(len(edges) - 1)
        ]
    else:
        raise ValueError(f"unknown split algorithm: {algo}")
    return sorted(set(bounds) | set(mids))


# -- Oracle-checkable DataFrame form ---------------------------------------


def split_boundaries(
    spark: SparkSession, algo: str, num_regions: int
) -> DataFrame:
    """The default-keyspace boundary tables of BOTH algorithms as one
    DataFrame computation: (algo, num_regions, region_idx,
    boundary_hex) for region_idx in 1..n-1.

    Pure JVM integer expressions over ``spark.range`` — no collect, no
    UDF — chosen so a SQL oracle can restate the identical arithmetic:

    - hex: boundary = lpad(lower(hex(i * (2^32 div n))), 8, '0')
    - uniform: i * (2^64 div n) exceeds a signed long, so the 64-bit
      product is carried in two 32-bit halves with explicit carry
      (pure long math, overflow-free for any realistic n), and
      formatted as 16 hex chars = the 8 boundary bytes.

    The constant ``2^x div n`` quotients are computed driver-side in
    arbitrary-precision Python (they are parameters, not data).
    """
    if num_regions < 2:
        raise ValueError("num_regions must be >= 2")
    ids = spark.range(1, num_regions).select(F.col("id").cast("long"))
    n_col = F.lit(num_regions).cast("long").alias("num_regions")
    if algo == "hex":
        q = (1 << 32) // num_regions
        return ids.select(
            F.lit("hex").alias("algo"),
            n_col,
            F.col("id").alias("region_idx"),
            F.lpad(F.lower(F.hex(F.col("id") * F.lit(q))), 8, "0").alias(
                "boundary_hex"
            ),
        )
    if algo == "uniform":
        q = (1 << 64) // num_regions
        qh, ql = q >> 32, q & 0xFFFFFFFF
        lo_full = F.col("id") * F.lit(ql)  # < 2^63 for any sane n
        carry = F.shiftrightunsigned(lo_full, 32)
        lo = lo_full.bitwiseAND(F.lit(0xFFFFFFFF))
        hi = F.col("id") * F.lit(qh) + carry
        return ids.select(
            F.lit("uniform").alias("algo"),
            n_col,
            F.col("id").alias("region_idx"),
            F.concat(
                F.lpad(F.lower(F.hex(hi)), 8, "0"),
                F.lpad(F.lower(F.hex(lo)), 8, "0"),
            ).alias("boundary_hex"),
        )
    raise ValueError(f"unknown split algorithm: {algo}")
