"""RegionSplitter algorithm parity, pinned to the reference's own unit
tests (TestRegionSplitter.java:132-213 + the 16-way pre-split bounds
:75-125)."""

import pytest

from hbase_1_3_0_spark.operators import region_splitter as rs


class TestHexStringSplit:
    def test_two_regions(self):
        assert rs.hex_string_split(2) == [b"80000000"]

    def test_three_regions(self):
        assert rs.hex_string_split(3) == [b"55555555", b"aaaaaaaa"]

    def test_sixteen_regions(self):
        # TestRegionSplitter.java:77-91 — the documented -c 16 bounds
        assert rs.hex_string_split(16) == [
            f"{h:x}0000000".encode() for h in range(1, 16)
        ]

    def test_region_midpoints(self):
        assert rs.hex_split_region(b"10000000", b"30000000") == b"20000000"
        assert rs.hex_split_region(b"00000000", b"20000000") == b"10000000"
        assert rs.hex_split_region(b"dfffffff", b"ffffffff") == b"efffffff"

    def test_user_range_preconditions(self):
        # TestRegionSplitter.java testUserInput hex cases
        rs.hex_string_split(100, first_row="00", last_row="AA")
        with pytest.raises(ValueError):
            rs.hex_string_split(100, first_row="AA", last_row="00")
        with pytest.raises(ValueError):
            rs.hex_string_split(100, first_row="AA", last_row="AA")
        rs.hex_string_split(3, first_row="0", last_row="2")
        rs.hex_string_split(11, first_row="0", last_row="A")
        with pytest.raises(ValueError):  # too granular: range 11 < 12
            rs.hex_string_split(12, first_row="0", last_row="A")

    def test_single_region_is_no_boundaries(self):
        assert rs.hex_string_split(1) == []

    def test_custom_range_pads_to_last_row_width(self):
        # rowComparisonLength follows the configured last row
        out = rs.hex_string_split(2, first_row="00", last_row="AA")
        assert out == [b"55"]


class TestUniformSplit:
    def test_two_regions(self):
        assert rs.uniform_split(2) == [b"\x80" + b"\x00" * 7]

    def test_three_regions(self):
        assert rs.uniform_split(3) == [b"\x55" * 8, b"\xaa" * 8]

    def test_sixteen_regions(self):
        assert rs.uniform_split(16) == [
            bytes([h << 4]) + b"\x00" * 7 for h in range(1, 16)
        ]

    def test_split_into_one_raises(self):
        with pytest.raises(ValueError):
            rs.uniform_split(1)

    def test_region_midpoints(self):
        assert rs.uniform_split_region(b"\x10", b"\x30") == b"\x20"
        assert rs.uniform_split_region(b"", b"\x20") == b"\x10"
        assert (
            rs.uniform_split_region(b"\xdf" + b"\xff" * 7, b"\xff" * 8)
            == b"\xef" + b"\xff" * 7
        )

    def test_small_gap_extends_resolution(self):
        # TestRegionSplitter.java:212 — gap of one key gains a byte
        assert rs.uniform_split_region(b"aaa", b"aab") == b"aaa\x80"

    def test_range_preconditions(self):
        with pytest.raises(ValueError):
            rs.uniform_split(100, first_row=b"\xaa", last_row=b"\x00")
        with pytest.raises(ValueError):
            rs.uniform_split(100, first_row=b"\xaa", last_row=b"\xaa")
        rs.uniform_split(3, first_row=b"\x00", last_row=b"\x02")
        # uniform keyspace is byte-extensible: 12 regions over a gap of
        # 10 keys recurses into an extra byte instead of failing
        out = rs.uniform_split(12, first_row=b"\x00", last_row=b"\x0a")
        assert len(out) == 11
        assert out == sorted(out)


class TestBoundariesDataFrame:
    def test_hex_matches_python(self, spark):
        got = {
            r.region_idx: r.boundary_hex
            for r in rs.split_boundaries(spark, "hex", 7).collect()
        }
        want = {
            i + 1: b.decode()
            for i, b in enumerate(rs.hex_string_split(7))
        }
        assert got == want

    def test_uniform_matches_python(self, spark):
        for n in (2, 3, 7, 64):
            got = {
                r.region_idx: r.boundary_hex
                for r in rs.split_boundaries(spark, "uniform", n).collect()
            }
            want = {
                i + 1: b.hex() for i, b in enumerate(rs.uniform_split(n))
            }
            assert got == want

    def test_rejects_unknown_algo(self, spark):
        with pytest.raises(ValueError):
            rs.split_boundaries(spark, "nope", 4)


def test_engine_presplit_wiring(spark, tmp_path):
    """split_table(algo=...) pins the computed boundaries as the
    table's split_points and the saved layout honors them."""
    from pyspark.sql import functions as F

    from hbase_1_3_0_spark.catalog import TableMeta
    from hbase_1_3_0_spark.engine import Engine

    eng = Engine(spark, root=tmp_path / "store", now_ms=1_000)
    rows = spark.range(256).select(
        F.lower(F.hex(F.col("id") * 16843009)).alias("_k")
    )
    cells = rows.select(
        F.encode(F.lpad("_k", 8, "0"), "utf-8").alias("row"),
        F.lit("f").alias("family"),
        F.lit(b"q").alias("qualifier"),
        F.lit(1000).cast("long").alias("ts"),
        F.lit(4).cast("int").alias("type"),
        F.lit(b"v").alias("value"),
        F.lit(0).cast("long").alias("seq"),
    )
    meta = TableMeta(name="presplit_demo", clean_log=True)
    t = eng.create_table(meta, cells)
    t = eng.split_table(t, 4, algo="hex")
    assert t.meta.split_points == (b"40000000", b"80000000", b"c0000000")
    regions = {r.region for r in eng.region_boundaries(t).collect()}
    assert len(regions) == 4
    # scans unaffected by layout
    assert t.cells.count() == 256


class TestRollingSplit:
    def test_uniform_doubles_boundaries(self):
        # 4 regions -> 8 via per-region midpoints. NOTE the last
        # midpoint is 0xdfff… not 0xe000…: split(start, end) halves
        # the EXCLUSIVE gap (Bytes.split num=1), which the reference's
        # own test pins ("halfway between df… and ff… is ef…") — a
        # rolling split is NOT byte-identical to a fresh 2n-way split
        # in the last region, by design.
        pts = rs.uniform_split(4)
        doubled = rs.rolling_split_points(pts, "uniform")
        e = [
            0x2000000000000000, 0x4000000000000000, 0x6000000000000000,
            0x8000000000000000, 0xA000000000000000, 0xC000000000000000,
            0xDFFFFFFFFFFFFFFF,
        ]
        assert doubled == [v.to_bytes(8, "big") for v in e]

    def test_hex_doubles_boundaries(self):
        pts = rs.hex_string_split(4)
        doubled = rs.rolling_split_points(pts, "hex")
        assert doubled == [
            b"20000000", b"40000000", b"60000000", b"80000000",
            b"a0000000", b"c0000000", b"dfffffff",
        ]

    def test_unknown_algo(self):
        with pytest.raises(ValueError):
            rs.rolling_split_points([b"\x80"], "nope")


def test_engine_rolling_split(spark, tmp_path):
    from pyspark.sql import functions as F

    from hbase_1_3_0_spark.catalog import TableMeta
    from hbase_1_3_0_spark.engine import Engine

    eng = Engine(spark, root=tmp_path / "store", now_ms=1_000)
    rows = spark.range(256).select(
        F.lower(F.hex(F.col("id") * 16843009)).alias("_k")
    )
    cells = rows.select(
        F.encode(F.lpad("_k", 8, "0"), "utf-8").alias("row"),
        F.lit("f").alias("family"),
        F.lit(b"q").alias("qualifier"),
        F.lit(1000).cast("long").alias("ts"),
        F.lit(4).cast("int").alias("type"),
        F.lit(b"v").alias("value"),
        F.lit(0).cast("long").alias("seq"),
    )
    t = eng.create_table(TableMeta(name="roll_demo", clean_log=True), cells)
    with pytest.raises(ValueError):
        eng.rolling_split(t, algo="hex")  # not pre-split yet
    t = eng.split_table(t, 4, algo="hex")
    t = eng.rolling_split(t, algo="hex")
    assert t.meta.split_points == tuple(
        rs.rolling_split_points(rs.hex_string_split(4), "hex")
    )
    assert len({r.region for r in eng.region_boundaries(t).collect()}) == 8
    assert t.cells.count() == 256
