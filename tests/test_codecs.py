"""Round-trip and ordering properties of the byte codecs (Bytes.java analogs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hbase_1_3_0_spark.functions import codecs


def test_long_be_roundtrip(spark):
    vals = [0, 1, -1, 42, -42, 2**62, -(2**62), (1 << 63) - 1, -(1 << 63)]
    df = spark.createDataFrame([(v,) for v in vals], "v: long")
    out = df.select(
        codecs.decode_long_be(codecs.encode_long_be(F.col("v"))).alias("rt"),
        "v",
    ).collect()
    for r in out:
        assert r.rt == r.v, f"{r.v} round-tripped to {r.rt}"


def test_long_be_matches_python_big_endian(spark):
    # must equal int.to_bytes(8, 'big', signed=True) — Bytes.toBytes(long)
    vals = [0, 1, -1, 255, 256, -256, 123456789, -987654321]
    df = spark.createDataFrame([(v,) for v in vals], "v: long")
    rows = df.select("v", codecs.encode_long_be(F.col("v")).alias("b")).collect()
    for r in rows:
        assert bytes(r.b) == r.v.to_bytes(8, "big", signed=True)


def test_int_be_roundtrip(spark):
    vals = [0, 1, -1, 2**31 - 1, -(2**31)]
    df = spark.createDataFrame([(v,) for v in vals], "v: int")
    out = df.select(
        codecs.decode_int_be(codecs.encode_int_be(F.col("v"))).alias("rt"), "v"
    ).collect()
    for r in out:
        assert r.rt == r.v


def test_ordered_key_sorts_numerically(spark):
    # unsigned-lexicographic byte order over encoded keys == numeric order
    vals = [0, 1, 9, 10, 99, 100, 12345, 10**18]
    df = spark.createDataFrame([(v,) for v in vals], "v: long")
    keys = df.select(
        "v", codecs.ordered_key_num(F.col("v")).alias("k")
    ).orderBy("k")
    assert [r.v for r in keys.collect()] == sorted(vals)


def test_composite_key_roundtrip(spark):
    df = spark.createDataFrame([(7, 3), (7, 10), (8, 1)], "a: long, b: long")
    out = (
        df.select(codecs.ordered_key_num(F.col("a"), F.col("b")).alias("k"))
        .select(
            codecs.decode_key_num(F.col("k"), 0).alias("a"),
            codecs.decode_key_num(F.col("k"), 1).alias("b"),
            "k",
        )
        .orderBy("k")
        .collect()
    )
    assert [(r.a, r.b) for r in out] == [(7, 3), (7, 10), (8, 1)]


def test_value_codec_roundtrip_types(spark):
    df = spark.createDataFrame(
        [(1, "x", 2.5, True)], "i: long, s: string, d: double, b: boolean"
    )
    enc = df.select(
        codecs.decode_value(codecs.encode_value(F.col("i")), "bigint").alias("i"),
        codecs.decode_value(codecs.encode_value(F.col("s")), "string").alias("s"),
        codecs.decode_value(codecs.encode_value(F.col("d")), "double").alias("d"),
        codecs.decode_value(codecs.encode_value(F.col("b")), "boolean").alias("b"),
    ).first()
    assert (enc.i, enc.s, enc.d, enc.b) == (1, "x", 2.5, True)
