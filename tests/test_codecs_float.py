"""Raw-IEEE OrderedBytes float32/64 codecs — byte-exact vs a struct-pack
model of OrderedBytes.java:1374 encodeFloat32 / :1468 encodeFloat64
(the transform `bits ^= (bits >> SIZE-1) | MIN_VALUE`, header 0x30/0x31,
DESCENDING = 0xFF-XOR of every byte)."""

from __future__ import annotations

import math
import struct

from pyspark.sql import functions as F

from hbase_1_3_0_spark.functions import codecs

F32_VALUES = [
    0.0, -0.0, 1.0, -1.0, 1.5, -1.5, 3.14159, -3.14159,
    float("inf"), float("-inf"), float("nan"),
    1e-40, -1e-40,  # denormals
    3.4028235e38, -3.4028235e38,  # max finite
    1.4e-45,  # min denormal
]
F64_VALUES = [
    0.0, -0.0, 1.0, -1.0, math.pi, -math.pi,
    float("inf"), float("-inf"), float("nan"),
    5e-324, -5e-324, 1.7976931348623157e308, -1.7976931348623157e308,
]


def _model32(v: float) -> bytes:
    i = struct.unpack(">i", struct.pack(">f", v))[0]
    i ^= 0xFFFFFFFF if i < 0 else 0x80000000
    return b"\x30" + (i & 0xFFFFFFFF).to_bytes(4, "big")


def _model64(v: float) -> bytes:
    i = struct.unpack(">q", struct.pack(">d", v))[0]
    i ^= (1 << 64) - 1 if i < 0 else 1 << 63
    return b"\x31" + (i & ((1 << 64) - 1)).to_bytes(8, "big")


def _comp(b: bytes) -> bytes:
    return bytes(x ^ 0xFF for x in b)


def _df(spark, values, typ):
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], f"i int, v {typ}"
    )


def test_float32_byte_exact(spark):
    df = _df(spark, F32_VALUES, "float")
    got = {
        r.i: (bytes(r.asc), bytes(r.desc))
        for r in df.select(
            "i",
            codecs.encode_float32_ob(F.col("v")).alias("asc"),
            codecs.encode_float32_ob(F.col("v"), descending=True).alias(
                "desc"
            ),
        ).collect()
    }
    for i, v in enumerate(F32_VALUES):
        exp = _model32(struct.unpack(">f", struct.pack(">f", v))[0])
        assert got[i][0] == exp, (v, got[i][0].hex(), exp.hex())
        assert got[i][1] == _comp(exp), v


def test_float64_byte_exact(spark):
    df = _df(spark, F64_VALUES, "double")
    got = {
        r.i: (bytes(r.asc), bytes(r.desc))
        for r in df.select(
            "i",
            codecs.encode_float64_ob(F.col("v")).alias("asc"),
            codecs.encode_float64_ob(F.col("v"), descending=True).alias(
                "desc"
            ),
        ).collect()
    }
    for i, v in enumerate(F64_VALUES):
        exp = _model64(v)
        assert got[i][0] == exp, (v, got[i][0].hex(), exp.hex())
        assert got[i][1] == _comp(exp), v


def test_float_roundtrip_including_specials(spark):
    df32 = _df(spark, F32_VALUES, "float")
    back32 = df32.select(
        "i", "v",
        codecs.decode_float32_ob(
            codecs.encode_float32_ob(F.col("v"))
        ).alias("rt"),
        codecs.decode_float32_ob(
            codecs.encode_float32_ob(F.col("v"), descending=True),
            descending=True,
        ).alias("rtd"),
    ).collect()
    for r in back32:
        for rt in (r.rt, r.rtd):
            if math.isnan(r.v):
                assert math.isnan(rt)
            else:
                assert rt == r.v or (r.v == 0 and rt == 0), (r.v, rt)
    df64 = _df(spark, F64_VALUES, "double")
    back64 = df64.select(
        "v",
        codecs.decode_float64_ob(
            codecs.encode_float64_ob(F.col("v"))
        ).alias("rt"),
    ).collect()
    for r in back64:
        if math.isnan(r.v):
            assert math.isnan(r.rt)
        else:
            assert r.rt == r.v


def test_float_order_contract(spark):
    # byte order of the encoding == numeric order (NaN above +inf,
    # floatToIntBits canonical NaN — the Java total order)
    vals = [v for v in F64_VALUES if not math.isnan(v)]
    df = _df(spark, vals, "double")
    enc = df.select(
        "v", codecs.encode_float64_ob(F.col("v")).alias("e"),
        codecs.encode_float64_ob(F.col("v"), descending=True).alias("ed"),
    ).collect()
    by_bytes = [r.v for r in sorted(enc, key=lambda r: bytes(r.e))]
    # -0.0 < 0.0 in the IEEE bit order (the reference's documented order)
    expected = sorted(vals, key=lambda v: struct.unpack(
        ">q", struct.pack(">d", v))[0] ^ (
            (1 << 64) - 1 if struct.unpack(
                ">q", struct.pack(">d", v))[0] < 0 else 1 << 63))
    assert by_bytes == expected
    by_desc = [r.v for r in sorted(enc, key=lambda r: bytes(r.ed))]
    assert by_desc == expected[::-1]


def test_float32_zero_python_plan(spark):
    # reflect() is a JVM expression: no BatchEvalPython / ArrowEval
    df = _df(spark, [1.5, -2.5], "float").select(
        codecs.encode_float32_ob(F.col("v")).alias("e")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
