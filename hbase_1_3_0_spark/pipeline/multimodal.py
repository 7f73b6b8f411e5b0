"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema, partitioning, Arrow
batch shape, mapInPandas signatures; the actual media decode is STUBBED
(image/audio libraries are not in this container): ``decode_fn=None`` raises
NotImplementedError at the decode site, ``fake=True`` substitutes a
deterministic fake decoder so the pipeline shape is testable end-to-end.

Pattern: media cells live in the KV cell log like any value (an HBase-style
MOB column, family 'm'); pipelines pull them as a binary column with a
metadata struct and run batch feature extraction via ``mapInPandas`` —
Arrow-batched, per-partition streaming, bounded memory (batch size controls
peak, `spark.sql.execution.arrow.maxRecordsPerBatch`).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("format", T.StringType()),  # png, wav, mp4, ...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _make_fake_decoder(dim: int = 8) -> Callable[[bytes], list[float]]:
    """Deterministic stand-in for a real decoder: bytes -> pseudo-feature.

    Returned as a nested function so cloudpickle serializes it by value —
    a module-level function would pickle by reference and require this
    package on the Python workers' import path."""

    def fake_decode(payload: bytes) -> list[float]:
        if payload is None:
            return [0.0] * dim
        acc = [0] * dim
        for i, byte in enumerate(payload[:1024]):
            acc[i % dim] = (acc[i % dim] + byte) % 997
        return [x / 997.0 for x in acc]

    return fake_decode


def attach_media(
    df: DataFrame, payload_col: str, *, media_type: str, fmt: str
) -> DataFrame:
    """Wrap a binary column with the typed metadata struct."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.lit(None).cast("int").alias("sample_rate"),
        ),
    ).withColumnRenamed(payload_col, "payload")


def extract_features(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    decode_fn: Callable[[bytes], list[float]] | None = None,
    fake: bool = False,
    feature_dim: int = 8,
) -> DataFrame:
    """Batch feature extraction over media payloads via mapInPandas.

    ``decode_fn`` is the real decoder (PIL/librosa/ffmpeg — NOT in this
    container). With ``fake=True`` a deterministic byte-histogram fake runs
    instead, exercising the identical Arrow batch path.
    """
    if decode_fn is None and not fake:
        raise NotImplementedError(
            "media decode requires an image/audio library not present in this "
            "container; pass decode_fn=... or fake=True"
        )
    fn = decode_fn or _make_fake_decoder(feature_dim)

    mt_col = "media_meta" in df.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [fn(b) for b in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "media_type": (
                        [m["media_type"] for m in pdf["media_meta"]]
                        if mt_col
                        else ["unknown"] * len(pdf)
                    ),
                    "n_bytes": [
                        len(b) if b is not None else 0 for b in pdf[payload_col]
                    ],
                    "feature": feats,
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(
    df: DataFrame, *, every_ms: int = 1000, id_col: str = "doc_id"
) -> DataFrame:
    """Video frame-sampling *plan*: one row per (doc, frame_ts) to decode —
    the distribution-side half of frame extraction (decode itself is the
    stubbed step). Uses duration metadata; JVM-side sequence explode."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.sequence(
                F.lit(0),
                F.coalesce(F.col("media_meta.duration_ms"), F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )
