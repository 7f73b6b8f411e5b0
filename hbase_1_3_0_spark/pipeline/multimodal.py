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


def int_to_be_bytes(col: F.Column, nbytes: int) -> F.Column:
    """Non-negative integer column -> fixed-width big-endian binary
    (hex/unhex round-trip, pure JVM) — for synthesizing/writing binary
    container fields."""
    return F.unhex(F.lpad(F.hex(col), nbytes * 2, "0"))


def int_to_le_bytes(col: F.Column, nbytes: int) -> F.Column:
    """Little-endian twin of :func:`int_to_be_bytes` (byte-swapped hex)."""
    h = F.lpad(F.hex(col), nbytes * 2, "0")
    return F.unhex(
        F.concat(
            *[F.substring(h, 2 * i + 1, 2) for i in reversed(range(nbytes))]
        )
    )


def _be_int(p: F.Column, pos: int, nbytes: int) -> F.Column:
    return F.conv(F.hex(F.substring(p, pos, nbytes)), 16, 10).cast("long")


def _le_int(p: F.Column, pos: int, nbytes: int) -> F.Column:
    h = F.hex(F.substring(p, pos, nbytes))
    return F.conv(
        F.concat(
            *[F.substring(h, 2 * i + 1, 2) for i in reversed(range(nbytes))]
        ),
        16,
        10,
    ).cast("long")


def probe_media(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """REAL container-header probe as pure JVM Column expressions — no
    media library and no Python on the data path. Reads the fixed-offset
    fields of the three stdlib-verifiable containers:

    - **PNG**: 8-byte signature, IHDR width/height (big-endian 32-bit)
    - **GIF** (87a/89a): logical-screen width/height (little-endian 16-bit)
    - **WAV** (canonical RIFF PCM layout: fmt chunk at offset 12, data
      chunk at 36): channels, sample rate, duration from data size /
      byte rate — non-canonical chunk orders read as width/height NULL
      container 'wav' only if the RIFF/WAVE magic matches at the fixed
      offsets, else 'unknown'

    This is the dimension/duration metadata multimodal curation filters
    on (drop tiny images, cap clip length) — at 100 TB you want it as a
    codegen'd scan predicate, not a per-row Python decode. Unknown or
    truncated payloads yield container='unknown' / NULL fields, never a
    job abort. Full pixel/sample decode stays in
    :func:`extract_features` (real decoder or fake)."""
    p = F.col(payload_col)
    n = F.length(p)
    is_png = F.hex(F.substring(p, 1, 8)) == "89504E470D0A1A0A"
    # full 6-byte version magic: 'GIF87a' / 'GIF89a' — matching only
    # 'GIF8' would classify malformed headers (e.g. 'GIF8xy') as gif
    # and read fabricated dimensions from them
    is_gif = F.hex(F.substring(p, 1, 6)).isin(
        "474946383761", "474946383961"
    )
    is_wav = (F.hex(F.substring(p, 1, 4)) == "52494646") & (  # 'RIFF'
        F.hex(F.substring(p, 9, 8)) == "57415645666D7420"  # 'WAVEfmt '
    )
    container = (
        F.when(is_png, F.lit("png"))
        .when(is_gif, F.lit("gif"))
        .when(is_wav, F.lit("wav"))
        .otherwise(F.lit("unknown"))
    )
    # every field predicate carries a length guard: a payload truncated
    # INSIDE a field would otherwise hex/conv the partial bytes into a
    # fabricated small number — truncated fields must read NULL. PNG
    # dims additionally require the first chunk to actually BE IHDR
    # (bytes 13-16): the spec mandates it, and reading the fixed
    # offsets out of a non-IHDR first chunk fabricates dimensions
    png_ihdr = is_png & (F.hex(F.substring(p, 13, 4)) == "49484452")
    width = F.when(png_ihdr & (n >= 20), _be_int(p, 17, 4)).when(
        is_gif & (n >= 8), _le_int(p, 7, 2)
    )
    height = F.when(png_ihdr & (n >= 24), _be_int(p, 21, 4)).when(
        is_gif & (n >= 10), _le_int(p, 9, 2)
    )
    n_channels = F.when(is_wav & (n >= 24), _le_int(p, 23, 2))
    sample_rate = F.when(is_wav & (n >= 28), _le_int(p, 25, 4))
    byte_rate = _le_int(p, 29, 4)
    data_size = _le_int(p, 41, 4)
    duration_ms = F.when(
        is_wav & (n >= 44) & (byte_rate > 0),
        (data_size * 1000).cast("long") / byte_rate,
    ).cast("long")
    return df.withColumns(
        {
            "container": container,
            "width": width.cast("long"),
            "height": height.cast("long"),
            "n_channels": n_channels,
            "sample_rate": sample_rate,
            "duration_ms": duration_ms,
            "n_bytes": F.length(p).cast("long"),
        }
    )


JPEG_PROBE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("is_jpeg", T.BooleanType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_components", T.IntegerType()),
        T.StructField("progressive", T.BooleanType()),
    ]
)


def jpeg_probe(
    df: DataFrame, *, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """REAL JPEG dimension probe: walk the marker segments to the SOF
    frame header (ITU T.81 §B.2.2 — FF C0..CF except DHT/DAC/RST) and
    read height/width/components. JPEG's frame header sits at a
    VARIABLE offset behind APPn/quantization segments, so unlike the
    fixed-offset PNG/GIF/WAV fields (:func:`probe_media`, pure JVM
    exprs) this walks bytes in an Arrow-batched ``mapInPandas``.
    Truncated/non-JPEG payloads yield is_jpeg=false / NULL dims."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def probe(b) -> tuple:
            if b is None:
                return (False, None, None, None, None)
            b = bytes(b)
            if len(b) < 4 or b[0:2] != b"\xff\xd8":
                return (False, None, None, None, None)
            i = 2
            while i + 4 <= len(b):
                if b[i] != 0xFF:
                    return (True, None, None, None, None)  # corrupt stream
                # ITU T.81 B.1.1.2: any number of 0xFF fill bytes may
                # pad before a marker — skip the run so the first
                # non-0xFF byte is read as the marker code
                while i + 2 <= len(b) and b[i + 1] == 0xFF:
                    i += 1
                if i + 4 > len(b):
                    break
                marker = b[i + 1]
                if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
                    i += 2  # standalone markers have no length field
                    continue
                if marker == 0xD9 or marker == 0xDA:
                    break  # EOI / start of scan: no SOF seen
                seg_len = int.from_bytes(b[i + 2 : i + 4], "big")
                if seg_len < 2:
                    return (True, None, None, None, None)
                is_sof = 0xC0 <= marker <= 0xCF and marker not in (
                    0xC4, 0xC8, 0xCC,  # DHT / JPG / DAC are not frames
                )
                if is_sof:
                    if i + 9 > len(b):
                        return (True, None, None, None, None)
                    h = int.from_bytes(b[i + 5 : i + 7], "big")
                    w = int.from_bytes(b[i + 7 : i + 9], "big")
                    nc = b[i + 9] if i + 9 < len(b) else None
                    return (True, w, h, nc, marker == 0xC2)
                i += 2 + seg_len
            return (True, None, None, None, None)

        for pdf in batches:
            rows = [
                (int(doc_id),) + probe(payload)
                for doc_id, payload in zip(pdf[id_col], pdf[payload_col])
            ]
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "is_jpeg", "width", "height",
                    "n_components", "progressive",
                ],
            )

    return df.mapInPandas(run, JPEG_PROBE_SCHEMA)


WAV_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.DoubleType()),
    ]
)


def wav_features(
    df: DataFrame, *, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """REAL audio decode for WAV PCM — the one media format the Python
    stdlib decodes (``wave`` module), so unlike :func:`extract_features`
    nothing here is stubbed: Arrow-batched ``mapInPandas``, per-payload
    ``wave`` parse, numpy PCM amplitude stats (rms/peak normalized to
    [-1, 1]). Undecodable payloads emit a NULL-stat row rather than
    failing the batch (quarantine posture)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave

        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
                        nch, sw, sr, nf = (
                            w.getnchannels(),
                            w.getsampwidth(),
                            w.getframerate(),
                            w.getnframes(),
                        )
                        raw = w.readframes(nf)
                    if sw == 1:
                        # 8-bit WAV PCM is UNSIGNED (0..255, silence at
                        # 128) — int8 would reflect the waveform around
                        # full scale and score silence as peak=1.0
                        x = (
                            np.frombuffer(raw, dtype=np.uint8).astype(
                                np.float64
                            )
                            - 128.0
                        ) / 128.0
                    else:
                        dt = {2: np.int16, 4: np.int32}[sw]
                        x = np.frombuffer(raw, dtype=dt).astype(np.float64)
                        x = x / float(2 ** (8 * sw - 1))
                    rms = float(np.sqrt(np.mean(x * x))) if len(x) else 0.0
                    peak = float(np.max(np.abs(x))) if len(x) else 0.0
                    rows.append(
                        (int(doc_id), nf * nch, sr, nch, rms, peak)
                    )
                except Exception:
                    rows.append((int(doc_id), None, None, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_samples", "sample_rate", "n_channels",
                    "rms", "peak",
                ],
            )

    return df.mapInPandas(run, WAV_FEATURE_SCHEMA)


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
