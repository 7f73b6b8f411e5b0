"""JSONL corpus source/sink — the interchange format LLM data pipelines
actually ship (one JSON document per line, gzip-friendly, append-only).

Read path: Spark's native JSON datasource in PERMISSIVE mode with an
explicit schema and a ``_corrupt_record`` capture column — at 100 TB a
web-scale crawl WILL contain malformed lines, and the correct posture is
to quarantine them (count + sample) rather than fail the job or silently
drop them. Schema is declared, never inferred: inference is a full extra
pass over the data and is non-deterministic under corpus growth.

Write path: one JSON line per document via the native writer (optionally
compressed). Spark's JSON writer omits null fields by design; round-trip
fidelity is on the declared schema's non-null values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def write_jsonl(
    df: DataFrame,
    path: str,
    *,
    compression: str | None = None,
    mode: str = "overwrite",
) -> None:
    """One JSON object per line; ``compression`` e.g. 'gzip' for the
    standard .jsonl.gz corpus layout."""
    w = df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    *,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Read JSONL with the declared ``schema``. ``keep_corrupt=True``
    reads PERMISSIVE with malformed lines captured in ``_corrupt_record``
    for quarantining. The default clean read uses DROPMALFORMED — bad
    lines are excluded by the reader itself, with no corrupt column in
    the plan: a PERMISSIVE read filtered on ``_corrupt_record IS NULL``
    breaks under column pruning (Spark's corrupt-column-only scan
    restriction fires on e.g. ``count()``). Dropping is only silent if
    you skip the health gate — run :func:`corrupt_stats` first."""
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    if keep_corrupt:
        full = schema.add(T.StructField(CORRUPT_COL, T.StringType(), True))
        return (
            spark.read.schema(full)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
            .json(path)
        )
    return (
        spark.read.schema(schema)
        .option("mode", "DROPMALFORMED")
        .json(path)
    )


def corrupt_stats(
    spark: SparkSession, path: str, schema: T.StructType | str
) -> DataFrame:
    """Quarantine report: total lines, corrupt lines, corrupt fraction —
    the health gate a pipeline checks before trusting a drop."""
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    # Spark disallows scans that reference ONLY the internal corrupt
    # column (QUERY_ONLY_CORRUPT_RECORD_COLUMN), and column pruning
    # strips any probe column an aggregate doesn't truly use — so the
    # health gate reads the TEXT source and parses per line: a null
    # from_json struct marks a malformed line. One pass, no caching.
    lines = spark.read.text(str(path))
    with_cc = T.StructType(list(schema.fields)).add(
        T.StructField(CORRUPT_COL, T.StringType(), True)
    )
    parsed = F.from_json(
        F.col("value"),
        with_cc,
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
    )
    bad = parsed.getField(CORRUPT_COL).isNotNull()
    return lines.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(bad.cast("long")).alias("n_corrupt"),
        F.round(F.sum(bad.cast("long")) / F.count(F.lit(1)), 6).alias(
            "corrupt_frac"
        ),
    )


# ---------------------------------------------------------------------------
# CSV twin — same declared-schema / quarantine posture
# ---------------------------------------------------------------------------


def write_csv(
    df: DataFrame,
    path: str,
    *,
    header: bool = True,
    compression: str | None = None,
    mode: str = "overwrite",
) -> None:
    # escape='"' = RFC-4180 quote doubling ("" inside quoted fields), the
    # form every external CSV consumer expects; Spark's default is
    # backslash-escaping, which round-trips only with itself
    w = (
        df.write.mode(mode)
        .option("header", str(header).lower())
        .option("escape", '"')
    )
    if compression:
        w = w.option("compression", compression)
    w.csv(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    *,
    header: bool = True,
    keep_corrupt: bool = False,
) -> DataFrame:
    """CSV with a DECLARED schema (no inference pass), multiline quoted
    fields, and the same malformed-line posture as :func:`read_jsonl`:
    PERMISSIVE + ``_corrupt_record`` for quarantining, DROPMALFORMED for
    the clean read (a corrupt-column-only scan is illegal under column
    pruning)."""
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    base = (
        spark.read.option("header", str(header).lower())
        .option("multiLine", "true")
        .option("escape", '"')
    )
    if keep_corrupt:
        full = schema.add(T.StructField(CORRUPT_COL, T.StringType(), True))
        return (
            base.schema(full)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
            .csv(path)
        )
    return base.schema(schema).option("mode", "DROPMALFORMED").csv(path)
