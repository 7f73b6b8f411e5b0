"""Arrow IPC corpus source/sink — the columnar interchange twin of
sources/jsonl.py (same declared-schema / quarantine posture).

Training-data pipelines increasingly ship corpora as Arrow IPC files
(the format under HuggingFace datasets and Lance-style table formats):
columnar, zero-copy mmap-able, types preserved exactly — where JSONL
loses binary/arrays to strings. Spark has no native Arrow-file
datasource, so both directions run as Arrow-batched ``mapInPandas``
plumbing (pyarrow is already Spark's interchange layer — the batches
move executor-side only, nothing funnels through the driver):

- **write**: each partition streams its pandas batches into one
  ``part-*.arrow`` IPC file; a bounded manifest (one row per partition)
  is the only thing the driver sees.
- **read**: the file list parallelizes one-file-per-task; each task
  opens its file, verifies the DECLARED schema (names + types —
  inference would be a full extra pass and non-deterministic under
  corpus growth), and yields record batches. A mismatched/corrupt file
  either fails the job (default) or is skipped after the
  :func:`arrow_health` gate — the per-FILE analog of jsonl.py's
  per-line quarantine.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def _arrow_schema(schema: T.StructType):
    from pyspark.sql.pandas.types import to_arrow_schema

    return to_arrow_schema(schema)


def _as_struct(schema: T.StructType | str) -> T.StructType:
    if isinstance(schema, str):
        return T.StructType.fromDDL(schema)
    return schema


def _list_arrow_files(path: str) -> list[str]:
    """Driver-side file listing — local / shared-filesystem paths ONLY
    (this source's scope). A URI scheme or a missing directory raises
    instead of silently reading as an empty corpus: 'no data' must
    never be indistinguishable from 'wrong path'."""
    if "://" in str(path):
        raise ValueError(
            f"arrow_ipc reads local/shared-filesystem paths, got {path!r} "
            "(remote URI schemes are not supported by this source)"
        )
    base = Path(path)
    if not base.is_dir():
        raise FileNotFoundError(f"arrow corpus directory not found: {path}")
    return sorted(str(p) for p in base.glob("*.arrow"))


def _fields(arrow_schema) -> list[tuple]:
    return [(f.name, f.type) for f in arrow_schema]


def _make_check_and_iter(want: list[tuple], skip: bool):
    """Shared schema-verify + record-batch iteration for the batch and
    streaming readers. Returned as a NESTED function so cloudpickle
    serializes it by value into the mapInPandas closure — a
    module-level function would pickle by reference and require this
    package on the Python workers' import path."""

    def check_and_iter(reader, where: str):
        got = [(f.name, f.type) for f in reader.schema]
        if got != want:
            if skip:
                return
            raise ValueError(f"schema mismatch in {where}: {got} != {want}")
        for i in range(reader.num_record_batches):
            yield reader.get_batch(i).to_pandas()

    return check_and_iter


def write_arrow(
    df: DataFrame,
    path: str,
    *,
    mode: str = "overwrite",
    compression: str | None = None,
) -> list[tuple[str, int]]:
    """Write one Arrow IPC file per partition; returns the manifest
    [(file, n_rows)] (bounded: one entry per partition). ``compression``
    is IPC buffer compression ('zstd'/'lz4') when the pyarrow build
    supports it. ``mode``: 'overwrite' (default) replaces the directory,
    'error' refuses an existing one, 'append' adds this write's files
    with part numbers continuing after the existing run's (finalize
    never renames over a prior write's files).

    COMMIT PROTOCOL (the mapInPandas twin of FileOutputCommitter —
    tasks that write side-effect files need one, or a failed/retried or
    speculatively-executed task leaves its first attempt's file next to
    the retry's and the reader silently double-counts): every attempt
    writes to a fresh uniquely-named file under a staging directory;
    the driver then finalizes ONLY the files named in the returned
    manifest — which contains exactly one row per partition, from the
    attempt Spark committed — renaming them to deterministic
    ``part-<partition>.arrow`` names and deleting the staging dir with
    any orphaned attempts in it."""
    import os
    import re
    import shutil
    import uuid as _uuid

    if mode not in ("overwrite", "error", "append"):
        raise ValueError(
            f"mode must be 'overwrite', 'error' or 'append', got {mode!r}"
        )
    out = Path(path)
    if mode == "overwrite" and out.exists():
        shutil.rmtree(out)
    elif out.exists() and mode == "error":
        raise FileExistsError(str(out))
    out.mkdir(parents=True, exist_ok=True)
    # append: deterministic names continue AFTER the existing run's —
    # finalize must never os.replace over a prior write's files
    part_base = 0
    if mode == "append":
        existing = [
            int(m.group(1))
            for p in out.glob("part-*.arrow")
            if (m := re.fullmatch(r"part-(\d+)\.arrow", p.name))
        ]
        part_base = max(existing) + 1 if existing else 0
    staging = out / f"_staging-{_uuid.uuid4().hex}"
    staging.mkdir()
    arrow_schema = _arrow_schema(df.schema)
    staging_str = str(staging)

    def write_part(batches):
        import uuid

        import pandas as pd
        import pyarrow as pa
        import pyarrow.ipc as ipc

        opts = (
            ipc.IpcWriteOptions(compression=compression)
            if compression
            else None
        )
        writer = None
        fname = None
        part_id = None
        n = 0
        for pdf in batches:
            tbl = pa.Table.from_pandas(
                pdf, schema=arrow_schema, preserve_index=False
            )
            if writer is None:
                from pyspark import TaskContext

                ctx = TaskContext.get()
                part_id = ctx.partitionId() if ctx is not None else 0
                # unique per ATTEMPT: concurrent speculative attempts
                # must never write the same staging file
                fname = (
                    f"{staging_str}/part-{part_id:05d}-"
                    f"{uuid.uuid4().hex}.arrow"
                )
                writer = ipc.new_file(fname, arrow_schema, options=opts)
            writer.write_table(tbl)
            n += len(pdf)
        if writer is not None:
            writer.close()
            yield pd.DataFrame(
                {"file": [fname], "part": [part_id], "n_rows": [n]}
            )

    manifest = df.mapInPandas(
        write_part, "file string, part int, n_rows long"
    ).collect()
    final: list[tuple[str, int]] = []
    for r in sorted(manifest, key=lambda r: r.part):
        dst = out / f"part-{part_base + r.part:05d}.arrow"
        os.replace(r.file, dst)
        final.append((str(dst), r.n_rows))
    shutil.rmtree(staging)
    return final


def read_arrow(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    *,
    on_mismatch: str = "fail",
) -> DataFrame:
    """Read an Arrow IPC directory with the DECLARED schema. One task
    per file (the file list is the only driver-side state). A file whose
    schema doesn't match (by field names + types) fails the job
    (``on_mismatch='fail'``) or is skipped (``'skip'`` — only after
    :func:`arrow_health` has quantified what a skip drops)."""
    if on_mismatch not in ("fail", "skip"):
        raise ValueError(f"on_mismatch must be 'fail' or 'skip', got {on_mismatch!r}")
    schema = _as_struct(schema)
    files = _list_arrow_files(path)
    if not files:
        return spark.createDataFrame([], schema)
    paths = spark.createDataFrame([(f,) for f in files], "file: string")
    paths = paths.repartition(len(files))
    check_and_iter = _make_check_and_iter(
        _fields(_arrow_schema(schema)), on_mismatch == "skip"
    )

    def read_part(batches):
        import pyarrow.ipc as ipc

        for pdf in batches:
            for f in pdf["file"]:
                with ipc.open_file(f) as reader:
                    yield from check_and_iter(reader, f)

    return paths.mapInPandas(read_part, schema)


def read_arrow_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    *,
    on_mismatch: str = "fail",
) -> DataFrame:
    """Structured-Streaming Arrow ingest: new ``.arrow`` files landing in
    ``path`` stream through Spark's ``binaryFile`` source (file-arrival
    tracking, checkpointing, exactly-once file accounting come free) and
    decode executor-side in the same Arrow-batched ``mapInPandas`` as
    :func:`read_arrow`. The natural head of a streaming corpus pipeline:
    compose with e.g. ``streaming/wal.dedup_ingest_stream``-style
    foreachBatch sinks. ``on_mismatch='skip'`` drops schema-mismatched
    files (gate with :func:`arrow_health` semantics first); corrupt
    files always fail the batch — Structured Streaming will retry, and
    silently dropping undecodable bytes is how corpora rot."""
    if on_mismatch not in ("fail", "skip"):
        raise ValueError(f"on_mismatch must be 'fail' or 'skip', got {on_mismatch!r}")
    schema = _as_struct(schema)
    check_and_iter = _make_check_and_iter(
        _fields(_arrow_schema(schema)), on_mismatch == "skip"
    )
    files = (
        spark.readStream.format("binaryFile")
        # streaming sources require the schema declared; this is
        # binaryFile's fixed one
        .schema(
            "path string, modificationTime timestamp, "
            "length long, content binary"
        )
        .option("pathGlobFilter", "*.arrow")
        .load(str(path))
        .select("path", "content")
    )

    def decode(batches):
        import pyarrow as pa
        import pyarrow.ipc as ipc

        for pdf in batches:
            for fpath, raw in zip(pdf["path"], pdf["content"]):
                with ipc.open_file(pa.BufferReader(raw)) as reader:
                    yield from check_and_iter(reader, fpath)

    return files.mapInPandas(decode, schema)


def arrow_health(
    spark: SparkSession, path: str, schema: T.StructType | str
) -> DataFrame:
    """Per-file quarantine report (file, ok, n_rows, error) — the health
    gate before trusting ``on_mismatch='skip'`` (the per-file analog of
    jsonl.corrupt_stats). Unreadable or schema-mismatched files report
    ok=false with the error string instead of failing the scan."""
    schema = _as_struct(schema)
    files = _list_arrow_files(path)
    out_schema = "file string, ok boolean, n_rows long, error string"
    if not files:
        return spark.createDataFrame([], out_schema)
    expected = _arrow_schema(schema)
    paths = spark.createDataFrame([(f,) for f in files], "file: string")
    paths = paths.repartition(len(files))

    def probe(batches):
        import pandas as pd
        import pyarrow.ipc as ipc

        for pdf in batches:
            rows = []
            for f in pdf["file"]:
                try:
                    with ipc.open_file(f) as reader:
                        got = [(fl.name, fl.type) for fl in reader.schema]
                        want = [(fl.name, fl.type) for fl in expected]
                        if got != want:
                            rows.append((f, False, None, "schema mismatch"))
                            continue
                        n = sum(
                            reader.get_batch(i).num_rows
                            for i in range(reader.num_record_batches)
                        )
                        rows.append((f, True, n, None))
                except Exception as e:  # per-file quarantine, not job fail
                    rows.append((f, False, None, str(e)[:200]))
            yield pd.DataFrame(
                rows, columns=["file", "ok", "n_rows", "error"]
            )

    return paths.mapInPandas(probe, out_schema)
