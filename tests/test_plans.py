"""Plan-shape assertions (SURVEY.md §4): the physical optimizations the
reference gets from its storage engine must be visible in our Catalyst
plans — pushdown, pruning, codegen, no accidental Python eval.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hbase_1_3_0_spark.catalog import TableMeta
from hbase_1_3_0_spark.plans import inspect
from hbase_1_3_0_spark.sources import fixtures, writer
from hbase_1_3_0_spark.table import Table


@pytest.fixture(scope="module")
def disk_table(spark, sf_dir, tmp_path_factory):
    path = tmp_path_factory.mktemp("plans") / "customer"
    writer.write_cells(fixtures.kv_cells(spark, sf_dir, "customer"), path)
    cells = writer.read_cells(spark, path)
    return Table(TableMeta(name="customer", clean_log=True), cells, now_ms=1)


def _k(n: int) -> bytes:
    return f"{n:019d}".encode()


def test_row_range_reaches_parquet_scan(disk_table):
    df = disk_table.scan(start_row=_k(10), stop_row=_k(50))
    assert inspect.pushes_down(df, "row")
    pf = " ".join(inspect.pushed_filters(df))
    assert "GreaterThanOrEqual(row" in pf and "LessThan(row" in pf


def test_clean_scan_is_shuffle_free_single_codegen_stage(disk_table):
    df = disk_table.scan(start_row=_k(10), stop_row=_k(50))
    assert inspect.shuffle_exchange_count(df) == 0
    assert inspect.codegen_stage_count(df) >= 1
    assert not inspect.has_python_eval(df)


def test_full_read_view_broadcasts_markers_not_puts(spark, sf_dir, disk_table):
    # same cells without the clean flag: marker joins must be broadcasts;
    # the only shuffle is the version-limit aggregation
    t = Table(TableMeta(name="c2"), disk_table.cells, now_ms=1)
    df = t.scan(start_row=_k(10), stop_row=_k(50))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert inspect.pushes_down(df, "row")


def test_column_projection_prunes_parquet_read(disk_table):
    df = disk_table.scan().select("row", "qualifier")
    schemas = inspect.scan_read_schema(df)
    assert schemas and all("value" not in s for s in schemas)


def test_text_pipeline_stays_jvm_side(spark, sf_dir):
    from hbase_1_3_0_spark.pipeline import text

    docs = fixtures.load_table(spark, sf_dir, "documents")
    assert not inspect.has_python_eval(text.text_stats(docs))


def test_multimodal_is_arrow_batched_python(spark, sf_dir):
    from hbase_1_3_0_spark.pipeline import multimodal

    docs = fixtures.load_table(spark, sf_dir, "documents")
    media = multimodal.attach_media(
        docs.select("doc_id", F.encode("text", "UTF-8").alias("b")),
        "b",
        media_type="image",
        fmt="png",
    )
    feats = multimodal.extract_features(media, fake=True)
    # Python IS expected here — but via Arrow batches, never row-at-a-time
    assert inspect.has_python_eval(feats)
    plan = feats._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan


def test_fused_scvf_plans_as_hash_agg(disk_table):
    # AND-composed SCVFs: one hash aggregation (never a SortAggregate —
    # struct-max buffers would force sort-based aggregation whose generated
    # code also JIT-compiles an order of magnitude slower) + one join of
    # the big side, no window over the full scan
    dsl = (
        "(SingleColumnValueFilter ('d', 'o_orderstatus', =, 'binary:F', true, true) AND "
        "SingleColumnValueFilter ('d', 'o_orderpriority', =, 'substring:urgent', true, true))"
    )
    df = disk_table.scan(filter=dsl)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortAggregate" not in plan
    assert "HashAggregate" in plan
    assert "Window" not in plan
