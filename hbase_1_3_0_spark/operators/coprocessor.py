"""Coprocessor surface: observers + endpoints (SURVEY.md §2.6).

**Observers** (trigger-style hooks): the reference's RegionObserver
(hbase-server/.../coprocessor/RegionObserver.java) interposes on the read
and write paths — preGetOp:483, prePut:546, preDelete:578,
preBatchMutate:625, preAppend:873, preFlush:126, preCompact:234. Spark-first:
an observer is a plain Python callable ``DataFrame -> DataFrame`` composed
into the logical plan before/after the core operator — Catalyst then
optimizes through it (a filter added by a pre-scan observer still pushes
down to parquet).

**Endpoints** (server-side computation fanned out per region, merged at the
client): CoprocessorService / AggregateImplementation. Spark's exact
physical analog is partial aggregation; for *custom* endpoint logic the
idiomatic mapping is ``applyInPandas`` over the row-key grouping (one group
= the data a single-region endpoint would see) or ``mapInPandas`` /
``mapPartitions`` for per-partition partials merged by a reduce.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from dataclasses import dataclass, field, replace

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

Hook = Callable[[DataFrame], DataFrame]


@dataclass(frozen=True)
class Observers:
    """RegionObserver analog: hook chains on the four interposition points.

    - ``pre_scan``: rewrite the raw cell stream before the read view
      (preScannerOpen / preGetOp analog).
    - ``post_scan``: rewrite the visible cells a scan returns
      (postScannerNext / postGetOp analog — e.g. cell redaction).
    - ``pre_mutate``: rewrite a mutation batch before it applies
      (prePut / preDelete / preBatchMutate analog — validation, defaults).
    - ``post_mutate``: observe the COMMITTED mutation frame after the
      write (postPut :560 / postDelete :592 / postBatchMutate :637
      analog). Unlike the pre hooks these cannot alter what committed —
      the reference's post hooks receive the already-applied Mutation —
      so every hook gets the SAME committed frame and return values are
      ignored; the use case is the trigger/audit-log pattern (write the
      frame to a sink, derive a secondary index, bump counters).
    - ``post_increment`` / ``post_append``: rewrite the RESULT frame an
      increment/append returns (postIncrement :772 / postAppend :887 —
      the reference's hooks return a replacement Result, so unlike
      ``post_mutate`` these CHAIN, each seeing the previous rewrite; the
      committed cells are untouched).
    - ``pre_compact``: rewrite the survivor stream during compaction
      (preCompact analog — e.g. age-off policies beyond TTL).
    """

    pre_scan: tuple[Hook, ...] = ()
    post_scan: tuple[Hook, ...] = ()
    pre_mutate: tuple[Hook, ...] = ()
    post_mutate: tuple[Hook, ...] = ()
    post_increment: tuple[Hook, ...] = ()
    post_append: tuple[Hook, ...] = ()
    pre_compact: tuple[Hook, ...] = ()

    _HOOK_POINTS = (
        "pre_scan", "post_scan", "pre_mutate", "post_mutate",
        "post_increment", "post_append", "pre_compact",
    )

    def with_(self, **kw) -> "Observers":
        unknown = set(kw) - set(self._HOOK_POINTS)
        if unknown:
            raise TypeError(f"unknown observer hook point(s): {sorted(unknown)}")
        merged = {}
        for name in self._HOOK_POINTS:
            cur = getattr(self, name)
            extra = kw.get(name)
            if extra is None:
                merged[name] = cur
            elif callable(extra):
                merged[name] = cur + (extra,)
            else:
                merged[name] = cur + tuple(extra)
        return Observers(**merged)

    @staticmethod
    def apply(hooks: tuple[Hook, ...], df: DataFrame) -> DataFrame:
        for h in hooks:
            df = h(df)
        return df

    @staticmethod
    def notify(hooks: tuple[Hook, ...], df: DataFrame) -> None:
        """Post-hook dispatch: every hook sees the SAME frame (the
        reference chains each coprocessor the same committed Mutation);
        results are discarded — post hooks observe, never rewrite."""
        for h in hooks:
            h(df)


def grouped_endpoint(
    cells: DataFrame,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema: T.StructType | str,
    *,
    key: str = "row",
) -> DataFrame:
    """Custom endpoint over row-key groups (coprocessorService analog).

    ``fn`` receives the pandas frame of one group — the cells a single-row
    endpoint invocation would see (BaseRowProcessorEndpoint analog) — and
    returns its result rows. Arrow-batched; executes near the data like a
    region-side endpoint."""
    return cells.groupBy(key).applyInPandas(fn, schema)


def partition_endpoint(
    cells: DataFrame,
    partial_fn: Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]],
    schema: T.StructType | str,
) -> DataFrame:
    """Per-partition endpoint with client-side merge left to the caller —
    the exact shape of AggregateImplementation (partial per region) +
    AggregationClient (merge): run ``partial_fn`` per partition via
    mapInPandas, then reduce the (small) partials with normal DataFrame
    aggregation."""
    return cells.mapInPandas(partial_fn, schema)
