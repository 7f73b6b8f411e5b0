"""Releasable local checkpoints.

``DataFrame.localCheckpoint`` persists the materialized RDD through the
block manager, but ``DataFrame.unpersist`` is a NO-OP for it (it goes
through the SQL cache manager, which never saw the checkpoint), so an
iterative algorithm that checkpoints per iteration accretes every
superseded copy of its working table in storage for the life of the
session. This module pairs each checkpoint with the id of the RDD it
persisted — captured as the set difference of the context's persistent
RDD ids around the (eager) checkpoint call — so callers can free the
blocks of a superseded checkpoint explicitly.

Freeing a checkpoint makes THAT DataFrame unrecomputable (local
checkpoints deliberately truncate lineage); only ever release a
checkpoint that has been fully superseded by a newer one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class ReleasableCheckpoint:
    """An eagerly localCheckpoint'd DataFrame plus the handle needed to
    actually free its storage later."""

    __slots__ = ("df", "_sc", "_rdd_ids")

    def __init__(self, df: DataFrame, sc, rdd_ids: list[int]):
        self.df = df
        self._sc = sc
        self._rdd_ids = rdd_ids

    def release(self) -> None:
        """Unpersist the checkpoint's RDD blocks (blocking=False). Safe
        to call more than once; after release ``df`` must not be used."""
        if not self._rdd_ids:
            return
        jvm = self._sc._jvm
        jmap = jvm.scala.collection.JavaConverters.mapAsJavaMap(
            self._sc._jsc.sc().getPersistentRDDs()
        )
        for rid in self._rdd_ids:
            jrdd = jmap.get(rid)
            if jrdd is not None:
                jrdd.unpersist(False)
        self._rdd_ids = []


def _persistent_ids(sc) -> set[int]:
    jmap = sc._jvm.scala.collection.JavaConverters.mapAsJavaMap(
        sc._jsc.sc().getPersistentRDDs()
    )
    return set(jmap.keySet())


def releasable_local_checkpoint(df: DataFrame) -> ReleasableCheckpoint:
    """Eager ``localCheckpoint`` that remembers which persistent RDD ids
    it created, so the caller can ``release()`` them once superseded."""
    sc = df.sparkSession.sparkContext
    before = _persistent_ids(sc)
    out = df.localCheckpoint()
    created = sorted(_persistent_ids(sc) - before)
    return ReleasableCheckpoint(out, sc, created)
