"""RPC quotas / throttling: RateLimiter replay and batch admission.

Reference semantics (hbase-1.3.0 ``hbase-server/.../quotas/``):

- ``RateLimiter.java:150 canExecute(amount)``: refill first, then
  ``avail = max(0, min(avail + refillAmount, limit))``; the request is
  admitted iff ``avail >= amount`` (with the early-refuse shortcut when
  nothing refilled and avail is already short). ``consume`` subtracts
  on admitted requests only — a throttled RPC raises
  ThrottlingException with ``getWaitInterval`` and consumes nothing
  (DefaultOperationQuota.java:59 checkQuota: all limiters checked,
  THEN all grabbed).
- ``FixedIntervalRateLimiter.java:33 refill``: nothing until
  ``nextRefillTime``, then the FULL limit and
  ``nextRefillTime = now + tunit`` — epochs are anchored at the first
  post-boundary request, not at aligned wall-clock boundaries.
  ``getWaitInterval = nextRefillTime - now`` (:43).
- ``AverageIntervalRateLimiter.java:29 refill``: first call primes and
  returns the full limit; afterwards a PRO-RATED
  ``floor(elapsed/tunit * limit)`` (full limit once elapsed >= tunit),
  advancing the anchor only when something refilled.
  ``getWaitInterval = (amount - available) * tunit / limit`` (:52).

Two analogs, two scale postures:

- ``replay_rate_limiter``: the EXACT sequential semantics, replayed
  per throttle key over an operations log with Arrow
  ``applyInPandas`` — the same sanctioned stateful-walk pattern as the
  streaming TTL counters. A quota replay is metadata/ops-log scale
  (keys = users x tables; the state is two longs per key), so the
  Python boundary is not on a data path; keys partition, each group is
  one linear pass.
- ``throttle_fixed_window``: the Spark-idiomatic batch admission
  control — pure window functions, zero Python. DOCUMENTED
  DIVERGENCE: epochs are ALIGNED wall-clock windows
  (``F.window(ts, tunit)``) instead of the reference's
  first-request-anchored refill times; under continuous traffic the
  two agree (the anchor converges to one refill per tunit), and the
  aligned form is what a 100 TB replay wants — no per-key sequential
  state, the verdict is one rank per (key, window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["replay_rate_limiter", "throttle_fixed_window"]


def _walk_fixed(rows, limit, tunit):
    """FixedIntervalRateLimiter, line for line (refill :33, wait :43)."""
    avail, next_refill = limit, -1
    out = []
    for now, amount in rows:
        refill = 0
        if now >= next_refill:
            next_refill = now + tunit
            refill = limit
        if refill == 0 and avail < amount:
            out.append((False, avail, next_refill - now))
            continue
        avail = max(0, min(avail + refill, limit))
        if avail >= amount:
            avail -= amount
            out.append((True, avail, 0))
        else:
            out.append((False, avail, next_refill - now))
    return out


def _walk_average(rows, limit, tunit):
    """AverageIntervalRateLimiter, line for line (refill :29, wait :52)."""
    avail, next_refill = limit, -1
    out = []
    for now, amount in rows:
        if next_refill == -1:
            next_refill = now
            refill = limit
        else:
            elapsed = now - next_refill
            if elapsed >= tunit:
                refill = limit
            elif elapsed > 0:
                refill = int(elapsed / tunit * limit)
            else:
                refill = 0
            if refill > 0:
                next_refill = now
        if refill == 0 and avail < amount:
            out.append((False, avail, int((amount - avail) * tunit / limit)))
            continue
        avail = max(0, min(avail + refill, limit))
        if avail >= amount:
            avail -= amount
            out.append((True, avail, 0))
        else:
            out.append((False, avail, int((amount - avail) * tunit / limit)))
    return out


def replay_rate_limiter(
    requests: DataFrame,
    *,
    limit: int,
    tunit_ms: int,
    policy: str = "fixed",
    key_col: str = "key",
    ts_col: str = "ts_ms",
    amount_col: str = "amount",
    id_col: str = "req_id",
) -> DataFrame:
    """Exact RateLimiter replay per throttle key.

    ``requests``: (req_id, key, ts_ms, amount). Returns the input plus
    ``allowed`` (bool), ``avail_after`` (resource units left after the
    request) and ``wait_ms`` (the ThrottlingException waitInterval, 0
    when admitted). Requests replay in (ts_ms, req_id) order within
    each key — the reference's arrival order under one region server.
    """
    if policy not in ("fixed", "average"):
        raise ValueError(f"unknown rate-limiter policy: {policy}")
    walk = _walk_fixed if policy == "fixed" else _walk_average
    lim, tunit = int(limit), int(tunit_ms)

    base = requests.select(
        F.col(id_col).cast("long").alias("req_id"),
        F.col(key_col).cast("string").alias("key"),
        F.col(ts_col).cast("long").alias("ts_ms"),
        F.col(amount_col).cast("long").alias("amount"),
    )
    schema = (
        "req_id long, key string, ts_ms long, amount long, "
        "allowed boolean, avail_after long, wait_ms long"
    )

    def replay(pdf):
        pdf = pdf.sort_values(["ts_ms", "req_id"]).reset_index(drop=True)
        verdicts = walk(
            list(zip(pdf["ts_ms"].tolist(), pdf["amount"].tolist())),
            lim, tunit,
        )
        pdf["allowed"] = [v[0] for v in verdicts]
        pdf["avail_after"] = [v[1] for v in verdicts]
        pdf["wait_ms"] = [v[2] for v in verdicts]
        return pdf

    return base.groupBy("key").applyInPandas(replay, schema)


def throttle_fixed_window(
    requests: DataFrame,
    *,
    limit: int,
    window: str,
    key_col: str = "key",
    ts_col: str = "ts",
    id_col: str = "req_id",
) -> DataFrame:
    """Aligned-epoch batch admission: at most ``limit`` requests per
    key per tumbling ``window`` (e.g. ``"1 hour"``), earliest first.

    Pure window functions — the 100 TB shape of the fixed-interval
    throttle (divergence from the reference's request-anchored refill
    documented in the module docstring). Returns the input ids plus
    the window start (string), the in-window rank, ``allowed``, and
    ``wait_s`` — whole seconds until the next refill epoch for
    throttled requests (the getWaitInterval analog), 0 when admitted.
    """
    w = F.window(F.col(ts_col), window)
    ranked = requests.select(
        F.col(id_col).alias("req_id"),
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("ts"),
        w.alias("w"),
    ).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("key", "w").orderBy(
                F.col("ts").asc(), F.col("req_id").asc()
            )
        ),
    )
    allowed = F.col("rn") <= limit
    return ranked.select(
        "req_id", "key",
        F.col("w.start").cast("string").alias("win_start"),
        "rn",
        allowed.alias("allowed"),
        F.when(allowed, F.lit(0).cast("long")).otherwise(
            F.expr("timestampdiff(SECOND, ts, w.end)").cast("long")
        ).alias("wait_s"),
    )
