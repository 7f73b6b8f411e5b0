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

__all__ = [
    "replay_rate_limiter",
    "throttle_fixed_window",
    "check_quota_replay",
    "LIMITER_KINDS",
]


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


# -- Multi-scope composition (DefaultOperationQuota.java:59) ---------------

_LONG_MAX = (1 << 63) - 1

#: TimeBasedLimiter sub-limiter kinds, in the checkQuota order
#: (TimeBasedLimiter.java:85-110)
LIMITER_KINDS = (
    "req_num", "req_size", "write_num", "write_size", "read_num",
    "read_size",
)


class _RateLimiterState:
    """RateLimiter.java state machine, line for line (both refill
    policies). Used by the composed replay only — the single-scope
    timeline form is `_walk_fixed`/`_walk_average` above."""

    __slots__ = ("limit", "avail", "tunit", "policy", "next_refill")

    def __init__(self, limit=_LONG_MAX, tunit_ms=1000, policy="fixed"):
        self.limit = limit
        self.avail = limit
        self.tunit = tunit_ms
        self.policy = policy
        self.next_refill = -1

    def is_bypass(self):
        return self.limit == _LONG_MAX

    def _refill(self, now):
        if self.policy == "fixed":
            if now < self.next_refill:
                return 0
            self.next_refill = now + self.tunit
            return self.limit
        if self.next_refill == -1:
            self.next_refill = now
            return self.limit
        elapsed = now - self.next_refill
        if elapsed >= self.tunit:
            delta = self.limit
        elif elapsed > 0:
            delta = int(elapsed / self.tunit * self.limit)
        else:
            delta = 0
        if delta > 0:
            self.next_refill = now
        return delta

    def can_execute(self, now, amount=1):
        """canExecute (:150): refills and caps avail as a side effect
        even when the verdict is false — mirrored exactly (a composed
        check that fails at a LATER limiter leaves earlier limiters
        refilled but unconsumed, as in the reference)."""
        if self.is_bypass():
            return True
        refill = self._refill(now)
        if refill == 0 and self.avail < amount:
            return False
        self.avail = max(0, min(self.avail + refill, self.limit))
        return self.avail >= amount

    def consume(self, amount):
        if self.is_bypass():
            return
        if amount >= 0:
            self.avail = max(0, self.avail - amount)
        else:
            self.avail = min(self.avail - amount, self.limit)

    def update(self, other: "_RateLimiterState"):
        """RateLimiter.update (:111) — the setQuota-propagation rule
        (QuotaCache refresh): adopt the new tunit; a GROWN limit
        credits the difference to avail (capped at the new limit, with
        the overflow guard), so consumed quota is PRESERVED across a
        settings change (TestQuotaState.java:85-110 pins 3→11 ⇒ 8 more
        after 3 consumed); a shrunk limit leaves avail to be capped at
        the next refill."""
        self.tunit = other.tunit
        if self.limit < other.limit:
            diff = other.limit - self.limit
            if self.avail <= _LONG_MAX - diff:
                self.avail = min(self.avail + diff, other.limit)
            else:
                self.avail = other.limit
        self.limit = other.limit
        self.policy = other.policy

    def wait_interval(self, now, amount=1):
        if amount <= self.avail:
            return 0
        if self.next_refill == -1:
            return 0
        if self.policy == "fixed":
            return self.next_refill - now
        return int((amount - self.avail) * self.tunit / self.limit)


class _TimeBasedLimiter:
    """TimeBasedLimiter.java: up to six sub-limiters, checked in the
    :85-110 order; grabQuota consumes reqs/req_size always, the
    write/read pairs only when that side is non-zero."""

    def __init__(self, configs, policy):
        self.subs = {
            k: _RateLimiterState(limit, tunit, policy)
            for k, (limit, tunit) in configs.items()
        }
        for k in LIMITER_KINDS:
            self.subs.setdefault(k, _RateLimiterState())

    def is_bypass(self):
        return all(s.is_bypass() for s in self.subs.values())

    def check_quota(self, now, write_size, read_size):
        """Returns (ok, failed_kind, wait_ms)."""
        s = self.subs
        if not s["req_num"].can_execute(now):
            return False, "req_num", s["req_num"].wait_interval(now)
        tot = write_size + read_size
        if not s["req_size"].can_execute(now, tot):
            return False, "req_size", s["req_size"].wait_interval(now, tot)
        if write_size > 0:
            if not s["write_num"].can_execute(now):
                return False, "write_num", s["write_num"].wait_interval(now)
            if not s["write_size"].can_execute(now, write_size):
                return (False, "write_size",
                        s["write_size"].wait_interval(now, write_size))
        if read_size > 0:
            if not s["read_num"].can_execute(now):
                return False, "read_num", s["read_num"].wait_interval(now)
            if not s["read_size"].can_execute(now, read_size):
                return (False, "read_size",
                        s["read_size"].wait_interval(now, read_size))
        return True, None, 0

    def grab_quota(self, write_size, read_size):
        s = self.subs
        s["req_num"].consume(1)
        s["req_size"].consume(write_size + read_size)
        if write_size > 0:
            s["write_num"].consume(1)
            s["write_size"].consume(write_size)
        if read_size > 0:
            s["read_num"].consume(1)
            s["read_size"].consume(read_size)

    def consume_write(self, size):
        """TimeBasedLimiter.consumeWrite (:131): the close()-time
        actual-vs-estimate adjustment — negative sizes REFUND (consume
        of a negative re-credits avail, capped at limit)."""
        self.subs["req_size"].consume(size)
        self.subs["write_size"].consume(size)

    def consume_read(self, size):
        """TimeBasedLimiter.consumeRead (:137)."""
        self.subs["req_size"].consume(size)
        self.subs["read_size"].consume(size)

    def update_from(self, configs: dict | None, policy: str):
        """QuotaLimiterFactory.update → TimeBasedLimiter.update (:99):
        EVERY sub-limiter updates from the new settings' limiter —
        kinds absent from the new settings update from a bypass
        limiter (the fromThrottle default), so a removed component
        opens up (TestQuotaState testQuotaStateUpdateTableThrottle's
        removed-table-B case); ``configs=None`` = the whole quota
        removed (all-bypass)."""
        configs = configs or {}
        for k in LIMITER_KINDS:
            if k in configs:
                limit, tunit = configs[k]
                self.subs[k].update(
                    _RateLimiterState(int(limit), int(tunit), policy)
                )
            else:
                self.subs[k].update(_RateLimiterState())


def check_quota_replay(
    requests: DataFrame,
    limits: list,
    *,
    policy: str = "fixed",
    avg_write_size: int = 100,
    avg_read_size: int = 100,
    avg_scan_size: int = 1000,
    rs_col: str | None = None,
    track_actual_sizes: bool = False,
    settings_changes: list | None = None,
) -> DataFrame:
    """DefaultOperationQuota.checkQuota (:59) replayed over an ops log:
    per request, the USER then TABLE then NAMESPACE limiters are all
    checked (the reference's documented order) and, only if every one
    admits, all grabbed — a request throttled at one scope consumes
    NOTHING anywhere (though earlier limiters keep their refills, as in
    the reference's mutate-on-check canExecute).

    ``requests``: (req_id, ts_ms, user, table_name, namespace,
    num_writes, num_reads, num_scans). ``limits``: list of
    (scope, key, kind, limit, tunit_ms) with scope in
    'user'|'table'|'namespace', kind in LIMITER_KINDS. Sizes are the
    reference's estimates — 100 bytes per mutation/get, 1000 per scan
    (DefaultOperationQuota.java:64-66 estimateConsume defaults).

    Limiter state is shared ACROSS keys (one user's limiter spans all
    their tables; a table limiter spans all its users), so the replay
    is one sequential pass per region server (``rs_col``; the
    reference enforces per-RS). Ops-log scale, same Arrow posture as
    replay_rate_limiter. Returns the ids plus allowed / scope / reason
    / wait_ms.

    ``track_actual_sizes``: the close()-time adjustment
    (DefaultOperationQuota.java:88 close — ``consumeWrite/consumeRead``
    of actual-minus-estimated on EVERY limiter in the chain; an op that
    moved less than estimated REFUNDS, one that moved more overdraws,
    clamped at [0, limit]). Requests then carry ``actual_write_bytes``
    / ``actual_read_bytes`` for their true post-op sizes (applied only
    to admitted requests — a throttled RPC never ran).

    ``settings_changes``: mid-replay setQuota propagation (the
    QuotaCache refresh path, QuotaLimiterFactory.update →
    TimeBasedLimiter.update :99 → RateLimiter.update :111): a list of
    ``(ts_ms, scope, key, configs)`` where ``configs`` is the COMPLETE
    new ``{kind: (limit, tunit_ms)}`` for that limiter (None = quota
    removed). A change applies to every request at ``ts_ms`` or later;
    consumed quota is preserved across the change — a grown limit
    credits only the difference, a removed component opens to bypass
    (decision-tabled against TestQuotaState.java:85-177)."""
    if policy not in ("fixed", "average"):
        raise ValueError(f"unknown rate-limiter policy: {policy}")
    cfg: dict = {}
    for scope, key, kind, limit, tunit in limits:
        if scope not in ("user", "table", "namespace"):
            raise ValueError(f"unknown quota scope: {scope}")
        if kind not in LIMITER_KINDS:
            raise ValueError(f"unknown limiter kind: {kind}")
        cfg.setdefault((scope, key), {})[kind] = (int(limit), int(tunit))
    pol = policy
    aw, ar, asc = int(avg_write_size), int(avg_read_size), int(avg_scan_size)

    base = requests.select(
        F.col("req_id").cast("long"),
        (F.col(rs_col) if rs_col else F.lit("rs0")).cast("string").alias(
            "rs"
        ),
        F.col("ts_ms").cast("long"),
        F.col("user").cast("string"),
        F.col("table_name").cast("string"),
        F.col("namespace").cast("string"),
        F.col("num_writes").cast("int"),
        F.col("num_reads").cast("int"),
        F.col("num_scans").cast("int"),
        *(
            (
                F.col("actual_write_bytes").cast("long"),
                F.col("actual_read_bytes").cast("long"),
            )
            if track_actual_sizes
            else ()
        ),
    )
    schema = (
        "req_id long, rs string, ts_ms long, user string, "
        "table_name string, namespace string, allowed boolean, "
        "scope string, reason string, wait_ms long"
    )
    adjust = bool(track_actual_sizes)

    changes: dict = {}
    if settings_changes:
        for ts, scope, key, configs in settings_changes:
            if scope not in ("user", "table", "namespace"):
                raise ValueError(f"unknown quota scope: {scope}")
            if configs is not None:
                for kind in configs:
                    if kind not in LIMITER_KINDS:
                        raise ValueError(f"unknown limiter kind: {kind}")
            changes.setdefault((scope, key), []).append(
                (int(ts), configs)
            )
        for lst in changes.values():
            lst.sort(key=lambda c: c[0])

    def replay(pdf):
        import pandas as pd

        pdf = pdf.sort_values(["ts_ms", "req_id"]).reset_index(drop=True)
        limiters: dict = {}
        applied: dict = {}

        def limiter_for(scope, key, now):
            if (scope, key) not in limiters:
                limiters[(scope, key)] = _TimeBasedLimiter(
                    cfg.get((scope, key), {}), pol
                )
                applied[(scope, key)] = 0
            lim = limiters[(scope, key)]
            # setQuota propagation (QuotaCache refresh): apply every
            # settings change with ts <= now, in order, before the
            # limiter is consulted. update() is now-independent, so
            # lazy catch-up at touch time equals eager application.
            lst = changes.get((scope, key))
            if lst:
                i = applied[(scope, key)]
                while i < len(lst) and lst[i][0] <= now:
                    lim.update_from(lst[i][1], pol)
                    i += 1
                applied[(scope, key)] = i
            return lim

        out = []
        for r in pdf.itertuples(index=False):
            wc = aw * r.num_writes if r.num_writes > 0 else 0
            rc = (ar * r.num_reads if r.num_reads > 0 else 0) + (
                asc * r.num_scans if r.num_scans > 0 else 0
            )
            chain = [
                ("user", r.user), ("table", r.table_name),
                ("namespace", r.namespace),
            ]
            verdict = (True, None, None, 0)
            lims = [limiter_for(s, k, r.ts_ms) for s, k in chain]
            for (scope, _key), lim in zip(chain, lims):
                if lim.is_bypass():
                    continue
                ok, kind, wait = lim.check_quota(r.ts_ms, wc, rc)
                if not ok:
                    verdict = (False, scope, kind, wait)
                    break
            if verdict[0]:
                for lim in lims:
                    lim.grab_quota(wc, rc)
                if adjust:
                    wdiff = r.actual_write_bytes - wc
                    rdiff = r.actual_read_bytes - rc
                    for lim in lims:
                        if wdiff != 0:
                            lim.consume_write(wdiff)
                        if rdiff != 0:
                            lim.consume_read(rdiff)
            out.append(
                (r.req_id, r.rs, r.ts_ms, r.user, r.table_name,
                 r.namespace, *verdict)
            )
        return pd.DataFrame(
            out,
            columns=["req_id", "rs", "ts_ms", "user", "table_name",
                     "namespace", "allowed", "scope", "reason", "wait_ms"],
        )

    return base.groupBy("rs").applyInPandas(replay, schema)
